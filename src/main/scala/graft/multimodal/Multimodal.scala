package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs batched per partition.
  *
  * The *Spark plumbing* here is real and tested — schema, partition-batched
  * processing (the Scala analog of `mapInPandas` batches), deterministic
  * output shape. The actual codec work is STUBBED (this container ships no
  * image/audio libraries): [[decodeStub]] derives fake-but-deterministic
  * features from the raw bytes, and is the single seam where a real decoder
  * (JavaCV / TwelveMonkeys / ffmpeg bindings) would plug in.
  */
object Multimodal {

  /** Canonical media schema: id + modality + opaque payload + typed meta. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("blob", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** STUB decoder: a real implementation would decode `blob` with a codec
    * library. This one computes a deterministic 16-bin byte histogram,
    * L1-normalized — shape-compatible with a feature extractor, trivially
    * reproducible in tests.
    */
  private[multimodal] def decodeStub(blob: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < blob.length) { bins((blob(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(1, blob.length).toFloat
    bins.map(_ / n)
  }

  /** Batched per-partition feature extraction — the mapInPandas shape:
    * rows are processed in fixed-size batches so a real decoder could
    * vectorize / reuse codec contexts across a batch.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "blob") :+
        StructField("features", ArrayType(FloatType), nullable = false) :+
        StructField("n_bytes", LongType, nullable = false))
    val enc = Encoders.row(outSchema)
    val blobIdx = media.schema.fieldIndex("blob")
    val keepIdx = media.schema.fields.zipWithIndex
      .collect { case (f, i) if f.name != "blob" => i }
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call
        batch.iterator.map { r =>
          val blob = r.getAs[Array[Byte]](blobIdx)
          Row.fromSeq(keepIdx.map(r.get).toSeq :+
            decodeStub(blob).toSeq :+ blob.length.toLong)
        }
      }
    }(enc)
  }

  /** Frame sampling for video blobs: split the payload into `frames` equal
    * chunks (stub for keyframe extraction) and emit one feature row per
    * sampled frame — the explode-shaped operator a video pipeline needs.
    */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val chunked = media.withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_blob",
        expr(s"substring(blob, cast(frame_idx * length(blob) / $frames as int) + 1, " +
          s"cast(length(blob) / $frames as int))"))
    extractFeatures(
      chunked.drop("blob").withColumnRenamed("frame_blob", "blob"))
  }

  /** Wrap a text corpus as fake media rows (test/bench helper): bytes of the
    * text play the blob role. Lets the multimodal path run on the driver
    * testdata, which ships no real binaries.
    */
  def fakeMediaFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("modality"),
      encode(col(textCol), "UTF-8").as("blob"),
      struct(lit("fake").as("format"),
        length(col(textCol)).cast(IntegerType).as("width"),
        lit(1).as("height"),
        lit(0L).as("duration_ms")).as("meta"))
}
