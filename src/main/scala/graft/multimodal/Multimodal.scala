package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  /** REAL (non-stub) header metadata for an image blob: container format
    * from magic bytes and pixel dimensions parsed straight out of the
    * header — PNG IHDR, JPEG SOF scan, GIF logical screen, BMP info
    * header. No codec library involved, so this one runs for real at any
    * scale; pixel decoding stays behind [[decodeStub]]'s seam.
    */
  def imageMeta(blob: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_meta", exprs => ImageMetaExpr(exprs.head), "built-in")
    call_function("image_meta", blob)
  }
}

/** imageMeta(blob) → struct<format, width, height>; unknown/truncated
  * payloads yield ('unknown', null, null) rather than failing — corrupt
  * blobs are data, not errors, in a 100 TB crawl.
  */
case class ImageMetaExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  private def result(fmt: String, w: Integer, h: Integer): InternalRow =
    InternalRow(UTF8String.fromString(fmt),
      if (w == null) null else w.intValue(),
      if (h == null) null else h.intValue())

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    try {
      if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        result("png", be32(b, 16), be32(b, 20))       // IHDR width/height
      else if (b.length >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte)
        jpegDims(b)
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
        result("gif", le16(b, 6), le16(b, 8))          // logical screen
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
        result("bmp", le32(b, 18), math.abs(le32(b, 22))) // BITMAPINFOHEADER
      else result("unknown", null, null)
    } catch { case _: ArrayIndexOutOfBoundsException => result("unknown", null, null) }
  }

  /** Walk JPEG segments to the first SOFn frame header (C0-CF except
    * C4/C8/CC), where height/width live at +5/+7.
    */
  private def jpegDims(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 9 < b.length) {
      if (b(i) != 0xFF.toByte) return result("jpeg", null, null)
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
        return result("jpeg", be16(b, i + 7), be16(b, i + 5))
      i += 2 + be16(b, i + 2)
    }
    result("jpeg", null, null)
  }

  override protected def withNewChildInternal(c: Expression): ImageMetaExpr = copy(child = c)
  override def prettyName: String = "image_meta"
}
