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
  * output shape. Pixel/sample decode is REAL for every image format plus
  * the whole WAV family: [[Codecs]] hand-decodes PNG (JDK Inflater +
  * scanline un-filtering), uncompressed BMP, 16-bit PCM WAV, compressed
  * IMA/DVI and Microsoft ADPCM WAV, and G.711 µ-law/A-law WAV from raw
  * bytes, and [[imageIoFeatures]] decodes JPEG/GIF through the JDK's own
  * bundled `javax.imageio` readers — no external library anywhere. VIDEO
  * decodes real frames for MJPEG-in-AVI ([[Codecs.parseAvi]] frame
  * ranges + the JPEG decoder) and uncompressed-DIB AVI (a raw frame is a
  * headerless BMP — [[Codecs.dibPrefix]]): [[sampleFrames]] emits real
  * per-frame pixels, [[aviPosterImage]] real whole-blob features. Only
  * INTER-FRAME video codecs (H.264-class) and perceptual audio codecs
  * (MP3/AAC-class) fall back to [[decodeStub]], the remaining seam where
  * an ffmpeg-class binding would plug in.
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

  /** STUB decoder for the formats that need external codec libraries
    * (inter-frame video, perceptual audio codecs): a deterministic
    * 16-bin byte histogram, L1-normalized — shape-compatible with the
    * real feature extractors below, trivially reproducible in tests.
    */
  private[graft] def decodeStub(blob: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < blob.length) { bins((blob(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(1, blob.length).toFloat
    bins.map(_ / n)
  }

  /** REAL image features: 16-bin luminance histogram over decoded pixels,
    * L1-normalized (same 16-dim contract as the stub).
    */
  private[graft] def imageFeatures(img: Codecs.Image): Array[Float] = {
    val bins = new Array[Float](16)
    val px = img.pixels
    val c = img.channels
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val lum =
        if (c <= 2) px(i * c) & 0xFF
        else ((px(i * c) & 0xFF) * 299 + (px(i * c + 1) & 0xFF) * 587 +
          (px(i * c + 2) & 0xFF) * 114) / 1000
      bins(lum >> 4) += 1f
      i += 1
    }
    bins.map(_ / math.max(1, n).toFloat)
  }

  /** REAL audio features: 16-bin amplitude-magnitude histogram over
    * decoded PCM samples, L1-normalized.
    */
  private[graft] def audioFeatures(p: Codecs.Pcm): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < p.samples.length) {
      val a = math.min(32767, math.abs(p.samples(i).toInt))
      bins(a >> 11) += 1f // 32768 / 16 bins
      i += 1
    }
    bins.map(_ / math.max(1, p.samples.length).toFloat)
  }

  /** JPEG/GIF pixel decode via the JDK's own `javax.imageio` (java.desktop
    * ships Huffman/DCT and LZW decoders — still no EXTERNAL library).
    * Second tier after [[Codecs]]' pure-byte decoders; only attempted on
    * JPEG/GIF magics so text blobs never reach AWT. Returns the same
    * 16-bin luminance histogram as [[imageFeatures]].
    */
  private[graft] def imageIoImage(blob: Array[Byte]): Option[Codecs.Image] = {
    val isJpeg = blob.length > 3 && (blob(0) & 0xFF) == 0xFF && (blob(1) & 0xFF) == 0xD8
    val isGif = blob.length > 6 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F'
    if (!isJpeg && !isGif) return None
    try {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file spills on executors
      // Reject oversized images from the HEADER, before any pixel allocation:
      // a corrupt/adversarial header declaring huge dimensions must not make
      // ImageIO.read allocate width*height pixels (Codecs.decodePng/decodeBmp
      // apply the same bound pre-allocation).
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(blob))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis, true, true)
          val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
          if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > 64L * 1024 * 1024) null
          else reader.read(0)
        } finally { reader.dispose(); iis.close() }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Byte](w * h * 3)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val d = (y * w + x) * 3
            px(d) = ((rgb >> 16) & 0xFF).toByte
            px(d + 1) = ((rgb >> 8) & 0xFF).toByte
            px(d + 2) = (rgb & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        Some(Codecs.Image(w, h, 3, px))
      }
    } catch {
      // Corrupt blobs are data, but OOM/VM errors must propagate — an
      // executor that swallowed an OutOfMemoryError is in an undefined state.
      case scala.util.control.NonFatal(_) => None
    }
  }

  private[graft] def imageIoFeatures(blob: Array[Byte]): Option[Array[Float]] =
    imageIoImage(blob).map(imageFeatures)

  /** Full image pixel decode across every JVM-decodable format:
    * [[Codecs]] PNG/BMP (pure bytes) then JPEG/GIF via ImageIO.
    */
  private[graft] def decodeImage(blob: Array[Byte]): Option[Codecs.Image] =
    Codecs.decodePng(blob).orElse(Codecs.decodeBmp(blob))
      .orElse(imageIoImage(blob))

  /** First decodable video frame of an AVI blob (the poster frame) as
    * real pixels: the AVI walk yields the frame's byte range, and the
    * payload is either a complete JPEG (MJPEG) the existing decoder
    * reads, or a raw DIB raster ([[Codecs.dibPrefix]] synthesizes the
    * BMP header the payload lacks) — no new codec either way. MJPEG
    * variants that strip the Huffman tables from frames (legal in the
    * AVI spec, rare in practice) fail the JPEG decode and fall through
    * to None. The frame-size cap mirrors imageIoImage's header bound.
    */
  private[graft] def aviPosterImage(blob: Array[Byte]): Option[Codecs.Image] =
    Codecs.parseAvi(blob).flatMap { avi =>
      avi.frames.headOption.flatMap { case (off, sz) =>
        if (sz <= 0 || sz > 64L * 1024 * 1024) None
        else {
          val prefix = Codecs.dibPrefix(avi, sz)
          val fb = new Array[Byte](prefix.length + sz.toInt)
          System.arraycopy(prefix, 0, fb, 0, prefix.length)
          System.arraycopy(blob, off.toInt, fb, prefix.length, sz.toInt)
          decodeImage(fb)
        }
      }
    }

  /** Feature dispatch: real pixels/samples wherever the JVM can decode —
    * [[Codecs]] (PNG/BMP; PCM, IMA/MS-ADPCM and G.711 WAV, pure bytes),
    * then [[imageIoFeatures]] (JPEG/GIF via the JDK's bundled readers),
    * then [[aviPosterImage]] (MJPEG or raw-DIB AVI video: real
    * first-frame pixels — per-frame features come from [[sampleFrames]]).
    * The stub histogram now covers ONLY inter-frame video codecs
    * (H.264-class) and perceptual audio codecs (MP3/AAC-class), which
    * genuinely need external codec libraries (ffmpeg-class) this
    * environment doesn't ship.
    */
  private[graft] def decodeFeatures(blob: Array[Byte]): Array[Float] =
    Codecs.decodePng(blob).orElse(Codecs.decodeBmp(blob)).map(imageFeatures)
      .orElse(decodeAudio(blob).map(audioFeatures))
      .orElse(imageIoFeatures(blob))
      .orElse(aviPosterImage(blob).map(imageFeatures))
      .getOrElse(decodeStub(blob))

  /** Full audio sample decode across the WAV family [[Codecs]] reads for
    * real: 16-bit PCM, IMA/DVI ADPCM, G.711 µ-law/A-law, and Microsoft
    * ADPCM — each decoder refuses anything but its own format tag, so
    * the chain is a clean dispatch on the fmt chunk.
    */
  private[graft] def decodeAudio(blob: Array[Byte]): Option[Codecs.Pcm] =
    Codecs.decodeWav(blob)
      .orElse(Codecs.decodeImaAdpcmWav(blob))
      .orElse(Codecs.decodeG711Wav(blob))
      .orElse(Codecs.decodeMsAdpcmWav(blob))

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
            decodeFeatures(blob).toSeq :+ blob.length.toLong)
        }
      }
    }(enc)
  }

  /** Batched image resize — the canonical-size/thumbnail pipeline step,
    * same mapInPandas batch shape as [[extractFeatures]]: decode real
    * pixels wherever the JVM can (PNG/BMP pure-byte, JPEG/GIF via
    * ImageIO), nearest-neighbor resample to (width, height), re-encode as
    * 24-bit BMP (the pure-JVM round-trippable sink — [[Codecs.decodeBmp]]
    * reads the output straight back). Undecodable blobs pass through
    * UNCHANGED with `resized = false` (corrupt data is data); meta
    * width/height update only on success.
    */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      batchSize: Int = 64): DataFrame = {
    require(width > 0 && height > 0, s"target must be positive: ${width}x$height")
    val metaIdx = media.schema.fieldIndex("meta")
    val blobIdx = media.schema.fieldIndex("blob")
    val outSchema = StructType(media.schema.fields :+
      StructField("resized", BooleanType, nullable = false))
    val enc = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val blob = r.getAs[Array[Byte]](blobIdx)
          decodeImage(blob) match {
            case Some(img) =>
              val bmp = Codecs.encodeBmp(Codecs.resizeNearest(img, width, height))
              val meta = r.getAs[Row](metaIdx)
              val newMeta =
                if (meta == null) Row("bmp", width, height, null)
                else Row("bmp", width, height, meta.get(3))
              Row.fromSeq(r.toSeq.updated(blobIdx, bmp).updated(metaIdx, newMeta)
                :+ true)
            case None => Row.fromSeq(r.toSeq :+ false)
          }
        }
      }
    }(enc)
  }

  /** Frame sampling for video blobs, KEYFRAME-AWARE where the container
    * allows: MP4 blobs with a parseable video sample table land each of the
    * `frames` samples on a true sync-sample (keyframe) byte range —
    * `frames` evenly spaced picks over the stss list, each substring an
    * exact [offset, offset+size) payload ([[IsoBmff.syncSampleRanges]],
    * pure byte arithmetic, no codec) — and AVI blobs land on movi video
    * chunks ([[Codecs.parseAvi]]; every MJPEG frame is a complete keyframe
    * JPEG, and a raw-DIB frame gets its synthesized BMP header prepended,
    * so the feature pass decodes REAL pixels either way). Everything else
    * falls back to equal chunks (the
    * blind split a payload without a sample index forces). Emits one
    * feature row per sampled frame — the explode-shaped operator a video
    * pipeline needs.
    */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.Registration.once(spark, "video_samples") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "video_samples", exprs => VideoSamplesExpr(exprs.head), "built-in")
    }
    val pick = s"element_at(__sync, cast(frame_idx * __n / $frames as int) + 1)"
    val chunked = media
      .withColumn("__sync", call_function("video_samples", col("blob")))
      .withColumn("__n", coalesce(size(col("__sync")), lit(0)))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_blob",
        when(col("__n") > 0,
          // prefix makes the slice self-contained (empty except for raw
          // DIB frames, which need their synthesized BMP header)
          expr(s"concat($pick.prefix, " +
            s"substring(blob, cast($pick.offset as int) + 1, cast($pick.size as int)))"))
          .otherwise(
            expr(s"substring(blob, cast(frame_idx * length(blob) / $frames as int) + 1, " +
              s"cast(length(blob) / $frames as int))")))
    extractFeatures(
      chunked.drop("blob", "__sync", "__n").withColumnRenamed("frame_blob", "blob"))
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
    * scale; pixel decoding is also real for PNG/BMP ([[Codecs]]), with
    * only codec-library formats behind [[decodeStub]]'s seam.
    */
  def imageMeta(blob: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.Registration.once(spark, "image_meta") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "image_meta", exprs => ImageMetaExpr(exprs.head), "built-in")
    }
    call_function("image_meta", blob)
  }

  /** REAL (non-stub) container metadata across all three modalities:
    * [[imageMeta]]'s image formats plus WAV/RIFF chunk walking (sample
    * rate, channels, duration from the data-chunk size), MP4/ISO-BMFF atom
    * walking (mvhd timescale/duration, first video trak's tkhd
    * dimensions), and the Matroska/WebM EBML header (DocType). Container
    * structure needs no codec library, so all of this runs for real at any
    * scale; pixel/sample decode is real too for PNG/BMP/PCM-WAV
    * ([[Codecs]]) — only codec-library formats (JPEG, compressed A/V)
    * stay behind [[decodeStub]]'s seam.
    */
  def mediaMeta(blob: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.Registration.once(spark, "media_meta") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "media_meta", exprs => MediaMetaExpr(exprs.head), "built-in")
    }
    call_function("media_meta", blob)
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

/** mediaMeta(blob) → struct<format, width, height, duration_ms,
  * sample_rate, channels>; container headers only (no codec work), and
  * unknown/truncated payloads yield ('unknown', null...) rather than
  * failing — corrupt blobs are data, not errors, in a 100 TB crawl.
  *
  * Formats: the [[ImageMetaExpr]] image set; `wav` (RIFF chunk walk:
  * fmt → sample_rate/channels, data size ÷ byte rate → duration);
  * `mp4` (ISO-BMFF atom walk: moov→mvhd duration/timescale, first
  * moov→trak→tkhd with nonzero size → width/height as 16.16 fixed);
  * `matroska`/`webm` (EBML header vint walk → DocType — Segment-level
  * duration needs the full element tree and stays out of scope).
  */
case class MediaMetaExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  private def be32(b: Array[Byte], i: Int): Long = IsoBmff.be32(b, i)
  private def be64(b: Array[Byte], i: Int): Long = IsoBmff.be64(b, i)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def fourcc(b: Array[Byte], i: Int): String = IsoBmff.fourcc(b, i)

  private def row(fmt: String, w: Integer = null, h: Integer = null,
      durMs: java.lang.Long = null, rate: Integer = null, ch: Integer = null): InternalRow =
    InternalRow(UTF8String.fromString(fmt),
      if (w == null) null else w.intValue(),
      if (h == null) null else h.intValue(),
      if (durMs == null) null else durMs.longValue(),
      if (rate == null) null else rate.intValue(),
      if (ch == null) null else ch.intValue())

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    try {
      if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE") wav(b)
      else if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") avi(b)
      else if (b.length >= 12 && fourcc(b, 4) == "ftyp") mp4(b)
      else if (b.length >= 4 && (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
          (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) matroska(b)
      else {
        // image formats: reuse the image header parse, widen the struct
        val img = ImageMetaExpr(child).nullSafeEval(v).asInstanceOf[InternalRow]
        InternalRow(img.getUTF8String(0),
          if (img.isNullAt(1)) null else img.getInt(1),
          if (img.isNullAt(2)) null else img.getInt(2),
          null, null, null)
      }
    } catch {
      // malformed vints, negative sizes, truncated headers — all data
      case _: RuntimeException => row("unknown")
    }
  }

  /** AVI header metadata through the one full-container walk
    * ([[Codecs.parseAvi]]): dimensions from avih (or the video strf),
    * duration from usPerFrame × totalFrames. A RIFF-AVI magic with no
    * parseable video stream still identifies as "avi", fields null.
    */
  private def avi(b: Array[Byte]): InternalRow =
    Codecs.parseAvi(b) match {
      case Some(a) =>
        val dur: java.lang.Long =
          if (a.usPerFrame > 0 && a.totalFrames > 0)
            a.usPerFrame * a.totalFrames / 1000L
          else null
        row("avi", w = a.width, h = a.height, durMs = dur)
      case None => row("avi")
    }

  /** RIFF chunk walk: chunks are [id:4][size:le32][payload], word-aligned. */
  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    var rate: Integer = null
    var ch: Integer = null
    var byteRate = 0L
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        ch = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
      } else if (id == "data") {
        dataSize = size
      }
      // chunks pad to even offsets; advance in Long — a declared size that
      // overflows Int or runs past the buffer means a corrupt file, and
      // corrupt blobs are data: stop walking, keep whatever parsed so far
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length) i = b.length else i = next.toInt
    }
    val dur: java.lang.Long =
      if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate else null
    row("wav", durMs = dur, rate = rate, ch = ch)
  }

  private def findAtom(b: Array[Byte], start: Int, end: Int, name: String): Int =
    IsoBmff.findAtom(b, start, end, name)

  private def atomEnd(b: Array[Byte], at: Int, limit: Int): Int =
    IsoBmff.atomEnd(b, at, limit)

  private def mp4(b: Array[Byte]): InternalRow = {
    val moov = findAtom(b, 0, b.length, "moov")
    if (moov < 0) return row("mp4")
    val moovEnd = atomEnd(b, moov, b.length)
    var dur: java.lang.Long = null
    val mvhd = findAtom(b, moov + 8, moovEnd, "mvhd")
    if (mvhd >= 0) {
      val version = b(mvhd + 8) & 0xFF
      val (timescale, duration) =
        if (version == 1) (be32(b, mvhd + 28), be64(b, mvhd + 32))
        else (be32(b, mvhd + 20), be32(b, mvhd + 24))
      if (timescale > 0) dur = duration * 1000L / timescale
    }
    // first trak whose tkhd carries a nonzero 16.16 width/height = video
    var w: Integer = null
    var h: Integer = null
    var t = moov + 8
    while (w == null && t >= 0 && t + 8 <= moovEnd) {
      val trak = findAtom(b, t, moovEnd, "trak")
      if (trak < 0) t = -1
      else {
        val trakEnd = atomEnd(b, trak, moovEnd)
        val tkhd = findAtom(b, trak + 8, trakEnd, "tkhd")
        if (tkhd >= 0) {
          val version = b(tkhd + 8) & 0xFF
          val base = if (version == 1) tkhd + 8 + 4 + 32 else tkhd + 8 + 4 + 20
          // layer..matrix span 52 bytes before the fixed-point dims
          val wOff = base + 52
          if (wOff + 8 <= trakEnd) {
            val wf = be32(b, wOff) >> 16
            val hf = be32(b, wOff + 4) >> 16
            if (wf > 0 && hf > 0) { w = wf.toInt; h = hf.toInt }
          }
        }
        t = trakEnd
      }
    }
    row("mp4", w = w, h = h, durMs = dur)
  }

  /** EBML vint at `i`: (value, width). For IDs the marker bit is kept
    * (class ids compare with it); for sizes it is stripped.
    */
  private def vint(b: Array[Byte], i: Int, keepMarker: Boolean): (Long, Int) = {
    val first = b(i) & 0xFF
    val width = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for valid vints
    require(width >= 1 && width <= 8, s"bad vint at $i")
    var value = if (keepMarker) first.toLong else (first & (0xFF >> width)).toLong
    var k = 1
    while (k < width) { value = (value << 8) | (b(i + k) & 0xFF); k += 1 }
    (value, width)
  }

  private def matroska(b: Array[Byte]): InternalRow = {
    // bytes 0-3 are the EBML header ID; then its size vint, then children
    val (headerSize, szW) = vint(b, 4, keepMarker = false)
    var i = 4 + szW
    val end = math.min(b.length.toLong, i + headerSize).toInt
    var doctype = "matroska"
    while (i < end) {
      val (id, idW) = vint(b, i, keepMarker = true)
      val (size, sW) = vint(b, i + idW, keepMarker = false)
      // advance in Long; a declared size past the element bound is corrupt —
      // stop walking rather than stall or read out of bounds
      val payload = i.toLong + idW + sW
      val next = payload + size
      if (next <= i || next > end) { i = end }
      else {
        if (id == 0x4282L) // DocType
          doctype = new String(b, payload.toInt, size.toInt, "US-ASCII")
        i = next.toInt
      }
    }
    row(doctype) // "matroska" or "webm"
  }

  override protected def withNewChildInternal(c: Expression): MediaMetaExpr = copy(child = c)
  override def prettyName: String = "media_meta"
}

/** Shared ISO-BMFF (MP4) byte-level helpers plus the sample-table parse
  * that makes video frame sampling KEYFRAME-AWARE without any codec:
  * `stsc` maps samples to chunks, `stco`/`co64` place chunks in the file,
  * `stsz` sizes each sample, and `stss` lists the sync samples
  * (ISO/IEC 14496-12 §8.6.2: no `stss` atom ⇒ every sample is sync).
  * Pure byte arithmetic — the payload boundaries are exact even though
  * decoding the frames inside them still needs codec libraries.
  */
private[graft] object IsoBmff {

  def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) | ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** ISO-BMFF atom walk over [start, end): returns the offset of the first
    * atom with `name`, or -1. Atom = [size:be32][type:4cc]; size 1 means a
    * 64-bit size follows, size 0 means to-end-of-enclosure.
    */
  def findAtom(b: Array[Byte], start: Int, end: Int, name: String): Int = {
    var i = start
    while (i + 8 <= end) {
      val size0 = be32(b, i)
      val size = if (size0 == 1L && i + 16 <= end) be64(b, i + 8)
        else if (size0 == 0L) (end - i).toLong
        else size0
      if (size < 8) return -1
      if (fourcc(b, i + 4) == name) return i
      // advance in Long: a 64-bit size whose low half is 0 must not stall
      val next = i.toLong + size
      if (next <= i || next > end) return -1
      i = next.toInt
    }
    -1
  }

  def atomEnd(b: Array[Byte], at: Int, limit: Int): Int = {
    val size0 = be32(b, at)
    val size = if (size0 == 0L) (limit - at).toLong else size0
    math.min(limit.toLong, at + size).toInt
  }

  /** Walk a `/`-separated atom path from `start` (first child position),
    * returning (offset, end) of the final atom, or null.
    */
  private def descend(b: Array[Byte], start: Int, end: Int,
      path: String*): (Int, Int) = {
    var at = start
    var lim = end
    for (name <- path) {
      val found = findAtom(b, at, lim, name)
      if (found < 0) return null
      lim = atomEnd(b, found, lim)
      at = found + 8
    }
    (at - 8, lim)
  }

  // adversarial-header bound: a declared sample count past this (or past
  // what the atom's own bytes can hold) is corrupt, not big
  private val MaxSamples = 1 << 20

  /** Byte ranges (offset, size) of the first VIDEO trak's sync samples
    * (keyframes), in sample order, capped at `maxRanges`. Empty when the
    * blob is not MP4, has no video trak, the tables are corrupt/truncated,
    * or a range falls outside the blob (media data not in this file).
    */
  def syncSampleRanges(b: Array[Byte], maxRanges: Int = 4096): Array[(Long, Long)] = {
    try {
      if (b.length < 12 || fourcc(b, 4) != "ftyp") return Array.empty
      val moov = findAtom(b, 0, b.length, "moov")
      if (moov < 0) return Array.empty
      val moovEnd = atomEnd(b, moov, b.length)
      var t = moov + 8
      while (t >= 0 && t + 8 <= moovEnd) {
        val trak = findAtom(b, t, moovEnd, "trak")
        if (trak < 0) return Array.empty
        val trakEnd = atomEnd(b, trak, moovEnd)
        val mdia = findAtom(b, trak + 8, trakEnd, "mdia")
        if (mdia >= 0) {
          val mdiaEnd = atomEnd(b, mdia, trakEnd)
          val hdlr = findAtom(b, mdia + 8, mdiaEnd, "hdlr")
          // handler_type sits after the 8-byte header + version/flags(4) +
          // pre_defined(4)
          val isVideo = hdlr >= 0 && hdlr + 20 <= mdiaEnd &&
            fourcc(b, hdlr + 16) == "vide"
          if (isVideo) {
            val stbl = descend(b, mdia + 8, mdiaEnd, "minf", "stbl")
            if (stbl == null) return Array.empty
            return stblSyncRanges(b, stbl._1, stbl._2, maxRanges)
          }
        }
        t = trakEnd
      }
      Array.empty
    } catch { case scala.util.control.NonFatal(_) => Array.empty }
  }

  /** A full-box table atom's (payload offset after version/flags, entry
    * count), validated so `count * entryBytes` fits inside the atom — a
    * forged count cannot force a huge allocation or an out-of-bounds read.
    */
  private def tableAt(b: Array[Byte], stbl: Int, stblEnd: Int, name: String,
      entryBytes: Int, countAt: Int = 12): (Int, Int) = {
    val at = findAtom(b, stbl + 8, stblEnd, name)
    if (at < 0) return null
    val end = atomEnd(b, at, stblEnd)
    if (at + countAt + 4 > end) return null
    val count = be32(b, at + countAt)
    if (count < 0 || count > MaxSamples ||
      at + countAt + 4 + count * entryBytes.toLong > end) return null
    (at + countAt + 4, count.toInt)
  }

  private def stblSyncRanges(b: Array[Byte], stbl: Int, stblEnd: Int,
      maxRanges: Int): Array[(Long, Long)] = {
    // stsz: fixed sample_size at +12, count at +16, per-sample sizes after
    val stszAt = findAtom(b, stbl + 8, stblEnd, "stsz")
    if (stszAt < 0) return Array.empty
    val fixedSize = be32(b, stszAt + 12)
    val stsz =
      if (fixedSize == 0L) tableAt(b, stbl, stblEnd, "stsz", 4, countAt = 16)
      else { // constant-size samples: count still at +16, no entry table
        val end = atomEnd(b, stszAt, stblEnd)
        if (stszAt + 20 > end) null
        else {
          val n = be32(b, stszAt + 16)
          if (n < 0 || n > MaxSamples) null else (stszAt + 20, n.toInt)
        }
      }
    if (stsz == null) return Array.empty
    val (stszOff, nSamples) = stsz
    def sampleSize(i: Int): Long =
      if (fixedSize != 0L) fixedSize else be32(b, stszOff + 4 * i)

    // chunk offsets: stco (be32) or co64 (be64)
    val (chunkOff, nChunks, off64) = {
      val t32 = tableAt(b, stbl, stblEnd, "stco", 4)
      if (t32 != null) (t32._1, t32._2, false)
      else {
        val t64 = tableAt(b, stbl, stblEnd, "co64", 8)
        if (t64 == null) return Array.empty
        (t64._1, t64._2, true)
      }
    }
    def chunkOffset(c: Int): Long =
      if (off64) be64(b, chunkOff + 8 * c) else be32(b, chunkOff + 4 * c)

    // stsc runs: (first_chunk, samples_per_chunk, desc) — expand chunk by
    // chunk, assigning consecutive sample indices
    val stsc = tableAt(b, stbl, stblEnd, "stsc", 12)
    if (stsc == null) return Array.empty
    val (stscOff, nRuns) = stsc

    // stss: 1-based sync sample numbers; absent ⇒ all samples sync
    val stss = tableAt(b, stbl, stblEnd, "stss", 4)
    val sync: Int => Boolean =
      if (stss == null) _ => true
      else {
        val (off, n) = stss
        val set = (0 until n).map(i => be32(b, off + 4 * i)).toSet
        s => set.contains((s + 1).toLong)
      }

    val out = Array.newBuilder[(Long, Long)]
    var produced = 0
    var sample = 0
    var run = 0
    var chunk = 0 // 0-based
    while (chunk < nChunks && sample < nSamples && produced < maxRanges) {
      // advance the run while the NEXT run starts at or before this chunk
      while (run + 1 < nRuns && be32(b, stscOff + 12 * (run + 1)) <= chunk + 1) run += 1
      val perChunk = be32(b, stscOff + 12 * run + 4)
      if (perChunk <= 0 || perChunk > MaxSamples) return out.result()
      var within = 0L
      var s = 0
      while (s < perChunk && sample < nSamples && produced < maxRanges) {
        val sz = sampleSize(sample)
        if (sz < 0) return out.result()
        val off = chunkOffset(chunk) + within
        if (sync(sample) && off >= 0 && sz > 0 && off + sz <= b.length) {
          out += ((off, sz))
          produced += 1
        }
        within += sz
        sample += 1
        s += 1
      }
      chunk += 1
    }
    out.result()
  }
}

/** video_samples(blob) → array<struct<offset BIGINT, size BIGINT,
  * prefix BINARY>> of the first video stream's frame byte ranges for ANY
  * container the library parses: MP4 keyframes
  * ([[IsoBmff.syncSampleRanges]]) or AVI movi video chunks
  * ([[Codecs.parseAvi]] — all MJPEG frames are keyframes). `prefix` is
  * the bytes to PREPEND to the sliced range to make it a self-contained
  * decodable blob: empty for frames that already are (JPEG payloads,
  * MP4 samples), a synthesized 54-byte BMP header for uncompressed-DIB
  * AVI frames (a headerless raster needs the stream's dimensions to
  * decode — [[Codecs.dibPrefix]]). NULL when neither container yields
  * ranges — the dispatch signal [[Multimodal.sampleFrames]] uses to
  * choose frame-aware sampling over blind equal chunking.
  */
case class VideoSamplesExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("prefix", BinaryType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    var prefixFor: Long => Array[Byte] = _ => Array.emptyByteArray
    val ranges = IsoBmff.syncSampleRanges(b) match {
      case rs if rs.nonEmpty => rs
      case _ =>
        Codecs.parseAvi(b) match {
          case Some(avi) =>
            // per-frame: only a whole-raster-sized frame gets the header
            prefixFor = sz => Codecs.dibPrefix(avi, sz)
            avi.frames
          case None => Array.empty[(Long, Long)]
        }
    }
    if (ranges.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ranges.map { case (o, s) => InternalRow(o, s, prefixFor(s)) })
  }

  override protected def withNewChildInternal(c: Expression): VideoSamplesExpr =
    copy(child = c)
  override def prettyName: String = "video_samples"
}
