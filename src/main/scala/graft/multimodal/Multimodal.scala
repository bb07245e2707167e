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
  * PCM audio: [[Codecs]] hand-decodes PNG (JDK Inflater + scanline
  * un-filtering), uncompressed BMP, and 16-bit WAV from raw bytes, and
  * [[imageIoFeatures]] decodes JPEG/GIF through the JDK's own bundled
  * `javax.imageio` readers — no external library anywhere. Only
  * COMPRESSED AUDIO/VIDEO falls back to [[decodeStub]], the remaining
  * seam where an ffmpeg-class binding would plug in.
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
    * (JPEG, compressed video/audio): a deterministic 16-bin byte
    * histogram, L1-normalized — shape-compatible with the real feature
    * extractors below, trivially reproducible in tests.
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
  private[graft] def imageIoFeatures(blob: Array[Byte]): Option[Array[Float]] = {
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
        val bins = new Array[Float](16)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            bins(lum >> 4) += 1f
            x += 1
          }
          y += 1
        }
        Some(bins.map(_ / math.max(1, w * h).toFloat))
      }
    } catch {
      // Corrupt blobs are data, but OOM/VM errors must propagate — an
      // executor that swallowed an OutOfMemoryError is in an undefined state.
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Feature dispatch: real pixels/samples wherever the JVM can decode —
    * [[Codecs]] (PNG/BMP/PCM-WAV, pure bytes) then [[imageIoFeatures]]
    * (JPEG/GIF via the JDK's bundled readers). The stub histogram now
    * covers ONLY compressed audio/video, which genuinely need external
    * codec libraries (ffmpeg-class) this environment doesn't ship.
    */
  private[graft] def decodeFeatures(blob: Array[Byte]): Array[Float] =
    Codecs.decodePng(blob).orElse(Codecs.decodeBmp(blob)).map(imageFeatures)
      .orElse(Codecs.decodeWav(blob).map(audioFeatures))
      .orElse(imageIoFeatures(blob))
      .getOrElse(decodeStub(blob))

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
    * scale; pixel decoding is also real for PNG/BMP ([[Codecs]]), with
    * only codec-library formats behind [[decodeStub]]'s seam.
    */
  def imageMeta(blob: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_meta", exprs => ImageMetaExpr(exprs.head), "built-in")
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "media_meta", exprs => MediaMetaExpr(exprs.head), "built-in")
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

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) | ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

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

  /** ISO-BMFF atom walk over [start, end): returns the offset of the first
    * atom with `name`, or -1. Atom = [size:be32][type:4cc]; size 1 means a
    * 64-bit size follows, size 0 means to-end-of-enclosure.
    */
  private def findAtom(b: Array[Byte], start: Int, end: Int, name: String): Int = {
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

  private def atomEnd(b: Array[Byte], at: Int, limit: Int): Int = {
    val size0 = be32(b, at)
    val size = if (size0 == 0L) (limit - at).toLong else size0
    math.min(limit.toLong, at + size).toInt
  }

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
