package graft.multimodal

import java.util.zip.Inflater

/** Pure-JVM pixel/sample decoders for the formats that need NO external
  * codec library: PNG (zlib rides `java.util.zip.Inflater`, plus the five
  * scanline filters), uncompressed 24/32-bit BMP, 16-bit PCM WAV, and the
  * ADPCM/companded WAV family — IMA/DVI ADPCM, Microsoft ADPCM, and ITU-T
  * G.711 µ-law/A-law (adaptive-differential and logarithmic-companding
  * coders are spec-simple enough to decode from raw bytes). These take
  * their formats OUT of the stub seam — real pixels/samples decode at any
  * scale with nothing but the JDK. JPEG (DCT entropy coding) rides the
  * JDK's bundled `javax.imageio`; AVI video composes [[parseAvi]]'s frame
  * ranges with either that JPEG decode (MJPEG — every frame is a keyframe
  * JPEG) or [[decodeBmp]] (uncompressed DIB frames are headerless BMPs —
  * [[dibPrefix]] synthesizes the 54-byte header). INTER-FRAME video
  * codecs (H.264-class) and perceptual audio codecs (MP3/AAC-class) stay
  * behind [[Multimodal.decodeStub]]: those genuinely need codec libraries
  * this environment does not ship.
  *
  * All decoders return None on anything malformed/unsupported — corrupt
  * blobs are data, not errors (same contract as the header parsers), and
  * every loop advances monotonically.
  */
object Codecs {

  /** Interleaved 8-bit pixels; channels ∈ {1 gray, 2 gray+alpha, 3 RGB,
    * 4 RGBA}.
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** 16-bit PCM frames, channel-interleaved. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xFFL) << 24) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 1) & 0xFFL) << 8) | (b(i) & 0xFFL)

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)

  // ---- PNG -----------------------------------------------------------------

  private val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Full PNG decode: bit depth 8, color types 0/2/3/4/6, no interlace.
    * Bit depths 1/2/4/16 and Adam7 are rare in training corpora and return
    * None (callers fall back to the stub features).
    */
  def decodePng(blob: Array[Byte]): Option[Image] = {
    if (blob.length < 8 + 25 || !blob.take(8).sameElements(pngMagic)) return None
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var ok = true
    while (ok && i + 8 <= blob.length) {
      val len = be32(blob, i)
      val typ = new String(blob, i + 4, 4, "US-ASCII")
      val dataAt = i + 8
      if (len < 0 || dataAt + len + 4 > blob.length) ok = false
      else {
        typ match {
          case "IHDR" if len >= 13 =>
            w = be32(blob, dataAt).toInt
            h = be32(blob, dataAt + 4).toInt
            bitDepth = blob(dataAt + 8) & 0xFF
            colorType = blob(dataAt + 9) & 0xFF
            interlace = blob(dataAt + 12) & 0xFF
          case "PLTE" => palette = java.util.Arrays.copyOfRange(blob, dataAt, dataAt + len.toInt)
          case "IDAT" => idat.write(blob, dataAt, len.toInt)
          case _ => ()
        }
        i = dataAt + len.toInt + 4 // skip CRC; advance is strictly positive (8 + len + 4)
      }
    }
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => -1
    }
    if (!ok || w <= 0 || h <= 0 || bitDepth != 8 || bpp < 0 || interlace != 0 ||
        idat.size() == 0 || w.toLong * h * bpp > 256L * 1024 * 1024) return None
    // zlib-inflate the concatenated IDAT stream
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: Exception => return None } finally inf.end()
    // un-filter scanlines (None/Sub/Up/Average/Paeth)
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xFF
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xFF
        val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(dst + x - stride) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) out(dst + x - stride - bpp) & 0xFF else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(dst + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    if (colorType == 3) {
      // palette indices -> RGB through PLTE
      if (palette == null) return None
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      while (k < w * h) {
        val idx = (out(k) & 0xFF) * 3
        if (idx + 2 >= palette.length) return None
        rgb(k * 3) = palette(idx); rgb(k * 3 + 1) = palette(idx + 1); rgb(k * 3 + 2) = palette(idx + 2)
        k += 1
      }
      Some(Image(w, h, 3, rgb))
    } else Some(Image(w, h, bpp, out))
  }

  // ---- BMP -----------------------------------------------------------------

  /** Uncompressed 24/32-bit BMP (BITMAPINFOHEADER, BI_RGB), top-down or
    * bottom-up. Output is RGB (BMP stores BGR) / RGBA.
    */
  def decodeBmp(blob: Array[Byte]): Option[Image] = {
    // reserved bytes 6-9 must be 0 — rules out text that happens to start
    // with "BM" masquerading as a bitmap
    if (blob.length < 54 || blob(0) != 'B' || blob(1) != 'M' ||
        le32(blob, 6) != 0L) return None
    val dataOff = le32(blob, 10).toInt
    val w = le32(blob, 18).toInt
    val hRaw = le32(blob, 22).toInt
    val bits = le16(blob, 28)
    val compression = le32(blob, 30)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || compression != 0 || (bits != 24 && bits != 32) ||
        w.toLong * h * 4 > 256L * 1024 * 1024) return None
    val srcBpp = bits / 8
    val rowBytes = (w * srcBpp + 3) / 4 * 4 // rows pad to 4-byte boundaries
    if (dataOff < 0 || dataOff.toLong + rowBytes.toLong * h > blob.length) return None
    val channels = if (bits == 32) 4 else 3
    val out = new Array[Byte](w * h * channels)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * srcBpp
        val d = (y * w + x) * channels
        out(d) = blob(s + 2)     // R (BMP is BGR)
        out(d + 1) = blob(s + 1) // G
        out(d + 2) = blob(s)     // B
        if (channels == 4) out(d + 3) = blob(s + 3)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, channels, out))
  }

  // ---- resize / encode ------------------------------------------------------

  /** Nearest-neighbor resample to (w, h) — the thumbnail / canonical-size
    * step of an image pipeline. Channel-preserving, pure integer index
    * math (`floor(dst · src / out)`), allocation = one output buffer.
    */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, s"resize target must be positive: ${w}x$h")
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * img.channels
        val d = (y * w + x) * img.channels
        var c = 0
        while (c < img.channels) { out(d + c) = img.pixels(s + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }

  /** 24-bit uncompressed BMP encode — the round-trippable pure-JVM sink
    * format ([[decodeBmp]] reads it straight back). Any input channel
    * count: gray replicates to RGB, alpha drops.
    */
  /** 54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER) for an
    * uncompressed bottom-up (or, with `height < 0`, top-down) DIB of the
    * given dimensions — rows pad to 4-byte boundaries, biCompression
    * BI_RGB. Prepending this to a raw DIB payload yields a file
    * [[decodeBmp]] reads back; [[encodeBmp]] and the AVI DIB-frame path
    * ([[dibPrefix]]) both build on it.
    */
  def bmpHeaderFor(width: Int, height: Int, bitCount: Int): Array[Byte] = {
    require(width > 0 && height != 0 && (bitCount == 24 || bitCount == 32),
      s"unsupported DIB shape: ${width}x$height @$bitCount")
    val rowBytes = (width * (bitCount / 8) + 3) / 4 * 4
    val dataSize = rowBytes * math.abs(height)
    val out = new Array[Byte](54)
    def le16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32w(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte; out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32w(2, 54 + dataSize); le32w(10, 54)
    le32w(14, 40); le32w(18, width); le32w(22, height)
    le16(26, 1); le16(28, bitCount); le32w(30, 0); le32w(34, dataSize)
    out
  }

  def encodeBmp(img: Image): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    System.arraycopy(bmpHeaderFor(img.width, img.height, 24), 0, out, 0, 54)
    val c = img.channels
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * c
        val (r, g, b) =
          if (c <= 2) { val v = img.pixels(s); (v, v, v) }
          else (img.pixels(s), img.pixels(s + 1), img.pixels(s + 2))
        val d = dstRow + x * 3
        out(d) = b; out(d + 1) = g; out(d + 2) = r // BGR on disk
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- WAV -----------------------------------------------------------------

  /** Parsed RIFF-WAVE chunk layout shared by every WAV decoder: the base
    * fmt fields, the fmt payload's position/length (codec-specific
    * decoders read their own extension fields from it, already capped to
    * the blob), and the data region. Generic well-formedness lives here —
    * RIFF/WAVE magic, a fmt chunk whose DECLARED size covers the 16 base
    * fields (a truncated fmt must not parse channels/rate/blockAlign from
    * the NEXT chunk's bytes), a data chunk, positive rate/channels —
    * codec checks (format tag, bit depth, block shape) stay in each
    * decoder.
    */
  private final case class WavLayout(fmt: Int, channels: Int, rate: Int,
      blockAlign: Int, bits: Int, fmtAt: Int, fmtLen: Int,
      dataAt: Int, dataLen: Int)

  private def parseWavLayout(blob: Array[Byte]): Option[WavLayout] = {
    if (blob.length < 12 || blob(0) != 'R' || blob(1) != 'I' || blob(2) != 'F' ||
        blob(3) != 'F' || new String(blob, 8, 4, "US-ASCII") != "WAVE") return None
    var rate = 0; var channels = 0; var bits = 0; var fmt = 0
    var blockAlign = 0; var fmtAt = -1; var fmtLen = 0
    var dataAt = -1; var dataLen = 0
    var i = 12
    while (i + 8 <= blob.length) {
      val id = new String(blob, i, 4, "US-ASCII")
      val size = le32(blob, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= blob.length) {
        fmtAt = i + 8
        fmtLen = math.min(size, (blob.length - fmtAt).toLong).toInt
        fmt = le16(blob, fmtAt)
        channels = le16(blob, fmtAt + 2)
        rate = le32(blob, fmtAt + 4).toInt
        blockAlign = le16(blob, fmtAt + 12)
        bits = le16(blob, fmtAt + 14)
      } else if (id == "data") {
        dataAt = i + 8
        dataLen = math.min(size, (blob.length - dataAt).toLong).toInt
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > blob.length) i = blob.length else i = next.toInt
    }
    if (fmtAt < 0 || dataAt < 0 || rate <= 0 || channels <= 0) None
    else Some(WavLayout(fmt, channels, rate, blockAlign, bits, fmtAt, fmtLen,
      dataAt, dataLen))
  }

  /** 16-bit PCM WAV sample decode (audioFormat 1). */
  def decodeWav(blob: Array[Byte]): Option[Pcm] =
    parseWavLayout(blob).flatMap { l =>
      if (l.fmt != 1 || l.bits != 16) None
      else {
        val n = l.dataLen / 2
        val samples = new Array[Short](n)
        var k = 0
        while (k < n) { samples(k) = le16(blob, l.dataAt + k * 2).toShort; k += 1 }
        Some(Pcm(l.rate, l.channels, samples))
      }
    }

  // ---- G.711 µ-law / A-law --------------------------------------------------

  /** ITU-T G.711 µ-law expansion: one companded byte → linear 16-bit, by
    * the public segment formula (complement; mantissa·8 + bias 0x84,
    * shifted by the 3-bit segment; bias removed; sign applied). Peak
    * ±32124 — the G.711 table values every conformant decoder shares.
    */
  private def ulawExpand(b: Byte): Short = {
    val u = (~b) & 0xFF
    val mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    (if ((u & 0x80) != 0) 0x84 - mag else mag - 0x84).toShort
  }

  /** ITU-T G.711 A-law expansion (toggle 0x55; segment 0 is linear,
    * segments 1-7 shift mantissa·16 + 0x108). Peak ±32256. Note A-law's
    * sign convention is inverted relative to µ-law: a SET sign bit means
    * positive.
    */
  private def alawExpand(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xFF
    val seg = (a >> 4) & 0x07
    val mag =
      if (seg == 0) ((a & 0x0F) << 4) + 8
      else (((a & 0x0F) << 4) + 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) mag else -mag).toShort
  }

  /** G.711 companded WAV decode — audioFormat 6 (A-law) or 7 (µ-law),
    * 8 bits per sample, one byte per sample expanded to linear 16-bit.
    * The standard telephony/voice-corpus encoding; pure arithmetic, no
    * tables beyond the spec constants above.
    */
  def decodeG711Wav(blob: Array[Byte]): Option[Pcm] =
    parseWavLayout(blob).flatMap { l =>
      if ((l.fmt != 6 && l.fmt != 7) || l.bits != 8) None
      else {
        val n = l.dataLen
        val samples = new Array[Short](n)
        var k = 0
        if (l.fmt == 7) while (k < n) { samples(k) = ulawExpand(blob(l.dataAt + k)); k += 1 }
        else while (k < n) { samples(k) = alawExpand(blob(l.dataAt + k)); k += 1 }
        Some(Pcm(l.rate, l.channels, samples))
      }
    }

  // ---- IMA ADPCM -----------------------------------------------------------

  // the IMA-spec quantizer step table (89 entries) and index adjustments —
  // fixed constants every conformant encoder/decoder shares
  private val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable one-channel IMA decoder state (predictor + step index). */
  private final class AdpcmState(var pred: Int, var idx: Int) {
    /** Decode one 4-bit code to a 16-bit sample (the standard
      * shift-approximation: diff ≈ (2·mag+1)·step/8 via step>>3 + bits).
      */
    def decode(n: Int): Short = {
      val step = AdpcmSteps(idx)
      var diff = step >> 3
      if ((n & 1) != 0) diff += step >> 2
      if ((n & 2) != 0) diff += step >> 1
      if ((n & 4) != 0) diff += step
      pred = if ((n & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      idx = idx + AdpcmIndexAdj(n & 7)
      if (idx < 0) idx = 0 else if (idx > 88) idx = 88
      pred.toShort
    }
  }

  /** IMA/DVI ADPCM WAV decode (audioFormat 0x11) — the first COMPRESSED
    * audio codec decoded for real behind the multimodal seam, still with
    * no external library. WAVE block layout: per channel a 4-byte header
    * (int16 predictor = the block's first sample, uint8 step index,
    * reserved byte), then 4-bit codes low-nibble-first; stereo data
    * interleaves per-channel 4-byte (8-code) groups. `samplesPerBlock`
    * from the fmt extension bounds each block's output (the final block
    * may be short). Returns None for anything that is not a well-formed
    * fmt-17 WAV, so [[decodeWav]]'s PCM path and this one can chain.
    */
  def decodeImaAdpcmWav(blob: Array[Byte]): Option[Pcm] = {
    val l = parseWavLayout(blob).orNull
    if (l == null) return None
    val rate = l.rate; val channels = l.channels; val blockAlign = l.blockAlign
    val dataAt = l.dataAt; val dataLen = l.dataLen
    // samplesPerBlock lives in the fmt extension (>= 20 bytes of payload)
    val spbDeclared = if (l.fmtLen >= 20) le16(blob, l.fmtAt + 18) else 0
    if (l.fmt != 0x11 || l.bits != 4 || channels > 2 ||
        blockAlign < channels * 4) return None
    // stereo interleaves FULL 8-byte (8-code-per-channel) groups — a
    // data region that is not a whole number of groups would make ch1's
    // 4-byte run read past the block (encoders always align; refuse)
    if (channels == 2 && (blockAlign - 8) % 8 != 0) return None
    // samples per block per channel: header sample + 2 codes per data
    // byte. The BLOCK's capacity also CAPS a declared samplesPerBlock —
    // an adversarial header (up to 65535) must neither read past the
    // block nor size the output beyond what the data can hold.
    val capacity = (blockAlign / channels - 4) * 2 + 1
    val spb =
      if (spbDeclared > 0) math.min(spbDeclared, capacity) else capacity
    val nBlocks = dataLen / blockAlign
    if (nBlocks.toLong * spb * channels > (1L << 28)) return None
    val out = new Array[Short](nBlocks * spb * channels)
    var pos = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = dataAt + blk * blockAlign
      // per-channel headers: predictor IS the first output sample
      val st = new Array[AdpcmState](channels)
      var c = 0
      while (c < channels) {
        val h = base + c * 4
        val pred = le16(blob, h).toShort.toInt // sign-extended
        var idx = blob(h + 2) & 0xFF
        if (idx > 88) idx = 88
        st(c) = new AdpcmState(pred, idx)
        out(pos + c) = pred.toShort
        c += 1
      }
      pos += channels
      var emitted = 1 // per channel
      // data area: 4-byte groups per channel, interleaved when stereo
      var p = base + channels * 4
      val blockEnd = base + blockAlign
      while (p < blockEnd && emitted < spb) {
        // decode one interleave round: 4 bytes (8 codes) per channel
        var s = 0
        while (s < 8 && emitted + s < spb) {
          c = 0
          while (c < channels) {
            val byte = blob(p + c * 4 + s / 2) & 0xFF
            val code = if ((s & 1) == 0) byte & 0xF else byte >> 4
            out(pos + (s * channels) + c) = st(c).decode(code)
            c += 1
          }
          s += 1
        }
        pos += s * channels
        emitted += s
        p += channels * 4
      }
      // spb bounds the block (a short final interleave round emitted
      // fewer); any remaining positions in `out` past real data are
      // trimmed below
      blk += 1
    }
    val samples = if (pos == out.length) out else java.util.Arrays.copyOf(out, pos)
    Some(Pcm(rate, channels, samples))
  }

  // ---- Microsoft ADPCM ------------------------------------------------------

  // the MS-ADPCM delta adaptation table — spec constants shared by every
  // conformant decoder (indexed by the unsigned 4-bit code)
  private val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230)

  /** Microsoft ADPCM WAV decode (audioFormat 2) — the OTHER 4-bit ADPCM
    * that ships in the wild. Unlike IMA's fixed step table, MS-ADPCM
    * predicts each sample from the previous TWO through per-block
    * coefficient pairs chosen from a table the fmt extension itself
    * carries (wNumCoef pairs after wSamplesPerBlock; the standard set is
    * 7). Block layout, channel-interleaved per field: uint8 predictor
    * index, int16 initial delta, int16 sample1 (the NEWER seed), int16
    * sample2 — then 4-bit codes high-nibble-first, alternating channels.
    * Each block emits sample2, sample1, then the decoded codes:
    * predSample = (sample1·coef1 + sample2·coef2)/256 + signedCode·delta
    * (clamped), delta = max(16, adaptTable(code)·delta/256). Refuses
    * (None) on a missing/short coefficient extension, a block whose
    * predictor index exceeds the declared table, or any non-fmt-2 WAV —
    * so the PCM/IMA/G.711 paths and this one can chain.
    */
  def decodeMsAdpcmWav(blob: Array[Byte]): Option[Pcm] = {
    val l = parseWavLayout(blob).orNull
    if (l == null) return None
    val channels = l.channels; val blockAlign = l.blockAlign
    if (l.fmt != 2 || l.bits != 4 || channels > 2 ||
        blockAlign < 7 * channels + channels) return None
    // fmt extension: cbSize(2) wSamplesPerBlock(2) wNumCoef(2) then
    // wNumCoef int16 pairs — all required by the spec; refuse without it
    if (l.fmtLen < 22) return None
    val spbDeclared = le16(blob, l.fmtAt + 18)
    val nCoef = le16(blob, l.fmtAt + 20)
    if (nCoef <= 0 || nCoef > 256 || l.fmtLen < 22 + nCoef * 4) return None
    val coef1 = new Array[Int](nCoef)
    val coef2 = new Array[Int](nCoef)
    var ci = 0
    while (ci < nCoef) {
      coef1(ci) = le16(blob, l.fmtAt + 22 + ci * 4).toShort.toInt
      coef2(ci) = le16(blob, l.fmtAt + 24 + ci * 4).toShort.toInt
      ci += 1
    }
    // samples per block per channel: 2 header seeds + one code per nibble;
    // the block's capacity caps a forged wSamplesPerBlock (same guard as
    // the IMA path)
    val capacity = (blockAlign - 7 * channels) * 2 / channels + 2
    val spb =
      if (spbDeclared > 0) math.min(spbDeclared, capacity) else capacity
    if (spb < 2) return None
    val nBlocks = l.dataLen / blockAlign
    if (nBlocks.toLong * spb * channels > (1L << 28)) return None
    val out = new Array[Short](nBlocks * spb * channels)
    var pos = 0
    val pIdx = new Array[Int](channels)
    val delta = new Array[Int](channels)
    val s1 = new Array[Int](channels)
    val s2 = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val base = l.dataAt + blk * blockAlign
      var c = 0
      while (c < channels) {
        pIdx(c) = blob(base + c) & 0xFF
        if (pIdx(c) >= nCoef) return None // malformed: refuse, don't guess
        delta(c) = le16(blob, base + channels + c * 2).toShort.toInt
        s1(c) = le16(blob, base + 3 * channels + c * 2).toShort.toInt
        s2(c) = le16(blob, base + 5 * channels + c * 2).toShort.toInt
        // the two seed samples are emitted oldest-first
        out(pos + c) = s2(c).toShort
        out(pos + channels + c) = s1(c).toShort
        c += 1
      }
      pos += 2 * channels
      var emitted = 2L * channels // across channels, frame-interleaved
      val target = spb.toLong * channels
      var p = base + 7 * channels
      val blockEnd = base + blockAlign
      while (p < blockEnd && emitted < target) {
        val byte = blob(p) & 0xFF
        var half = 0
        while (half < 2 && emitted < target) {
          val code = if (half == 0) byte >> 4 else byte & 0xF // high first
          c = (emitted % channels).toInt
          val signed = if (code >= 8) code - 16 else code
          var pred = (s1(c) * coef1(pIdx(c)) + s2(c) * coef2(pIdx(c))) / 256 +
            signed * delta(c)
          if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
          out(pos + (emitted - 2L * channels).toInt) = pred.toShort
          s2(c) = s1(c); s1(c) = pred
          delta(c) = MsAdaptTable(code) * delta(c) / 256
          if (delta(c) < 16) delta(c) = 16
          emitted += 1
          half += 1
        }
        p += 1
      }
      pos += (emitted - 2L * channels).toInt
      blk += 1
    }
    val samples = if (pos == out.length) out else java.util.Arrays.copyOf(out, pos)
    Some(Pcm(l.rate, channels, samples))
  }

  // ---- AVI (RIFF video container) -------------------------------------------

  /** Parsed AVI video stream: header metadata plus the byte ranges of the
    * video frames in the movi list, in stream order. `handler` is the
    * stream's codec fourcc (strh fccHandler, falling back to strf
    * biCompression) — "MJPG" frames are complete JPEG images the existing
    * JPEG decoder reads for real.
    */
  final case class Avi(width: Int, height: Int, usPerFrame: Long,
      totalFrames: Int, handler: String, bitCount: Int, topDown: Boolean,
      frames: Array[(Long, Long)])

  /** BMP header to prepend to an uncompressed-DIB AVI frame payload, or
    * empty when the stream is not raw DIB. An AVI 'db'/'dc' chunk of a
    * BI_RGB stream is literally a BMP with the 54-byte header stripped —
    * rows bottom-up (top-down when strf declared a negative biHeight),
    * 4-byte-padded, BGR — so [[bmpHeaderFor]] + the payload round-trips
    * through [[decodeBmp]] with zero new pixel code. Guarded by an exact
    * size check: only a frame whose byte count equals rowBytes·height is
    * a whole uncompressed raster (anything else — partial/compressed —
    * stays un-prefixed and undecodable, which is honest).
    */
  def dibPrefix(avi: Avi, frameSize: Long): Array[Byte] = {
    val raw = avi.handler.isEmpty || avi.handler == "DIB" || avi.handler == "RGB"
    if (!raw || (avi.bitCount != 24 && avi.bitCount != 32) ||
        avi.width <= 0 || avi.height <= 0) return Array.emptyByteArray
    val rowBytes = (avi.width.toLong * (avi.bitCount / 8) + 3) / 4 * 4
    if (frameSize != rowBytes * avi.height) Array.emptyByteArray
    else bmpHeaderFor(avi.width, if (avi.topDown) -avi.height else avi.height,
      avi.bitCount)
  }

  /** AVI container parse — the RIFF walk [[decodeWav]] uses, extended one
    * level of nesting (LIST chunks carry a 4cc subtype then children):
    * `LIST hdrl` → `avih` (frame timing, declared dimensions) and the
    * first `LIST strl` whose `strh` is a video stream (fccType 'vids',
    * recording its stream INDEX — movi chunk ids are '<nn>dc'/'<nn>db'
    * with nn = the zero-padded stream number); `LIST movi` → that
    * stream's frame chunk ranges (offset, size into the blob), including
    * inside `LIST rec ` groupings (interleaved-AVI framing). Defensive
    * like the WAV walk: sizes advance in Long, truncated/overflowing
    * declarations stop the walk, `maxFrames` bounds the range list so a
    * forged header cannot force a huge allocation. Returns None when the
    * blob is not RIFF-AVI or has no video stream.
    */
  def parseAvi(blob: Array[Byte], maxFrames: Int = 4096): Option[Avi] = {
    if (blob.length < 12 || blob(0) != 'R' || blob(1) != 'I' || blob(2) != 'F' ||
        blob(3) != 'F' || new String(blob, 8, 4, "US-ASCII") != "AVI ") return None
    var usPerFrame = 0L; var totalFrames = 0
    var w = 0; var h = 0
    var handler = ""
    var bitCount = 0; var topDown = false
    var videoStream = -1 // index among ALL streams, in strl order
    var streamIdx = 0
    val frames = Array.newBuilder[(Long, Long)]
    var nFrames = 0

    def fourcc(i: Int): String = new String(blob, i, 4, "US-ASCII")

    // walk children of [at, end): top level, or a LIST's payload after its
    // 4-byte subtype. `inMovi` collects the video stream's frame chunks.
    def walk(at: Int, end: Int, inMovi: Boolean): Unit = {
      var i = at
      while (i + 8 <= end) {
        val id = fourcc(i)
        val size = le32(blob, i + 4)
        val payload = i + 8
        val pEnd = math.min(end.toLong, payload.toLong + size).toInt
        if (id == "LIST" && size >= 4 && payload + 4 <= end) {
          val sub = fourcc(payload)
          // hdrl/strl/odml metadata and movi/rec  framing all recurse; a
          // movi context propagates through rec  groupings
          walk(payload + 4, pEnd, inMovi || sub == "movi")
        } else if (id == "avih" && payload + 40 <= pEnd) {
          usPerFrame = le32(blob, payload)
          totalFrames = le32(blob, payload + 16).toInt
          w = le32(blob, payload + 32).toInt
          h = le32(blob, payload + 36).toInt
        } else if (id == "strh" && payload + 8 <= pEnd) {
          if (fourcc(payload) == "vids" && videoStream < 0) {
            videoStream = streamIdx
            handler = fourcc(payload + 4).trim
          }
          streamIdx += 1
        } else if (id == "strf" && videoStream == streamIdx - 1 &&
            payload + 20 <= pEnd) {
          // BITMAPINFOHEADER of the just-declared video stream: take its
          // dimensions when avih carried none, and biCompression when
          // strh's handler was blank (both layouts ship in the wild);
          // biBitCount and the biHeight sign (negative = top-down rows)
          // feed [[dibPrefix]]'s raw-frame reconstruction
          if (w <= 0) w = le32(blob, payload + 4).toInt
          if (h <= 0) h = math.abs(le32(blob, payload + 8).toInt)
          if (le32(blob, payload + 8).toInt < 0) topDown = true
          bitCount = le16(blob, payload + 14)
          if (handler.isEmpty) handler = fourcc(payload + 16).trim
        } else if (inMovi && videoStream >= 0 && nFrames < maxFrames &&
            id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) &&
            id.startsWith(f"$videoStream%02d") && size > 0 &&
            payload.toLong + size <= blob.length) {
          frames += ((payload.toLong, size))
          nFrames += 1
        }
        val next = i.toLong + 8L + size + (size & 1L)
        if (next <= i || next > end) i = end else i = next.toInt
      }
    }
    walk(12, blob.length, inMovi = false)
    if (videoStream < 0 || w <= 0 || h <= 0) None
    else Some(Avi(w, h, usPerFrame, totalFrames, handler, bitCount, topDown,
      frames.result()))
  }
}
