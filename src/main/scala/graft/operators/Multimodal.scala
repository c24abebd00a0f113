package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column handling for training-data
 * pipelines: media travels as an opaque `binary` column plus a typed
 * metadata struct; per-item compute runs batched inside mapPartitions —
 * the Scala analogue of Python's mapInPandas contract (batch in, batch
 * out, executor-local, no driver round-trips).
 *
 * Container HEADERS decode for real (PNG/JPEG/GIF/BMP/WAV —
 * [[decodeHeader]]), and so do every payload whose codec the JDK
 * carries: BMP pixel rows ([[decodeBmpPixels]]) and WAV PCM samples
 * ([[decodeWavSamples]]) are raw bytes behind the header, and PNG
 * pixel data ([[decodePngPixels]]) is zlib + the five spec filters —
 * java.util.zip Inflater/CRC32 is the codec, pure JDK. Only JPEG
 * (DCT) and GIF (LZW) pixel payloads keep the clearly-marked
 * deterministic stub (`decodeStub`) — those libraries are not in this
 * container; everything around the stub — schema, batching,
 * partitioning, feature shape — is the real plumbing a codec would
 * drop into.
 *
 * At 100 TB: rows are value-heavy (MBs per row), so operators here never
 * shuffle the binary payload — metadata-only projections go through
 * aggregations, and payload transforms stay narrow (mapPartitions).
 */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, n_bytes: Long)
  final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class FrameRow(media_id: Long, frame_no: Int, content: Array[Byte])
  final case class FeatureRow(media_id: Long, features: Array[Float])

  /**
   * STUB — deterministic fake decoder standing in for a pixel codec.
   * Derives plausible metadata purely from the byte count so tests and
   * oracles are reproducible: width = n%640+1, height = (n*7)%480+1,
   * channels = 3. [[decodeHeader]] falls back to this for payloads whose
   * container format it doesn't recognize, which keeps synthetic test
   * corpora (text bytes posing as media) deterministic.
   */
  def decodeStub(content: Array[Byte]): MediaMeta = {
    val n = content.length.toLong
    MediaMeta("fake", (n % 640).toInt + 1, ((n * 7) % 480).toInt + 1, 3, n)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** REAL container-header decode — pure JVM byte inspection, no codec
    * dependency — for the three formats whose dimensions live in a fixed
    * header: PNG (IHDR chunk), JPEG (SOFn marker scan), GIF (logical
    * screen descriptor). This is the production default for [[decode]];
    * anything unrecognized or truncated falls back to [[decodeStub]]
    * rather than failing the batch (corrupt rows are a quarantine
    * concern, not a stage-kill concern, at 100 TB).
    *
    * Only the header is touched — never the pixel data — so the per-row
    * cost is O(header), not O(payload). */
  def decodeHeader(content: Array[Byte]): MediaMeta = {
    val b = content
    val n = b.length.toLong
    // PNG: 8-byte signature, then the IHDR chunk is REQUIRED first:
    // 4-byte length, "IHDR", 4-byte BE width, 4-byte BE height,
    // 1-byte bit depth, 1-byte color type (channels per color type).
    if (b.length >= 26 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = u32be(b, 16)
      val h = u32be(b, 20)
      val channels = u8(b, 25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return decodeStub(content)
      }
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return decodeStub(content)
      return MediaMeta("png", w.toInt, h.toInt, channels, n)
    }
    // JPEG: SOI then marker segments; dimensions are in the first SOFn
    // (C0-CF minus the non-frame C4/C8/CC): 2-byte length, 1-byte
    // precision, 2-byte BE height, 2-byte BE width, 1-byte #components.
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return decodeStub(content)
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return decodeStub(content)
        val marker = u8(b, j)
        if ((marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (j + 8 >= b.length) return decodeStub(content)
          val h = u16be(b, j + 4)
          val w = u16be(b, j + 6)
          val channels = u8(b, j + 8)
          if (w <= 0 || h <= 0 || channels <= 0) return decodeStub(content)
          return MediaMeta("jpeg", w, h, channels, n)
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1 // standalone marker, no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return decodeStub(content) // EOI / entropy data: no SOF seen
        } else {
          if (j + 2 >= b.length) return decodeStub(content)
          val len = u16be(b, j + 1)
          if (len < 2) return decodeStub(content)
          i = j + 1 + len
        }
      }
      return decodeStub(content)
    }
    // GIF87a/GIF89a: LITTLE-endian 2-byte width/height at offsets 6/8.
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = u8(b, 6) | (u8(b, 7) << 8)
      val h = u8(b, 8) | (u8(b, 9) << 8)
      if (w <= 0 || h <= 0) return decodeStub(content)
      return MediaMeta("gif", w, h, 3, n)
    }
    // BMP: "BM", then LITTLE-endian s32 width/height at 18/22 (height
    // may be negative for top-down rows — magnitude is the dimension),
    // bits-per-pixel at 28 → channels.
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      val w = u32le(b, 18).toInt
      val h = math.abs(u32le(b, 22).toInt)
      val bpp = u16le(b, 28)
      if (w <= 0 || h <= 0 || bpp <= 0 || bpp % 8 != 0)
        return decodeStub(content)
      return MediaMeta("bmp", w, h, math.max(1, bpp / 8), n)
    }
    // WAV (RIFF/WAVE): chunked; the REQUIRED "fmt " chunk carries
    // channels (u16le), sample rate (u32le), bits/sample (u16le).
    // Audio maps onto the image-shaped MediaMeta as width = sample
    // rate, height = bits per sample — documented convention so ONE
    // metadata schema serves both modalities downstream.
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') {
      var i = 12
      while (i + 8 <= b.length) {
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
          b(i + 3) == ' '
        val size = u32le(b, i + 4)
        if (isFmt) {
          if (i + 8 + 16 > b.length) return decodeStub(content)
          val channels = u16le(b, i + 10)
          val sampleRate = u32le(b, i + 12).toInt
          val bits = u16le(b, i + 22)
          if (channels <= 0 || sampleRate <= 0 || bits <= 0)
            return decodeStub(content)
          return MediaMeta("wav", sampleRate, bits, channels, n)
        }
        // chunks are word-aligned: odd sizes pad one byte
        if (size < 0 || size > Int.MaxValue - 9) return decodeStub(content)
        i += 8 + size.toInt + (size.toInt & 1)
      }
      return decodeStub(content)
    }
    decodeStub(content)
  }

  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Attach decoded metadata to a (media_id, content) table. Batched
    * mapPartitions — the mapInPandas-shaped entry point. `parse` defaults
    * to the real header decoder ([[decodeHeader]]), which itself falls
    * back to the deterministic stub on unrecognized payloads. */
  def decode(media: DataFrame, batchSize: Int = 64,
             parse: Array[Byte] => MediaMeta = decodeHeader): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch to amortize per-item codec setup, like an Arrow batch
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => MediaRow(id, bytes, parse(bytes)) }
        }
      }
  }

  /** STUB resize: a real kernel would rescale pixels; the fake keeps the
    * plumbing honest by transforming content deterministically (truncate/
    * pad to the target byte budget) and rewriting metadata. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val budget = w * h * m.meta.channels
        val out = java.util.Arrays.copyOf(m.content, budget)
        MediaRow(m.media_id, out,
          MediaMeta(m.meta.format, w, h, m.meta.channels, budget.toLong))
      }
    }
  }

  /** STUB frame sampling: every nth "frame" of a fake fixed frame size;
    * one row per sampled frame (video → images explode). */
  def frameSample(media: Dataset[MediaRow], everyN: Int,
                  frameBytes: Int = 256): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = math.max(m.content.length / frameBytes, 1)
      (0 until nFrames by everyN).map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, m.content.length)
        FrameRow(m.media_id, f, java.util.Arrays.copyOfRange(m.content, from,
          math.max(until, from)))
      }
    }
  }

  // -----------------------------------------------------------------
  // REAL payload decode for the uncompressed containers. BMP pixel
  // rows and WAV PCM samples are raw bytes after the (already-real)
  // header — no codec dependency exists to stub. PNG decodes for real
  // further below (zlib ships in the JDK); JPEG (DCT) and GIF (LZW)
  // pixel data remain the one honest stub in this module.
  // -----------------------------------------------------------------

  /** Exact integer pixel statistics of an uncompressed BMP payload. */
  final case class BmpPixelStats(width: Int, height: Int, channels: Int,
                                 n_px: Long, ch_sum: Array[Long],
                                 px_min: Int, px_max: Int,
                                 top_left: Array[Int],
                                 bottom_right: Array[Int])

  /** REAL BMP pixel decode — 8/24/32 bpp uncompressed DIBs, pure JVM
    * byte walking. Handles the three traps a naive reader hits: the
    * pixel array starts at the header's data offset (byte 10), each
    * file row pads to a 4-byte stride (pad bytes must NOT enter the
    * stats), and rows are stored bottom-up unless height is negative
    * (top-down) — `top_left`/`bottom_right` are LOGICAL corners, which
    * is what pins row order in the gate. Per-channel sums, min/max,
    * and corners are all exact integers (8-bit samples are the
    * channel values; 24/32 bpp returns channels in B,G,R[,A] file
    * order). Returns None for compressed (biCompression ≠ 0) or
    * truncated payloads — quarantine, not stage-kill. */
  def decodeBmpPixels(content: Array[Byte]): Option[BmpPixelStats] = {
    val b = content
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = u32le(b, 10).toInt
    val w = u32le(b, 18).toInt
    val hRaw = u32le(b, 22).toInt
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = u16le(b, 28)
    val compression = u32le(b, 30)
    if (w <= 0 || h <= 0 || compression != 0L ||
        (bpp != 8 && bpp != 24 && bpp != 32)) return None
    val ch = bpp / 8
    val stride = ((w * ch + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
      return None
    val sums = new Array[Long](ch)
    var mn = 255
    var mx = 0
    var y = 0
    while (y < h) {
      // logical row y lives at file row (h-1-y) unless top-down
      val fileRow = if (topDown) y else h - 1 - y
      var x = 0
      val rowOff = dataOff + fileRow * stride
      while (x < w) {
        var c = 0
        while (c < ch) {
          val v = u8(b, rowOff + x * ch + c)
          sums(c) += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    def px(yy: Int, xx: Int): Array[Int] = {
      val fr = if (topDown) yy else h - 1 - yy
      Array.tabulate(ch)(c => u8(b, dataOff + fr * stride + xx * ch + c))
    }
    Some(BmpPixelStats(w, h, ch, w.toLong * h, sums, mn, mx,
      px(0, 0), px(h - 1, w - 1)))
  }

  /** Exact integer sample statistics of a PCM WAV payload. */
  final case class WavSampleStats(channels: Int, bits: Int,
                                  n_samples: Long, s_sum: Long,
                                  sq_sum: Long, s_min: Int, s_max: Int,
                                  n_zero_cross: Long)

  /** REAL WAV PCM sample decode — walks the RIFF chunks to the `data`
    * chunk and folds the samples: 16-bit signed little-endian or
    * 8-bit unsigned (recentred to signed by −128, the WAV
    * convention), any channel count (samples interleave; stats pool
    * across channels, zero-crossings count sign flips of consecutive
    * frames' first channel). Everything is an exact integer — sum,
    * sum of squares, min/max, crossings — so any engine replays the
    * numbers bit-for-bit. None for non-PCM (fmt tag ≠ 1), absent
    * chunks, or truncated data. */
  def decodeWavSamples(content: Array[Byte]): Option[WavSampleStats] = {
    val b = content
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    var i = 12
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (i + 8 <= b.length && (!fmtOk || dataOff < 0)) {
      val size = u32le(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 9) return None
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a'
      if (isFmt) {
        if (i + 8 + 16 > b.length) return None
        if (u16le(b, i + 8) != 1) return None // PCM only
        channels = u16le(b, i + 10)
        bits = u16le(b, i + 22)
        fmtOk = channels > 0 && (bits == 8 || bits == 16)
        if (!fmtOk) return None
      } else if (isData) {
        dataOff = i + 8
        dataLen = size.toInt
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtOk || dataOff < 0 ||
        dataOff.toLong + dataLen > b.length) return None
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    def sample(j: Int): Int =
      if (bits == 16) (u8(b, dataOff + 2 * j) |
        (b(dataOff + 2 * j + 1).toInt << 8)) // high byte keeps its sign
      else u8(b, dataOff + j) - 128
    var sum = 0L
    var sq = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var cross = 0L
    var prevSign = 0
    var j = 0
    while (j < n) {
      val v = sample(j)
      sum += v
      sq += v.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      if (j % channels == 0) { // first channel of each frame
        val s = Integer.signum(v)
        if (s != 0 && prevSign != 0 && s != prevSign) cross += 1
        if (s != 0) prevSign = s
      }
      j += 1
    }
    if (n == 0) { mn = 0; mx = 0 }
    Some(WavSampleStats(channels, bits, n, sum, sq, mn, mx, cross))
  }

  /** Byte builder for an 8-bit greyscale BMP (bottom-up rows, 4-byte
    * stride, pad bytes 0xEE so stride mistakes corrupt the stats
    * loudly, a 256-entry greyscale palette after the headers). The
    * spec/gate fixture constructor — and an honest writer for test
    * media. */
  def bmpGray8Bytes(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"need ${w * h} pixels")
    val stride = ((w + 3) / 4) * 4
    val dataOff = 14 + 40 + 256 * 4
    val size = dataOff + stride * h
    val out = new Array[Byte](size)
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, size); p32(10, dataOff)
    p32(14, 40); p32(18, w); p32(22, h)
    p16(26, 1); p16(28, 8); p32(30, 0)
    var g = 0
    while (g < 256) { // greyscale palette (B,G,R,0)
      val o = 54 + g * 4
      out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
      g += 1
    }
    var y = 0
    while (y < h) {
      val rowOff = dataOff + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) { out(rowOff + x) = pixels(y * w + x); x += 1 }
      while (x < stride) { out(rowOff + x) = 0xEE.toByte; x += 1 }
      y += 1
    }
    out
  }

  /** Byte builder for a mono 16-bit PCM WAV. */
  def wavPcm16Bytes(samples: Array[Short],
                    sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
    }
    def tag(i: Int, s: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    tag(0, "RIFF"); p32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1)
    p32(24, sampleRate); p32(28, sampleRate.toLong * 2)
    p16(32, 2); p16(34, 16)
    tag(36, "data"); p32(40, dataLen)
    var j = 0
    while (j < samples.length) { p16(44 + 2 * j, samples(j) & 0xffff); j += 1 }
    out
  }

  // -----------------------------------------------------------------
  // REAL PNG pixel codec — pure JDK. PNG's "compressed codec" is zlib,
  // which java.util.zip (Inflater/Deflater/CRC32) ships; the rest of
  // the format is the chunk walk and the five per-row filters
  // (None/Sub/Up/Average/Paeth, PNG spec §9). So PNG pixel data
  // decodes for REAL here; only JPEG (DCT) and GIF (LZW) payloads
  // remain stubbed.
  // -----------------------------------------------------------------

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private val pngSig: Array[Int] = Array(137, 80, 78, 71, 13, 10, 26, 10)

  /** Minimal REAL PNG encoder for fixtures/gates: 8-bit grayscale
    * (`channels = 1`), RGB (3), or RGBA (4); non-interlaced; one IDAT;
    * correct CRC32s. Each row is filtered with type `row % 5` — the
    * encoder deliberately cycles through ALL FIVE spec filters so a
    * decoder that mishandles Sub/Up/Average/Paeth cannot round-trip
    * its output (the honest-decode guarantee: nothing about this pair
    * is mutually-cancelling identity transforms; the bytes on the wire
    * are genuine filtered-then-deflated PNG). */
  def pngBytes(pixels: Array[Byte], w: Int, h: Int,
               channels: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      "pngBytes encodes gray, RGB, or RGBA")
    require(pixels.length == w * h * channels, "pixel buffer shape")
    val rowLen = w * channels
    val raw = new Array[Byte](h * (1 + rowLen))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + rowLen)) = f.toByte
      var i = 0
      while (i < rowLen) {
        val cur = pixels(y * rowLen + i) & 0xff
        val a = if (i >= channels) pixels(y * rowLen + i - channels) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * rowLen + i) & 0xff else 0
        val c = if (y > 0 && i >= channels)
          pixels((y - 1) * rowLen + i - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + rowLen) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = bos.toByteArray
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val ihdr = new Array[Byte](13)
    def p32(arr: Array[Byte], i: Int, v: Long): Unit = {
      arr(i) = ((v >> 24) & 0xff).toByte; arr(i + 1) = ((v >> 16) & 0xff).toByte
      arr(i + 2) = ((v >> 8) & 0xff).toByte; arr(i + 3) = (v & 0xff).toByte
    }
    p32(ihdr, 0, w.toLong); p32(ihdr, 4, h.toLong)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8
    val out = new java.io.ByteArrayOutputStream()
    pngSig.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = new Array[Byte](4); p32(len, 0, data.length.toLong)
      out.write(len, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val cb = new Array[Byte](4); p32(cb, 0, crc.getValue)
      out.write(cb, 0, 4)
    }
    chunk("IHDR", ihdr); chunk("IDAT", idat); chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** REAL PNG pixel decode — pure JDK: validates the signature and
    * per-chunk CRC32s, walks IHDR/PLTE/IDAT/IEND, INFLATES the
    * concatenated IDAT zlib stream, reverses the per-row filter (all
    * five spec types), and folds the same exact integer statistics as
    * [[decodeBmpPixels]]. Supports bit depth 8, color types 0 (gray),
    * 2 (RGB), 3 (palette — expanded through PLTE to RGB), 4
    * (gray+alpha), 6 (RGBA), non-interlaced. None (quarantine) for
    * 16-bit, interlaced, CRC-corrupt, or truncated payloads. PNG rows
    * are stored top-down, so corners are direct. */
  def decodePngPixels(content: Array[Byte]): Option[BmpPixelStats] = {
    val b = content
    if (b.length < 8 || (0 until 8).exists(i => u8(b, i) != pngSig(i)))
      return None
    var i = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
    var interlace = 0
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd && i + 8 <= b.length) {
      val len = u32be(b, i).toInt
      if (len < 0 || i + 12 + len > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + len)
      if (crc.getValue != u32be(b, i + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = u32be(b, i + 8).toInt; h = u32be(b, i + 12).toInt
          bitDepth = u8(b, i + 16); colorType = u8(b, i + 17)
          interlace = u8(b, i + 20)
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => seenEnd = true
        case _ => // ancillary chunks skip
      }
      i += 12 + len
    }
    if (!seenEnd || w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0)
      return None
    val chIn = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && (plte == null || plte.length % 3 != 0)) return None
    // header-declared w/h are attacker-controlled even when CRCs pass:
    // size the buffer in Long and quarantine (None, not a task-killing
    // allocation) anything that overflows Int or exceeds a sane decode
    // cap — same contract decodeBmpPixels enforces via content length
    val rowLenL = w.toLong * chIn
    val expectL = h.toLong * (1L + rowLenL)
    val maxDecodeBytes = 1L << 28 // 256 MiB of raw pixels per image
    if (expectL <= 0 || expectL > maxDecodeBytes) return None
    val rowLen = rowLenL.toInt
    val expect = expectL.toInt
    val raw = new Array[Byte](expect)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(raw, got, expect - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got < expect) return None
    // reverse the per-row filters in place (recon overwrites raw)
    var y = 0
    while (y < h) {
      val f = u8(raw, y * (1 + rowLen))
      if (f > 4) return None
      val off = y * (1 + rowLen) + 1
      val prior = (y - 1) * (1 + rowLen) + 1
      var x = 0
      while (x < rowLen) {
        val a = if (x >= chIn) u8(raw, off + x - chIn) else 0
        val up = if (y > 0) u8(raw, prior + x) else 0
        val c = if (y > 0 && x >= chIn) u8(raw, prior + x - chIn) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 => paeth(a, up, c)
        }
        raw(off + x) = ((u8(raw, off + x) + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // palette expansion (type 3 → RGB) happens at the sample fold
    val chOut = if (colorType == 3) 3 else chIn
    def sample(yy: Int, xx: Int, cc: Int): Int = {
      val base = yy * (1 + rowLen) + 1
      if (colorType == 3) {
        val idx = u8(raw, base + xx)
        if (idx * 3 + cc >= plte.length) 0 else u8(plte, idx * 3 + cc)
      } else u8(raw, base + xx * chIn + cc)
    }
    val sums = new Array[Long](chOut)
    var mn = 255; var mx = 0
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var cc = 0
        while (cc < chOut) {
          val v = sample(y, x, cc)
          sums(cc) += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          cc += 1
        }
        x += 1
      }
      y += 1
    }
    Some(BmpPixelStats(w, h, chOut, w.toLong * h, sums, mn, mx,
      Array.tabulate(chOut)(sample(0, 0, _)),
      Array.tabulate(chOut)(sample(h - 1, w - 1, _))))
  }

  /** Per-row image pixel statistics over a (media_id, content) frame —
    * batched mapPartitions (the mapInPandas contract), REAL for
    * uncompressed BMPs and zlib-compressed PNGs, rows that don't
    * decode are dropped (the quarantine census is `decode`'s job).
    * Payload never shuffles. */
  def imagePixelStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          decodeBmpPixels(bytes).orElse(decodePngPixels(bytes))
            .map(s => (id, s))
        })
      }
      .select(col("_1").as("media_id"), col("_2.width").as("width"),
        col("_2.height").as("height"), col("_2.channels").as("channels"),
        col("_2.n_px").as("n_px"), col("_2.ch_sum").as("ch_sum"),
        col("_2.px_min").as("px_min"), col("_2.px_max").as("px_max"),
        col("_2.top_left").as("top_left"),
        col("_2.bottom_right").as("bottom_right"))
  }

  /** Difference-hash (dHash) of an uncompressed 8-bit BMP: box-average
    * the image onto a 9×8 grid (integer floor means — the image must
    * tile evenly: w % 9 == 0, h % 8 == 0, else quarantine None), set
    * bit c of row r when cell (r,c) is darker than its right neighbor,
    * and emit the 64 bits as 16 lowercase hex chars (two per row, no
    * signed-long bit-63 hazard). The standard perceptual near-dup
    * fingerprint for image dedup — all-integer, so any engine replays
    * it from the pixel values. */
  def dHashBmp(content: Array[Byte]): Option[String] = {
    val b = content
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = u32le(b, 10).toInt
    val w = u32le(b, 18).toInt
    val hRaw = u32le(b, 22).toInt
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = u16le(b, 28)
    val compression = u32le(b, 30)
    if (w <= 0 || h <= 0 || compression != 0L || bpp != 8) return None
    val stride = ((w + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
      return None
    if (w % 9 != 0 || h % 8 != 0) return None
    val cw = w / 9; val chh = h / 8
    val m = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        var s = 0L
        var dy = 0
        while (dy < chh) {
          val yy = r * chh + dy
          val fileRow = if (topDown) yy else h - 1 - yy
          var dx = 0
          while (dx < cw) {
            s += u8(b, dataOff + fileRow * stride + c * cw + dx)
            dx += 1
          }
          dy += 1
        }
        m(r)(c) = s / (cw.toLong * chh)
        c += 1
      }
      r += 1
    }
    val sb = new StringBuilder(16)
    r = 0
    while (r < 8) {
      var byte = 0
      var c = 0
      while (c < 8) {
        if (m(r)(c) < m(r)(c + 1)) byte |= 1 << c
        c += 1
      }
      sb.append(f"$byte%02x")
      r += 1
    }
    Some(sb.toString)
  }

  /** Per-row dHash over a (media_id, content) frame — the batched
    * mapPartitions shape of [[imagePixelStats]]; non-decodable or
    * non-tiling rows are quarantined (dropped). */
  def imageDHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          dHashBmp(bytes).map(hx => (id, hx))
        })
      }
      .select(col("_1").as("media_id"), col("_2").as("dhash"))
  }

  /** Per-row audio sample statistics — REAL for PCM WAVs, same batched
    * mapPartitions shape as [[imagePixelStats]]. */
  def audioSampleStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          decodeWavSamples(bytes).map(s => (id, s))
        })
      }
      .select(col("_1").as("media_id"), col("_2.channels").as("channels"),
        col("_2.bits").as("bits"), col("_2.n_samples").as("n_samples"),
        col("_2.s_sum").as("s_sum"), col("_2.sq_sum").as("sq_sum"),
        col("_2.s_min").as("s_min"), col("_2.s_max").as("s_max"),
        col("_2.n_zero_cross").as("n_zero_cross"))
  }

  /** STUB feature extraction: a real model would embed the media; the
    * fake emits a deterministic dim-sized float vector from a rolling
    * hash of the bytes — shape-compatible with Similarity ops. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < m.content.length) {
          h = 31 * h + m.content(i)
          v(i % dim) += (h % 1000) / 1000.0f
          i += 1
        }
        FeatureRow(m.media_id, v)
      }
    }
  }
}
