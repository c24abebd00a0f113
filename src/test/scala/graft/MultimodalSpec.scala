package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, Array.fill[Byte](1000)(7)),
    (2L, Array.fill[Byte](100)(3)),
    (3L, Array[Byte](1)) // tiny: still one frame
  ).toDF("media_id", "content")

  test("decode attaches deterministic metadata in batches") {
    val d = Multimodal.decode(media, batchSize = 2).collect()
      .map(m => m.media_id -> m.meta).toMap
    assert(d(1L).n_bytes == 1000 && d(1L).width == (1000 % 640) + 1)
    assert(d(1L).height == ((1000 * 7) % 480) + 1 && d(1L).channels == 3)
    assert(d(3L).n_bytes == 1)
  }

  test("resize rewrites content to the target byte budget and metadata") {
    val r = Multimodal.resize(Multimodal.decode(media), 8, 4).collect()
    r.foreach { m =>
      assert(m.meta.width == 8 && m.meta.height == 4)
      assert(m.content.length == 8 * 4 * 3)
    }
  }

  test("frameSample explodes every nth frame, at least one per item") {
    val f = Multimodal.frameSample(Multimodal.decode(media), everyN = 2)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(f(1L) == 2) // 1000/256 = 3 frames -> sampled 0,2
    assert(f(2L) == 1) // 100 bytes -> 1 frame
    assert(f(3L) == 1)
  }

  test("extractFeatures emits fixed-dim deterministic vectors") {
    val a = Multimodal.extractFeatures(Multimodal.decode(media), dim = 8)
      .filter($"media_id" === 1L).head().features.toSeq
    val b = Multimodal.extractFeatures(Multimodal.decode(media), dim = 8)
      .filter($"media_id" === 1L).head().features.toSeq
    assert(a == b && a.length == 8 && a.exists(_ != 0f))
  }

  // --- real container headers (decodeHeader is the production default) ---

  /** A structurally real PNG prefix: 8-byte signature + IHDR chunk for a
    * 256x128 RGBA image (pixel data absent — the parser only reads the
    * header, as it must at 100 TB). */
  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I', 'H', 'D', 'R',
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, colorType, 0, 0, 0)
    (sig ++ ihdr).map(_.toByte)
  }

  /** A structurally real JPEG prefix: SOI, an APP0 segment the scanner
    * must skip, then SOF0 with 8-bit precision, height, width, 3
    * components. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    val app0 = Array(0xff, 0xe0, 0, 16, 'J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array(0xff, 0xc0, 0, 17, 8,
      h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    (soi ++ app0 ++ sof0 :+ 0xff :+ 0xd9).map(_.toByte)
  }

  test("decodeHeader parses real PNG/JPEG/GIF headers and falls back to " +
    "the stub on unrecognized or truncated payloads") {
    val png = Multimodal.decodeHeader(pngBytes(256, 128, colorType = 6))
    assert(png.format == "png" && png.width == 256 && png.height == 128 &&
      png.channels == 4)
    assert(Multimodal.decodeHeader(pngBytes(31, 7, colorType = 0)).channels == 1)
    val jpg = Multimodal.decodeHeader(jpegBytes(640, 480))
    assert(jpg.format == "jpeg" && jpg.width == 640 && jpg.height == 480 &&
      jpg.channels == 3)
    val gif = Multimodal.decodeHeader(
      ("GIF89a".getBytes("ASCII") ++ Array(0x34, 0x02, 0x58, 0x01, 0, 0)
        .map(_.toByte)))
    assert(gif.format == "gif" && gif.width == 0x0234 && gif.height == 0x0158)
    // unrecognized bytes and truncated containers keep stub semantics
    val junk = Array.fill[Byte](100)(3)
    assert(Multimodal.decodeHeader(junk) == Multimodal.decodeStub(junk))
    val cutPng = pngBytes(256, 128, 6).take(20)
    assert(Multimodal.decodeHeader(cutPng) == Multimodal.decodeStub(cutPng))
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(Multimodal.decodeHeader(noSof) == Multimodal.decodeStub(noSof))
  }

  /** A structurally real BMP prefix: "BM", file header, and the
    * BITMAPINFOHEADER fields the parser reads (LE width/height/bpp). */
  private def bmpBytes(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    def le32(i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >>> 8) & 0xff).toByte
      b(i + 2) = ((v >>> 16) & 0xff).toByte; b(i + 3) = (v >>> 24).toByte
    }
    le32(18, w); le32(22, h)
    b(28) = (bpp & 0xff).toByte; b(29) = ((bpp >>> 8) & 0xff).toByte
    b
  }

  /** A structurally real WAV prefix: RIFF/WAVE with a junk chunk the
    * scanner must skip, then the canonical 16-byte fmt chunk. */
  private def wavBytes(rate: Int, channels: Int, bits: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    "RIFF".getBytes("ASCII") ++ le32(100) ++ "WAVE".getBytes("ASCII") ++
      "LIST".getBytes("ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++
      "fmt ".getBytes("ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits)
  }

  test("decodeHeader parses BMP and WAV containers (audio maps sample " +
    "rate/bits onto the width/height slots)") {
    val bmp = Multimodal.decodeHeader(bmpBytes(800, -600, 24))
    assert(bmp.format == "bmp" && bmp.width == 800 && bmp.height == 600 &&
      bmp.channels == 3)
    val wav = Multimodal.decodeHeader(wavBytes(44100, 2, 16))
    assert(wav.format == "wav" && wav.width == 44100 && wav.height == 16 &&
      wav.channels == 2)
    // truncated WAV (fmt chunk cut) and non-byte-aligned BMP fall back
    val cutWav = wavBytes(44100, 2, 16).take(30)
    assert(Multimodal.decodeHeader(cutWav) == Multimodal.decodeStub(cutWav))
    val oddBmp = bmpBytes(10, 10, 1)
    assert(Multimodal.decodeHeader(oddBmp) == Multimodal.decodeStub(oddBmp))
  }

  test("decode runs the real header parser distributed; synthetic corpora " +
    "keep stub metadata (q32 face unchanged)") {
    val mixed = Seq(
      (10L, pngBytes(64, 32, 2)),
      (11L, jpegBytes(20, 10)),
      (12L, Array.fill[Byte](500)(9))).toDF("media_id", "content")
    val d = Multimodal.decode(mixed, batchSize = 2).collect()
      .map(m => m.media_id -> m.meta).toMap
    assert(d(10L).format == "png" && d(10L).width == 64 &&
      d(10L).channels == 3)
    assert(d(11L).format == "jpeg" && d(11L).height == 10)
    assert(d(12L).format == "fake" && d(12L).width == (500 % 640) + 1)
  }
}
