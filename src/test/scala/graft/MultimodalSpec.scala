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

  // --- real payload decode (BMP pixels, WAV samples) ---

  test("decodeBmpPixels: 8-bit greyscale round-trip excludes stride pads " +
    "and reads bottom-up rows into logical order") {
    val px = Array.tabulate(39)(i => i.toByte) // 13x3, values 0..38
    val stats = Multimodal.decodeBmpPixels(
      Multimodal.bmpGray8Bytes(px, 13, 3)).get
    assert(stats.width == 13 && stats.height == 3 && stats.channels == 1)
    assert(stats.n_px == 39L)
    // 0xEE pad bytes would push the sum up by 3*3*238 and max to 238
    assert(stats.ch_sum.toSeq == Seq((0 until 39).sum.toLong))
    assert(stats.px_min == 0 && stats.px_max == 38)
    // logical top-left is pixel 0, bottom-right is pixel 38 — a reader
    // that forgets bottom-up storage returns 26 and 12 here
    assert(stats.top_left.toSeq == Seq(0) &&
      stats.bottom_right.toSeq == Seq(38))
  }

  /** Hand-rolled 24-bpp BMP: 2x2, rows stored TOP-DOWN (negative
    * height), stride 8 (2 pad bytes/row), pixels in B,G,R file order:
    * logical (0,0)=(1,2,3) (0,1)=(4,5,6) (1,0)=(7,8,9) (1,1)=(10,11,12). */
  private def bmp24TopDown: Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    "BM".getBytes("ASCII") ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(-2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      Array.fill[Byte](20)(0) ++
      Array[Byte](1, 2, 3, 4, 5, 6, -1, -1) ++ // top row + 0xFF pads
      Array[Byte](7, 8, 9, 10, 11, 12, -1, -1)
  }

  test("decodeBmpPixels: 24-bpp top-down rows keep file B,G,R channel " +
    "order and per-channel sums") {
    val s = Multimodal.decodeBmpPixels(bmp24TopDown).get
    assert(s.width == 2 && s.height == 2 && s.channels == 3)
    assert(s.ch_sum.toSeq == Seq(1L + 4 + 7 + 10, 2L + 5 + 8 + 11,
      3L + 6 + 9 + 12))
    assert(s.px_min == 1 && s.px_max == 12) // 0xFF pads excluded
    assert(s.top_left.toSeq == Seq(1, 2, 3) &&
      s.bottom_right.toSeq == Seq(10, 11, 12))
    // compressed or truncated payloads quarantine as None, never throw
    val rle = bmp24TopDown.clone(); rle(30) = 1 // biCompression = RLE
    assert(Multimodal.decodeBmpPixels(rle).isEmpty)
    assert(Multimodal.decodeBmpPixels(bmp24TopDown.take(60)).isEmpty)
  }

  test("decodeWavSamples: 16-bit LE samples fold exactly, zero-crossings " +
    "skip exact zeros, 8-bit recentres by -128") {
    val samples = Array[Short](1000, -2000, 3000, 0, -1)
    val s = Multimodal.decodeWavSamples(
      Multimodal.wavPcm16Bytes(samples)).get
    assert(s.channels == 1 && s.bits == 16 && s.n_samples == 5L)
    assert(s.s_sum == 1999L && s.s_min == -2000 && s.s_max == 3000)
    assert(s.sq_sum == 1000L * 1000 + 2000L * 2000 + 3000L * 3000 + 1)
    assert(s.n_zero_cross == 3L) // +→−, −→+, +→− (the 0 is skipped)
    // 8-bit unsigned face: header hand-patched to bits=8, data re-laid
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    val wav8 = "RIFF".getBytes("ASCII") ++ le32(40) ++
      "WAVE".getBytes("ASCII") ++ "fmt ".getBytes("ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++
      le16(8) ++ "data".getBytes("ASCII") ++ le32(3) ++
      Array[Byte](0, 128.toByte, 255.toByte) // → −128, 0, 127
    val t = Multimodal.decodeWavSamples(wav8).get
    assert(t.bits == 8 && t.n_samples == 3L && t.s_sum == -1L)
    assert(t.s_min == -128 && t.s_max == 127 && t.n_zero_cross == 1L)
    // non-PCM (fmt tag 3 = float) quarantines as None
    val f32 = Multimodal.wavPcm16Bytes(samples)
    f32(20) = 3
    assert(Multimodal.decodeWavSamples(f32).isEmpty)
  }

  test("imagePixelStats / audioSampleStats run batched and drop " +
    "non-decodable rows") {
    val rows = Seq(
      (1L, Multimodal.bmpGray8Bytes(Array.tabulate(6)(_.toByte), 3, 2)),
      (2L, Multimodal.wavPcm16Bytes(Array[Short](5, -5))),
      (3L, Array.fill[Byte](64)(9))).toDF("media_id", "content")
    val img = Multimodal.imagePixelStats(rows, batchSize = 2)
      .select("media_id").as[Long].collect().toSeq
    val aud = Multimodal.audioSampleStats(rows, batchSize = 2)
      .select("media_id").as[Long].collect().toSeq
    assert(img == Seq(1L) && aud == Seq(2L))
  }

  test("dHashBmp: gradients set/clear all bits, non-tiling quarantines") {
    // 18x8, pixel = 10*x: every cell mean increases left-to-right
    val inc = Array.tabulate(8 * 18)(i => (10 * (i % 18)).toByte)
    val hInc = Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(inc, 18, 8))
    assert(hInc === Some("ffffffffffffffff"))
    val dec = Array.tabulate(8 * 18)(i => (10 * (17 - i % 18)).toByte)
    val hDec = Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(dec, 18, 8))
    assert(hDec === Some("0000000000000000"))
    // 13x3 decodes as a BMP but does not tile the 9x8 grid
    val odd = Array.tabulate(39)(_.toByte)
    assert(Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(odd, 13, 3)).isEmpty)
  }

  test("dHashBmp floor-averages cells: a single bright pixel can't flip") {
    // cells are 2x1; cell value is (a+b) div 2 -- check a hand pair
    val px = Array.fill(8 * 18)(0.toByte)
    px(0) = 5; px(1) = 4 // cell(7,0) after bottom-up logical mapping? no:
    // bmpGray8Bytes takes LOGICAL row-major pixels; row 0 = top
    // cell(0,0) mean = (5+4) div 2 = 4; cell(0,1) = 0 -> bit0 of row0 = 0
    val h = Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(px, 18, 8)).get
    assert(h === "0000000000000000")
    px(2) = 9 // cell(0,1) mean 4 -> equal, still not less
    val h2 = Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(px, 18, 8)).get
    assert(h2 === "0000000000000000")
    px(2) = 11 // cell(0,1) mean 5 > cell(0,0) 4 -> bit set
    val h3 = Multimodal.dHashBmp(Multimodal.bmpGray8Bytes(px, 18, 8)).get
    assert(h3 === "0100000000000000")
  }

  // ---- real PNG codec (zlib + the five spec filters, pure JDK) ----

  private def gradient(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  test("decodePngPixels: grayscale round-trip through all five filters " +
      "matches the BMP decode of the same pixels") {
    // 7 rows -> the encoder's row%5 cycle hits None/Sub/Up/Average/Paeth
    val px = gradient(9 * 7)
    val png = Multimodal.decodePngPixels(Multimodal.pngBytes(px, 9, 7)).get
    val bmp = Multimodal.decodeBmpPixels(Multimodal.bmpGray8Bytes(px, 9, 7)).get
    assert(png.width == 9 && png.height == 7 && png.channels == 1)
    assert(png.ch_sum.toSeq == bmp.ch_sum.toSeq)
    assert(png.px_min == bmp.px_min && png.px_max == bmp.px_max)
    assert(png.top_left.toSeq == Seq(px(0) & 0xff))
    assert(png.bottom_right.toSeq == Seq(px(62) & 0xff))
  }

  test("decodePngPixels: RGB and RGBA channel sums are exact and in " +
      "sample order") {
    val px = gradient(4 * 6 * 3)
    val s = Multimodal.decodePngPixels(Multimodal.pngBytes(px, 4, 6, 3)).get
    assert(s.channels == 3 && s.n_px == 24)
    val expect = Array.tabulate(3)(c =>
      (0 until 24).map(i => px(i * 3 + c) & 0xff).map(_.toLong).sum)
    assert(s.ch_sum.toSeq == expect.toSeq)
    val px4 = gradient(5 * 5 * 4)
    val s4 = Multimodal.decodePngPixels(Multimodal.pngBytes(px4, 5, 5, 4)).get
    assert(s4.channels == 4)
    assert(s4.top_left.toSeq == (0 until 4).map(px4(_) & 0xff))
  }

  test("decodePngPixels: CRC corruption, truncation, and unsupported " +
      "shapes quarantine as None") {
    val good = Multimodal.pngBytes(gradient(8 * 5), 8, 5)
    assert(Multimodal.decodePngPixels(good).isDefined)
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x01).toByte // inside IDAT payload
    assert(Multimodal.decodePngPixels(flipped).isEmpty, "CRC must catch a flip")
    assert(Multimodal.decodePngPixels(good.take(good.length - 20)).isEmpty)
    val sixteenBit = good.clone()
    sixteenBit(24) = 16 // IHDR bit depth (offset 8 sig + 8 hdr + 8 w/h)
    assert(Multimodal.decodePngPixels(sixteenBit).isEmpty,
      "16-bit must quarantine (CRC also breaks, either guard is fine)")
  }

  test("decodePngPixels: palette (color type 3) expands through PLTE " +
      "to RGB") {
    // hand-assemble a 3x2 palette PNG: indices 0..5, palette maps
    // i -> (10i, 20i, 30i)
    def p32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      p32(data.length.toLong) ++ tb ++ data ++ p32(crc.getValue)
    }
    val ihdr = p32(3L) ++ p32(2L) ++ Array[Byte](8, 3, 0, 0, 0)
    val plte = (0 until 6).flatMap(i =>
      Seq((10 * i).toByte, (20 * i).toByte, (30 * i).toByte)).toArray
    val raw = Array[Byte](0, 0, 1, 2, 0, 3, 4, 5) // 2 rows, filter 0
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    val png = Array[Byte](137.toByte, 80, 78, 71, 13, 10, 26, 10) ++
      chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++
      chunk("IDAT", bos.toByteArray) ++ chunk("IEND", Array.empty)
    val s = Multimodal.decodePngPixels(png).get
    assert(s.channels == 3 && s.n_px == 6)
    // sums over indices 0..5: sum(10i)=150, sum(20i)=300, sum(30i)=450
    assert(s.ch_sum.toSeq == Seq(150L, 300L, 450L))
    assert(s.top_left.toSeq == Seq(0, 0, 0))
    assert(s.bottom_right.toSeq == Seq(50, 100, 150))
  }

  test("imagePixelStats decodes mixed BMP and PNG media in one pass") {
    val px = gradient(9 * 7)
    val mixed = Seq(
      (1L, Multimodal.bmpGray8Bytes(px, 9, 7)),
      (2L, Multimodal.pngBytes(px, 9, 7)),
      (3L, Array[Byte](1, 2, 3)) // neither: quarantined
    ).toDF("media_id", "content")
    val out = Multimodal.imagePixelStats(mixed).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("ch_sum").toSeq).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == out(2L))
  }

  // ----- JPEG baseline decode (r13) -----

  test("decodeJpegPixels: flat-tile gray JPEG round-trips EXACTLY " +
       "through real Huffman/bit-packing/IDCT (q318's construction)") {
    val tiles = Array(0, 17, 128, 255, 64, 200, 3, 99, 254, 1, 77, 180)
    val bytes = Multimodal.jpegGray8Bytes(tiles, tilesW = 4, tilesH = 3)
    val p = Multimodal.decodeJpegPixels(bytes).get
    assert(p.width == 32 && p.height == 24 && p.channels == 1)
    // every pixel of tile t equals tiles(t), bit-for-bit
    var y = 0
    while (y < 24) {
      var x = 0
      while (x < 32) {
        val want = tiles((y / 8) * 4 + x / 8)
        val got = p.pixels(y * 32 + x) & 0xff
        assert(got == want, s"pixel ($x,$y): got $got want $want")
        x += 1
      }
      y += 1
    }
    // 0xFF entropy bytes get stuffed: value 255 tiles force them
    val allBright = Multimodal.jpegGray8Bytes(Array.fill(8)(255), 8, 1)
    val pb = Multimodal.decodeJpegPixels(allBright).get
    assert(pb.pixels.forall(b => (b & 0xff) == 255))
  }

  test("decodeJpegPixels: restart markers reset the DC predictor and " +
       "byte-align exactly as encoded") {
    val tiles = Array.tabulate(24)(i => (i * 37 + 5) % 256)
    for (ri <- Seq(1, 2, 5, 7)) {
      val bytes = Multimodal.jpegGray8Bytes(tiles, 24, 1, restartInterval = ri)
      val p = Multimodal.decodeJpegPixels(bytes).get
      assert(p.width == 192 && p.height == 8)
      tiles.zipWithIndex.foreach { case (t, i) =>
        assert((p.pixels(i * 8) & 0xff) == t,
          s"restartInterval=$ri tile $i: ${p.pixels(i * 8) & 0xff} != $t")
      }
    }
  }

  test("decodeJpegPixels matches the JDK's own libjpeg decode within " +
       "IDCT rounding on a grayscale ImageIO encoding") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rng = new scala.util.Random(11)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0,
        (128 + 90 * math.sin(x / 3.0) + 30 * math.cos(y / 2.0) +
          rng.nextInt(21) - 10).toInt.max(0).min(255))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val mine = Multimodal.decodeJpegPixels(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      val m = mine.pixels(y * w + x) & 0xff
      worst = math.max(worst, math.abs(r - m))
    }
    // both sides decode the SAME coefficients; the only freedom is the
    // IDCT implementation (libjpeg fixed-point vs double) — spec says
    // conforming decoders stay within ±1 of the reference per sample
    assert(worst <= 2, s"gray decode diverged from libjpeg by $worst")
  }

  test("decodeJpegPixels: flat-chroma COLOR ImageIO encoding decodes " +
       "to the right RGB everywhere (4:2:0 upsampling is moot on " +
       "constant chroma)") {
    val w = 32; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(180, 90, 40))
    g2.fillRect(0, 0, w, h)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val mine = Multimodal.decodeJpegPixels(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val r = c match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      val m = mine.pixels((y * w + x) * 3 + c) & 0xff
      worst = math.max(worst, math.abs(r - m))
    }
    assert(worst <= 2, s"flat-color decode diverged from libjpeg by $worst")
  }

  test("decodeJpegPixels quarantines progressive, truncated, and " +
       "hostile-header payloads") {
    // progressive: re-encode via ImageIO? the writer is baseline-only,
    // so hand-flip the SOF marker of a real baseline file to SOF2
    val bytes = Multimodal.jpegGray8Bytes(Array(100, 150), 2, 1)
    val prog = bytes.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpegPixels(prog).isEmpty, "SOF2 must quarantine")
    assert(Multimodal.decodeJpegPixels(bytes.take(bytes.length / 2)).isEmpty,
      "truncated entropy data must quarantine")
    assert(Multimodal.decodeJpegPixels(Array[Byte](1, 2, 3)).isEmpty)
    // hostile dimensions: SOF claims 30000x30000 -> allocation cap, None
    val big = bytes.clone()
    big(sofAt + 5) = 0x75.toByte; big(sofAt + 6) = 0x30.toByte // h=30000
    big(sofAt + 7) = 0x75.toByte; big(sofAt + 8) = 0x30.toByte // w=30000
    assert(Multimodal.decodeJpegPixels(big).isEmpty,
      "oversized header must quarantine before allocating")
  }

  test("imagePixelStats decodes JPEG alongside BMP and PNG in one pass") {
    val px = gradient(9 * 7)
    val tiles = Array(10, 250, 33, 47)
    val media = Seq(
      (1L, Multimodal.bmpGray8Bytes(px, 9, 7)),
      (2L, Multimodal.jpegGray8Bytes(tiles, 2, 2))
    ).toDF("media_id", "content")
    val out = Multimodal.imagePixelStats(media).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("ch_sum").head).toMap
    assert(out(2L) == tiles.map(_.toLong * 64).sum)
  }

  // ----- GIF LZW decode (r13) -----

  test("decodeGifPixelStats: grayscale GIF round-trips exactly, " +
       "interlaced and not") {
    val px = gradient(16 * 12)
    for (inter <- Seq(false, true)) {
      val bytes = Multimodal.gifGray8Bytes(px, 16, 12, interlaced = inter)
      val s = Multimodal.decodeGifPixelStats(bytes).get
      assert(s.width == 16 && s.height == 12 && s.channels == 3)
      val want = px.map(v => (v & 0xff).toLong).sum
      assert(s.ch_sum.toSeq == Seq(want, want, want),
        s"interlaced=$inter channel sums diverged")
      assert(s.top_left.toSeq == Seq.fill(3)(px(0) & 0xff))
      assert(s.bottom_right.toSeq == Seq.fill(3)(px(16 * 12 - 1) & 0xff))
    }
  }

  test("decodeGifPixelStats matches the JDK's own GIF codec on a " +
       "repetitive image (real dictionary growth, no early clears)") {
    // repetitive blocks make the JDK writer's LZW build long composite
    // entries and grow the code width past 9 bits — the paths my
    // clear-every-128 encoder never exercises
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((x / 8) * 16 + (y / 8) * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val bytes = bos.toByteArray
    val mine = Multimodal.decodeGifPixelStats(bytes).get
    assert(mine.width == w && mine.height == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += (ref.getRGB(x, y) & 0xff)
    // GIF is lossless: my blue-channel sum must equal the JDK's exactly
    assert(mine.ch_sum(2) == sum,
      s"LZW decode diverged from the JDK codec: ${mine.ch_sum(2)} vs $sum")
  }

  test("decodeGifPixelStats quarantines truncated and hostile payloads") {
    val px = gradient(8 * 8)
    val bytes = Multimodal.gifGray8Bytes(px, 8, 8)
    assert(Multimodal.decodeGifPixelStats(
      bytes.take(bytes.length / 2)).isEmpty, "truncated must quarantine")
    assert(Multimodal.decodeGifPixelStats(Array[Byte](1, 2, 3)).isEmpty)
    // hostile dimensions: claim 30000x30000 in both descriptors
    val big = bytes.clone()
    def put16(at: Int, v: Int): Unit = {
      big(at) = (v & 0xff).toByte; big(at + 1) = ((v >> 8) & 0xff).toByte
    }
    put16(6, 30000); put16(8, 30000)       // logical screen
    val imgAt = 13 + 768                    // after header + GCT
    put16(imgAt + 5, 30000); put16(imgAt + 7, 30000)
    assert(Multimodal.decodeGifPixelStats(big).isEmpty,
      "oversized header must quarantine before allocating")
  }

  test("imagePixelStats decodes all four real containers in one pass") {
    val px = gradient(9 * 7)
    val tiles = Array(10, 250, 33, 47)
    val media = Seq(
      (1L, Multimodal.bmpGray8Bytes(px, 9, 7)),
      (2L, Multimodal.pngBytes(px, 9, 7)),
      (3L, Multimodal.jpegGray8Bytes(tiles, 2, 2)),
      (4L, Multimodal.gifGray8Bytes(px, 9, 7))
    ).toDF("media_id", "content")
    val out = Multimodal.imagePixelStats(media).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("ch_sum").head).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == out(2L) && out(1L) == out(4L))
    assert(out(3L) == tiles.map(_.toLong * 64).sum)
  }

  test("decodeJpegPixels: varying-chroma color ImageIO encoding stays " +
       "close to libjpeg (box vs triangle upsample differs only at " +
       "chroma edges)") {
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / (w - 1)) & 0xff
      val g = (y * 255 / (h - 1)) & 0xff
      val b = ((x + y) * 255 / (w + h - 2)) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val mine = Multimodal.decodeJpegPixels(bytes).get
    assert(mine.width == w && mine.height == h && mine.channels == 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L; var n = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val r = c match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      sumDiff += math.abs(r - (mine.pixels((y * w + x) * 3 + c) & 0xff))
      n += 1
    }
    val mean = sumDiff.toDouble / n
    // a channel swap or broken upsample reads ~40+ mean; upsample
    // filter choice alone stays in low single digits on a gradient
    assert(mean <= 6.0, f"mean |diff| vs libjpeg too high: $mean%.2f")
  }

  test("decodeGifPixelStats: local color table and a small LZW code " +
       "size decode (hand-built 4-color GIF)") {
    // 2x2 image, indices 0..3, 4-entry LCT, minCode=2
    val bos = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    def b16(v: Int): Unit = { b(v); b(v >> 8) }
    "GIF89a".foreach(c => b(c))
    b16(2); b16(2); b(0x00); b(0); b(0) // no GCT
    // image descriptor, packed 0x81: LCT flag + size bits 1 → 4 entries
    b(0x2c); b16(0); b16(0); b16(2); b16(2); b(0x81)
    val pal = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220))
    pal.foreach { case (r, g, bl) => b(r); b(g); b(bl) }
    b(2) // LZW min code size
    // codes (3-bit): clear=4, eoi=5; literals 0,1,2,3
    var acc = 0L; var nbits = 0
    val body = new java.io.ByteArrayOutputStream()
    def put(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits; nbits += width
      while (nbits >= 8) { body.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    put(4, 3) // clear
    put(0, 3); put(1, 3); put(2, 3) // dict grows: 6,7 -> width stays 3 until next==8
    put(3, 4) // after adding entry 7, width grew to 4
    put(5, 4) // EOI
    if (nbits > 0) body.write((acc & 0xff).toInt)
    val data = body.toByteArray
    b(data.length); data.foreach(d => b(d))
    b(0); b(0x3b)
    val s = Multimodal.decodeGifPixelStats(bos.toByteArray).get
    assert(s.width == 2 && s.height == 2 && s.channels == 3)
    assert(s.ch_sum.toSeq == Seq(10L + 40 + 70 + 200, 20L + 50 + 80 + 210,
      30L + 60 + 90 + 220))
    assert(s.top_left.toSeq == Seq(10, 20, 30))
    assert(s.bottom_right.toSeq == Seq(200, 210, 220))
  }

  test("dHashImage: the same pixels hash identically through BMP, " +
       "PNG, GIF, and flat-tile JPEG containers (cross-format dedup)") {
    val px = gradient(18 * 8)
    val viaBmp = Multimodal.dHashImage(Multimodal.bmpGray8Bytes(px, 18, 8))
    val viaPng = Multimodal.dHashImage(Multimodal.pngBytes(px, 18, 8))
    val viaGif = Multimodal.dHashImage(Multimodal.gifGray8Bytes(px, 18, 8))
    val viaGifI = Multimodal.dHashImage(
      Multimodal.gifGray8Bytes(px, 18, 8, interlaced = true))
    assert(viaBmp.isDefined && viaBmp == viaPng && viaBmp == viaGif &&
      viaBmp == viaGifI,
      s"cross-container dhash diverged: $viaBmp $viaPng $viaGif $viaGifI")
    // JPEG: 72x8 of flat 8x8 tiles (the exact-decode construction);
    // the BMP of the SAME expanded pixels must hash equal
    val tiles = Array(5, 250, 60, 200, 10, 180, 90, 30, 140)
    val expanded = new Array[Byte](72 * 8)
    for (y <- 0 until 8; x <- 0 until 72)
      expanded(y * 72 + x) = tiles(x / 8).toByte
    val viaJpeg = Multimodal.dHashImage(
      Multimodal.jpegGray8Bytes(tiles, 9, 1))
    val viaBmp72 = Multimodal.dHashImage(
      Multimodal.bmpGray8Bytes(expanded, 72, 8))
    assert(viaJpeg.isDefined && viaJpeg == viaBmp72,
      s"JPEG flat-tile dhash diverged: $viaJpeg vs $viaBmp72")
    // a flat image hashes all-zero (no cell darker than its neighbor),
    // through the palette->RGB->luma path
    val flat = Multimodal.dHashImage(
      Multimodal.gifGray8Bytes(Array.fill(9 * 8)(77.toByte), 9, 8))
    assert(flat.contains("00" * 8), s"flat image must hash all-zero: $flat")
    // non-tiling quarantines through every path
    assert(Multimodal.dHashImage(
      Multimodal.gifGray8Bytes(Array.fill(10 * 8)(1.toByte), 10, 8)).isEmpty)
  }

  test("decodeJpegPixels: a single-component frame with declared 2x2 " +
       "sampling decodes non-interleaved (T.81 A.2, r13 ADVICE)") {
    // 4x2 tiles of DISTINCT grays: with the pre-fix interleaved-MCU
    // reading (mcus 2x1, each 2x2 blocks) the block order would be
    // (0,0)(0,1)(1,0)(1,1)... vs the correct raster (0,0)(0,1)(0,2)
    // (0,3)(1,0)... — dims are multiples of 16, so the broken decode
    // SUCCEEDS with misplaced blocks instead of failing
    val tiles = Array(10, 60, 110, 160, 210, 240, 30, 90)
    val declared = Multimodal.jpegGray8Bytes(tiles, 4, 2, samplingHV = 0x22)
    val plain = Multimodal.jpegGray8Bytes(tiles, 4, 2)
    val dDecl = Multimodal.decodeJpegPixels(declared)
    val dPlain = Multimodal.decodeJpegPixels(plain)
    assert(dDecl.isDefined && dPlain.isDefined)
    assert(dDecl.get.pixels.toSeq == dPlain.get.pixels.toSeq &&
      dDecl.get.width == 32 && dDecl.get.height == 16,
      "declared 2x2 factors on a one-component scan must be ignored")
    // and the pixels are the raster-order tile expansion, not the
    // MCU-interleaved one
    val exp = new Array[Byte](32 * 16)
    for (y <- 0 until 16; x <- 0 until 32)
      exp(y * 32 + x) = tiles((y / 8) * 4 + x / 8).toByte
    assert(dDecl.get.pixels.toSeq == exp.toSeq,
      "single-component scan decoded with misplaced blocks")
  }

  test("dHashBmp: 24/32-bpp color BMPs hash via B,G,R-order BT.601 " +
       "luma, equal to the same RGB pixels through PNG (r13 ADVICE)") {
    val w = 18; val h = 8
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3
      (i % 3 match {
        case 0 => (px * 7) % 256
        case 1 => (px * 13 + 40) % 256
        case _ => (px * 29 + 90) % 256
      }).toByte
    }
    val viaBmp24 = Multimodal.dHashImage(Multimodal.bmpRgbBytes(rgb, w, h))
    val viaPng = Multimodal.dHashImage(Multimodal.pngBytes(rgb, w, h, 3))
    assert(viaBmp24.isDefined && viaBmp24 == viaPng,
      s"color BMP dhash diverged from PNG of the same pixels: " +
        s"$viaBmp24 vs $viaPng")
    // 32 bpp: alpha rides along in the file and is ignored by the luma
    val rgba = Array.tabulate(w * h * 4) { i =>
      if (i % 4 == 3) 0x55.toByte else rgb((i / 4) * 3 + i % 4)
    }
    val viaBmp32 = Multimodal.dHashImage(
      Multimodal.bmpRgbBytes(rgba, w, h, channels = 4))
    assert(viaBmp32 == viaPng, "32-bpp BMP dhash must ignore alpha")
    // the dHashBmp face itself (not just the Any-chain) handles color
    assert(Multimodal.dHashBmp(Multimodal.bmpRgbBytes(rgb, w, h)) == viaPng)
  }

  test("decodePngPixelsRaw: a hostile palette PNG whose MATERIALIZED " +
       "output exceeds the decode cap quarantines before allocating " +
       "(r13 ADVICE)") {
    // valid-by-CRC palette PNG, one row of 2^26 zero indices: the
    // inflated filter buffer is ~64 MiB (under the old raw-only cap)
    // but palette expansion materializes w*h*3 = 192 MiB — combined
    // 256 MiB + 1 byte, one over the 1<<28 budget, so the decode must
    // return None BEFORE touching the IDAT stream
    val w = 1 << 26; val h = 1
    def p32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      p32(data.length.toLong) ++ tb ++ data ++ p32(crc.getValue)
    }
    val ihdr = p32(w.toLong) ++ p32(h.toLong) ++ Array[Byte](8, 3, 0, 0, 0)
    val plte = Array.fill[Byte](3)(0)
    val png = Array[Byte](137.toByte, 80, 78, 71, 13, 10, 26, 10) ++
      chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++
      chunk("IDAT", Array.empty) ++ chunk("IEND", Array.empty)
    val t0 = System.nanoTime()
    assert(Multimodal.decodePngPixelsRaw(png).isEmpty)
    assert(Multimodal.decodePngPixels(png).isEmpty)
    // pre-allocation quarantine is cheap — a decode that inflated or
    // materialized would burn hundreds of MiB and visible wall time
    assert((System.nanoTime() - t0) < 2e9, "hostile-header path too slow")
  }
}
