package graft

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.operators.JpegCodec
import graft.operators.Multimodal.SynthJpeg
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the pure-JVM baseline JPEG codec. Three layers:
  *
  *  1. EXACTNESS on the oracle corpus: [[SynthJpeg]]'s block law must
  *     survive the lossy round trip bit-for-bit (DC-only blocks, DC
  *     quant step 8) — the same property q104's DuckDB oracle gates
  *     end to end, pinned here without a cluster.
  *  2. INTEROP with `javax.imageio` (the JDK's independent JPEG
  *     implementation): our encoder's bytes must decode to the same
  *     image under BOTH decoders, and our decoder must agree with
  *     ImageIO on ImageIO-ENCODED files — quantization and Huffman
  *     tables we did not write. Spec-compliant IDCTs may differ by a
  *     couple of code values, so these compare within a tolerance.
  *  3. LOUD failure on corruption: truncation (baseline and
  *     progressive), corrupted restart sequence, missing SOI.
  */
class JpegCodecSpec extends AnyFunSuite {

  // ---- 1. oracle-law exactness ------------------------------------

  test("synth law round-trips exactly, including restart-marker docs") {
    // ids cover: restart on/off (mod 3), many dim classes (mod 41/37)
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 40L, 41L, 123L, 1000L, 9999L)) {
      val img = JpegCodec.decode(SynthJpeg.bytes(id))
      assert(img.width == SynthJpeg.width(id) &&
        img.height == SynthJpeg.height(id), s"dims for doc $id")
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val i = y * img.width + x
          assert(img.y(i) == SynthJpeg.lumaBlock(id, x / 8, y / 8),
            s"luma at ($x,$y) doc $id")
          assert(img.cb(i) == SynthJpeg.cbMcu(id, x / 16, y / 16),
            s"cb at ($x,$y) doc $id")
          assert(img.cr(i) == SynthJpeg.crMcu(id, x / 16, y / 16),
            s"cr at ($x,$y) doc $id")
          x += 1
        }
        y += 1
      }
    }
  }

  // ---- 2. ImageIO interop -----------------------------------------

  /** A genuinely smooth RGB test pattern — gentle non-wrapping ramps.
    * Low AC energy keeps spec-tolerant IDCT implementations within a
    * small bound of each other, and a low chroma slope keeps fancy
    * (interpolating) and replicating chroma upsamplers close. */
  private def smooth(w: Int, h: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val r = 40 + x * 140 / math.max(w - 1, 1)
    val g = 60 + y * 120 / math.max(h - 1, 1)
    val b = 90 + (x + y) * 100 / math.max(w + h - 2, 1)
    (r, g, b)
  }

  private def toBuffered(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    bi
  }

  private def maxRgbDelta(a: BufferedImage, b: JpegCodec.JpegImage): Int = {
    var worst = 0
    for (y <- 0 until b.height; x <- 0 until b.width) {
      val p = a.getRGB(x, y)
      val (r2, g2, b2) = b.rgb(x, y)
      worst = math.max(worst, math.abs(((p >> 16) & 0xFF) - r2)
        .max(math.abs(((p >> 8) & 0xFF) - g2))
        .max(math.abs((p & 0xFF) - b2)))
    }
    worst
  }

  test("ImageIO decodes our 4:4:4 bytes to the same image (±2)") {
    val (w, h) = (37, 29)
    val bytes = JpegCodec.encodeRgb(w, h, smooth(w, h), subsample = false)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected our bytes")
    assert(theirs.getWidth == w && theirs.getHeight == h)
    val ours = JpegCodec.decode(bytes)
    assert(maxRgbDelta(theirs, ours) <= 2)
  }

  test("ImageIO decodes our 4:2:0 restart-marker bytes (constant chroma, ±2)") {
    // constant chroma: upsampling strategy differences cannot show
    val (w, h) = (40, 33)
    def px(x: Int, y: Int) = {
      val v = 30 + (x * 2 + y * 3) % 190; (v, v, v)
    }
    val bytes = JpegCodec.encodeRgb(w, h, px, subsample = true,
      restartInterval = 2)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected our restart-interval bytes")
    val ours = JpegCodec.decode(bytes)
    assert(maxRgbDelta(theirs, ours) <= 2)
  }

  test("our decoder agrees with ImageIO on ImageIO-encoded files (±4)") {
    // foreign quant + Huffman tables and layout choices end to end
    val (w, h) = (48, 32)
    val bi = toBuffered(w, h, smooth(w, h))
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = out.toByteArray
    val ours = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.width == w && ours.height == h)
    // ImageIO writes 4:2:0 and decodes with an INTERPOLATING chroma
    // upsampler; we upsample by replication (both spec-legal), so on
    // sloped chroma the decoders differ by ~ the per-pixel chroma
    // slope × the RGB conversion gain on top of IDCT rounding: ±4
    // on this gentle ramp, not the luma-path ±2
    assert(maxRgbDelta(theirs, ours) <= 4)
  }

  test("our decoder handles ImageIO grayscale files") {
    // NB: compare RASTER samples, not getRGB — java.awt converts
    // TYPE_BYTE_GRAY through a linear-gray color space, so getRGB
    // applies an sRGB gamma that is an AWT artifact, not JPEG data
    val (w, h) = (21, 17)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, 20 + (x * 5 + y * 7) % 200)
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(bi, "jpeg", out)
    val ours = JpegCodec.decode(out.toByteArray)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    assert(ours.width == w && ours.height == h)
    // grayscale: Cb/Cr must report neutral
    assert(ours.cb.forall(_ == 128) && ours.cr.forall(_ == 128))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = theirs.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(t - ours.y(y * w + x)))
    }
    assert(worst <= 2)
  }

  test("16-bit (Pq=1) quantization tables decode identically") {
    // splice the same DQT values re-encoded as 16-bit words — the
    // spec's other precision branch, which no encoder here emits
    val bytes = SynthJpeg.bytes(7L)
    def u8(p: Int) = bytes(p) & 0xFF
    var p = 2
    while (!(u8(p) == 0xFF && u8(p + 1) == 0xDB)) p += 1
    val len = (u8(p + 2) << 8) | u8(p + 3)
    val body = bytes.slice(p + 4, p + 2 + len)
    val wide = new java.io.ByteArrayOutputStream()
    var q = 0
    while (q < body.length) {
      val pqtq = body(q) & 0xFF
      assert((pqtq >> 4) == 0, "fixture DQT already 16-bit?")
      wide.write(0x10 | (pqtq & 0xF)) // Pq=1, same Tq
      for (i <- 0 until 64) { wide.write(0); wide.write(body(q + 1 + i)) }
      q += 65
    }
    val wb = wide.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, p + 2)
    out.write(((wb.length + 2) >> 8) & 0xFF); out.write((wb.length + 2) & 0xFF)
    out.write(wb, 0, wb.length)
    out.write(bytes, p + 2 + len, bytes.length - (p + 2 + len))
    val a = JpegCodec.decode(bytes)
    val b = JpegCodec.decode(out.toByteArray)
    assert(a.y.sameElements(b.y) && a.cb.sameElements(b.cb) &&
      a.cr.sameElements(b.cr), "16-bit DQT decode diverged")
  }

  // ---- 3. loud failures -------------------------------------------

  test("truncated entropy data fails loudly") {
    val bytes = SynthJpeg.bytes(5L)
    val cut = bytes.take(bytes.length - 30)
    intercept[IllegalArgumentException](JpegCodec.decode(cut))
  }

  test("corrupted restart-marker sequence fails loudly") {
    val bytes = SynthJpeg.bytes(3L) // has DRI (3 % 3 == 0)
    // find the first RST marker (FFD0..FFD7 after SOS) and break it
    val sos = {
      var i = 2
      while (!((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xDA)) i += 1
      i
    }
    var p = sos + 2
    while (!((bytes(p) & 0xFF) == 0xFF &&
      (bytes(p + 1) & 0xFF) >= 0xD0 && (bytes(p + 1) & 0xFF) <= 0xD7)) p += 1
    val broken = bytes.clone()
    broken(p + 1) = (0xD0 + (((broken(p + 1) & 0xFF) - 0xD0 + 3) % 8)).toByte
    intercept[IllegalArgumentException](JpegCodec.decode(broken))
  }

  // ---- progressive (SOF2) ----------------------------------------

  private def writeProgressive(bi: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = out.toByteArray
    // the writer really did emit a progressive frame
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2), "no SOF2")
    bytes
  }

  test("progressive grayscale (ImageIO-written) decodes to the exact block law") {
    // spectral-selection + successive-approximation scans (the IJG
    // default scan script ImageIO uses), quality 1.0 block-constant —
    // the same exactness point as the q112 baseline third
    for ((w, h, seed) <- Seq((8, 8, 1L), (40, 24, 37L), (41, 23, 7L),
        (64, 48, 123L), (17, 9, 999L))) {
      def law(bx: Int, by: Int) =
        ((seed * 31 + bx * 11 + by * 5) % 256).toInt
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, law(x / 8, y / 8))
      val img = JpegCodec.decode(writeProgressive(bi))
      assert((img.width, img.height) == (w, h), s"dims $w x $h")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.y(y * w + x) == law(x / 8, y / 8),
          s"($x,$y) seed=$seed: got ${img.y(y * w + x)}")
    }
  }

  test("progressive color (ImageIO-written) matches ImageIO's own decode exactly " +
    "on constant-chroma blocks") {
    // gray RGB per 8×8 block ⇒ Cb = Cr = 128 image-wide, so the one
    // decoder freedom T.81 leaves open (chroma upsampling filter —
    // ImageIO blends, we replicate) is out of play and the
    // 3-component progressive path (interleaved DC scan + per-
    // component AC scans + refinements) must agree bit for bit
    val (w, h) = (48, 32)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def v(bx: Int, by: Int) = (bx * 53 + by * 29) % 256
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x / 8, y / 8)
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bytes = writeProgressive(bi)
    val ours = JpegCodec.decode(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ours.rgb(x, y)
      val rp = ref.getRGB(x, y)
      assert(r == ((rp >> 16) & 0xFF) && g == ((rp >> 8) & 0xFF) &&
        b == (rp & 0xFF), s"($x,$y): ours=($r,$g,$b) vs ref=$rp")
    }
  }

  test("truncated progressive stream is rejected loudly") {
    val bi = new BufferedImage(32, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32)
      bi.getRaster.setSample(x, y, 0, (x / 8 * 40 + y / 8 * 30) % 256)
    val bytes = writeProgressive(bi)
    // dropping the EOI (and some tail) must never return a silently-
    // partial image — loud failure, whether a structural require or a
    // bounds check depending on where the cut lands
    for (cut <- Seq(2, 6, 20, bytes.length / 2)) {
      val threw =
        try { JpegCodec.decode(bytes.take(bytes.length - cut)); false }
        catch { case _: IllegalArgumentException => true
          case _: ArrayIndexOutOfBoundsException => true }
      assert(threw, s"truncation by $cut decoded silently")
    }
  }

  test("missing SOI fails loudly") {
    intercept[IllegalArgumentException](
      JpegCodec.decode(Array[Byte](0, 1, 2, 3, 4, 5)))
  }
}
