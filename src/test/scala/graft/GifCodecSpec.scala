package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import javax.imageio.ImageIO

import graft.operators.GifCodec
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the pure-JVM GIF/LZW codec. GIF is lossless, so unlike
  * JPEG the cross-decoder pins are EXACT equality: ImageIO must
  * decode our bytes to identical pixels, and our decoder must decode
  * ImageIO-encoded files identically — the only way both pass is if
  * our variable-width LZW (early-change widths, KwKwK, dictionary
  * reset) matches the convention every real decoder implements. */
class GifCodecSpec extends AnyFunSuite {

  private val palette = GifCodec.lawPalette

  private def lawIndex(seed: Long)(x: Int, y: Int): Int =
    ((seed * 3 + x * 5 + y * 11) % 256).toInt

  test("round-trips the law image exactly") {
    for (seed <- Seq(0L, 1L, 7L, 123L, 9999L)) {
      val (w, h) = (20 + (seed % 31).toInt, 20 + (seed % 23).toInt)
      val img = GifCodec.decode(GifCodec.encode(w, h, palette, lawIndex(seed)))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        assert(img.rgb(i) == palette(lawIndex(seed)(x, y)),
          s"pixel ($x,$y) seed $seed")
      }
    }
  }

  test("round-trips adversarial index patterns (constant, KwKwK-heavy, noise)") {
    val cases: Seq[(Int, Int, (Int, Int) => Int)] = Seq(
      (64, 64, (_, _) => 7),                       // constant: deep chains
      (97, 3, (x, _) => x % 2),                    // aababab: KwKwK city
      (40, 40, (x, y) => ((x * 31 + y * 17) ^ (x * y)) & 0xFF), // noise
      (1, 1, (_, _) => 255),
      (300, 11, (x, y) => (x + y) & 0xFF))         // wide: many sub-blocks
    for (((w, h, f), ci) <- cases.zipWithIndex) {
      val img = GifCodec.decode(GifCodec.encode(w, h, palette, f))
      assert(img.width == w && img.height == h, s"case $ci dims")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.rgb(y * w + x) == palette(f(x, y)), s"case $ci ($x,$y)")
    }
  }

  test("a big image crosses the 4096-entry dictionary reset and survives") {
    val (w, h) = (256, 128) // 32k pixels of noise forces several resets
    def f(x: Int, y: Int) = ((x * 131 + y * 239 + (x ^ y) * 7) & 0xFF)
    val img = GifCodec.decode(GifCodec.encode(w, h, palette, f))
    for (y <- 0 until h; x <- 0 until w)
      assert(img.rgb(y * w + x) == palette(f(x, y)), s"($x,$y)")
  }

  test("ImageIO decodes our bytes to identical pixels") {
    val (w, h) = (57, 43)
    def f(x: Int, y: Int) = lawIndex(5L)(x, y)
    val bytes = GifCodec.encode(w, h, palette, f)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected our GIF")
    assert(theirs.getWidth == w && theirs.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((theirs.getRGB(x, y) & 0xFFFFFF) == palette(f(x, y)),
        s"ImageIO disagrees at ($x,$y)")
  }

  test("our decoder decodes ImageIO-encoded files identically") {
    val (w, h) = (49, 37)
    def f(x: Int, y: Int) = lawIndex(9L)(x, y)
    // indexed BufferedImage with our exact palette → lossless GIF write
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    for (i <- 0 until 256) {
      r(i) = ((palette(i) >> 16) & 0xFF).toByte
      g(i) = ((palette(i) >> 8) & 0xFF).toByte
      b(i) = (palette(i) & 0xFF).toByte
    }
    val icm = new IndexColorModel(8, 256, r, g, b)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, f(x, y))
    val out = new java.io.ByteArrayOutputStream()
    // disable interlace (GIF's "progressive" mode, ImageIO's default)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val ours = GifCodec.decode(out.toByteArray)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      assert(ours.rgb(y * w + x) == (theirs.getRGB(x, y) & 0xFFFFFF),
        s"we disagree with ImageIO at ($x,$y)")
      assert(ours.rgb(y * w + x) == palette(f(x, y)),
        s"lossless pixel mismatch at ($x,$y)")
    }
  }

  test("our decoder re-sequences ImageIO INTERLACED files identically") {
    val (w, h) = (33, 29)
    def f(x: Int, y: Int) = lawIndex(13L)(x, y)
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    for (i <- 0 until 256) {
      r(i) = ((palette(i) >> 16) & 0xFF).toByte
      g(i) = ((palette(i) >> 8) & 0xFF).toByte
      b(i) = (palette(i) & 0xFF).toByte
    }
    val icm = new IndexColorModel(8, 256, r, g, b)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, f(x, y))
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    // confirm the file really is interlaced (flag bit in the image
    // descriptor), else this test silently stops covering the path
    val bytes = out.toByteArray
    var p = 13 + 768
    while ((bytes(p) & 0xFF) != 0x2C) p += 1
    assert((bytes(p + 9) & 0x40) != 0, "ImageIO did not interlace")
    val ours = GifCodec.decode(bytes)
    for (y <- 0 until h; x <- 0 until w)
      assert(ours.rgb(y * w + x) == palette(f(x, y)),
        s"interlaced pixel mismatch at ($x,$y)")
  }

  test("corruption fails loudly") {
    val good = GifCodec.encode(30, 20, palette, lawIndex(3L))
    intercept[IllegalArgumentException](
      GifCodec.decode(good.take(good.length / 2)))         // truncation
    intercept[IllegalArgumentException](
      GifCodec.decode("NOTAGIF89a and then some".getBytes)) // signature
    // declare fewer pixels than the stream carries: shrink height
    val shrunk = good.clone()
    // image descriptor height lives 7 bytes into the 0x2C block
    var p = 13 + 768
    while ((shrunk(p) & 0xFF) != 0x2C) p += 1
    shrunk(p + 7) = 2; shrunk(p + 8) = 0
    intercept[IllegalArgumentException](GifCodec.decode(shrunk))
  }

  test("nonzero image offset fails loudly (round-12 advice)") {
    // a single-image decoder must never silently treat an offset
    // sub-image as the whole logical screen
    val good = GifCodec.encode(30, 20, palette, lawIndex(5L))
    val off = good.clone()
    var p = 13 + 768
    while ((off(p) & 0xFF) != 0x2C) p += 1
    off(p + 1) = 2 // left offset = 2
    val e = intercept[IllegalArgumentException](GifCodec.decode(off))
    assert(e.getMessage.contains("offset"))
  }
}
