package graft

import graft.operators.{ForeignMedia, GifCodec, JpegCodec, PngCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACTNESS of the q112 foreign round-trips: bytes written
  * by `javax.imageio` (independent encoder), decoded by the repo's
  * codecs, must reproduce the generative laws bit-for-bit — per
  * pixel here, so a q112 sum-level pass can never be a cancellation
  * accident. Covers every (format × dims) residue class plus
  * larger-than-corpus ids. */
class ForeignMediaSpec extends AnyFunSuite {

  // ids covering all dim residues per format; 3k+r picks the format
  private val ids: Seq[Long] =
    (0L until 63L) ++ Seq(597L, 598L, 599L, 6001L, 6002L, 6003L)

  test("ImageIO PNG decodes to the exact per-pixel law") {
    for (id <- ids if ForeignMedia.fmtOf(id) == "png") {
      val (w0, h0) = ForeignMedia.pngDims(id)
      val (w, h, px) = PngCodec.decodePixels(id, ForeignMedia.encodePng(id))
      assert((w, h) == (w0, h0), s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = ForeignMedia.pngRgb(id, x, y)
        val p = px(y * w + x)
        assert(p == ((r << 16) | (g << 8) | b),
          s"id=$id png pixel ($x,$y): got ${p.toHexString}, " +
            s"law ${((r << 16) | (g << 8) | b).toHexString}")
      }
    }
  }

  test("ImageIO GIF decodes to the exact palette-resolved law") {
    var sawInterlaced = false
    var sawPlain = false
    for (id <- ids if ForeignMedia.fmtOf(id) == "gif") {
      val (w0, h0) = ForeignMedia.gifDims(id)
      val bytes = ForeignMedia.encodeGif(id)
      // the interlace FLAG must follow the law — both decoder row
      // orders are exercised, not just ImageIO's interlaced default
      var p = 13 + 768 // header + 256-entry GCT
      while ((bytes(p) & 0xFF) == 0x21) { // skip extensions
        p += 2
        while (bytes(p) != 0) p += 1 + (bytes(p) & 0xFF)
        p += 1
      }
      val interlaced = (bytes(p + 9) & 0x40) != 0
      assert(interlaced == ForeignMedia.gifInterlaced(id),
        s"id=$id interlace flag vs law")
      if (interlaced) sawInterlaced = true else sawPlain = true
      val img = GifCodec.decode(bytes)
      assert((img.width, img.height) == (w0, h0), s"id=$id dims")
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val (r, g, b) = ForeignMedia.gifPalette(
          ForeignMedia.gifIndex(id, x, y))
        val p = img.rgb(y * img.width + x)
        assert(p == ((r << 16) | (g << 8) | b),
          s"id=$id gif pixel ($x,$y): got ${p.toHexString}, " +
            s"law ${((r << 16) | (g << 8) | b).toHexString}")
      }
    }
    assert(sawInterlaced && sawPlain, "both interlace modes must appear")
  }

  test("javax.sound WAV decodes to the exact per-sample law") {
    for (id <- Seq(0L, 1L, 2L, 399L, 400L, 799L, 800L, 6001L)) {
      val bytes = ForeignMedia.encodeWav(id)
      val f = graft.operators.Multimodal.WavCodec.decode(id, bytes)
      assert(f.sample_rate == ForeignMedia.WavRate, s"id=$id rate")
      val samples =
        graft.operators.Multimodal.WavCodec.decodeSamples(id, bytes)
      assert(samples.length == ForeignMedia.wavCount(id), s"id=$id count")
      for (t <- samples.indices)
        assert(samples(t) == ForeignMedia.wavSample(id, t),
          s"id=$id sample $t: got ${samples(t)}, " +
            s"law ${ForeignMedia.wavSample(id, t)}")
    }
  }

  test("ImageIO quality-1.0 grayscale JPEG decodes to the exact block law") {
    for (id <- ids if ForeignMedia.fmtOf(id) == "jpeg") {
      val (w0, h0) = ForeignMedia.jpegDims(id)
      val img = JpegCodec.decode(ForeignMedia.encodeJpeg(id))
      assert((img.width, img.height) == (w0, h0), s"id=$id dims")
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val v = ForeignMedia.jpegGray(id, x / 8, y / 8)
        assert(img.y(y * img.width + x) == v,
          s"id=$id jpeg Y ($x,$y): got ${img.y(y * img.width + x)}, law $v")
        assert(img.cb(y * img.width + x) == 128 &&
          img.cr(y * img.width + x) == 128, s"id=$id chroma not neutral")
      }
    }
  }

  test("ImageIO PROGRESSIVE JPEG (grayscale + 3-component color) decodes " +
    "to the exact block law with neutral chroma") {
    // the q128 corpus construction: SOF2 multi-scan files (IJG
    // spectral-selection + successive-approximation script) at
    // quality 1.0, non-multiple-of-8 dims — edge blocks cropped.
    // Odd ids are THREE-component (gray-valued RGB ⇒ Y = law,
    // Cb = Cr = 128 exactly through libjpeg's fixed-point
    // converter): the interleaved-DC + per-component-AC +
    // chroma-refinement scan structure under the same exact point
    for (id <- ids) {
      val (w0, h0) = ForeignMedia.progDims(id)
      val bytes = ForeignMedia.encodeProgressive(id)
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2),
        s"id=$id: writer did not emit SOF2")
      val img = JpegCodec.decode(bytes)
      assert((img.width, img.height) == (w0, h0), s"id=$id dims")
      for (y <- 0 until h0; x <- 0 until w0) {
        val want = ForeignMedia.progGray(id, x / 8, y / 8)
        assert(img.y(y * w0 + x) == want,
          s"id=$id ($x,$y): got ${img.y(y * w0 + x)}, law $want")
        assert(img.cb(y * w0 + x) == 128 && img.cr(y * w0 + x) == 128,
          s"id=$id ($x,$y): chroma not neutral " +
            s"(${img.cb(y * w0 + x)}, ${img.cr(y * w0 + x)})")
      }
    }
    // the color half must really BE 3-component on disk: a corpus
    // builder silently writing grayscale would pass every pixel law
    def nf(bytes: Array[Byte]): Int = {
      val i = bytes.sliding(2).indexWhere(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2)
      bytes(i + 9) & 0xFF
    }
    for (id <- ids) {
      val want = if (ForeignMedia.progColor(id)) 3 else 1
      assert(nf(ForeignMedia.encodeProgressive(id)) == want,
        s"id=$id: SOF2 component count")
    }
  }

  test("AVI around ImageIO JPEG frames decodes to the exact per-frame law") {
    // the q127 construction: container own, frames foreign — the
    // MJPEG walker must hand each ImageIO-encoded frame to the JPEG
    // decoder and preserve frame ORDER (the laws differ per frame)
    for (id <- ids) {
      val (w0, h0) = ForeignMedia.videoDims(id)
      val v = graft.operators.AviCodec.decode(
        ForeignMedia.encodeVideoForeign(id))
      assert((v.width, v.height) == (w0, h0), s"id=$id dims")
      assert(v.frames.length == ForeignMedia.videoFrames(id),
        s"id=$id frame count")
      assert(v.fps == ForeignMedia.ForeignVideoFps)
      for (f <- v.frames.indices; y <- 0 until h0; x <- 0 until w0) {
        val want = ForeignMedia.videoGray(id, f, x / 8, y / 8)
        val got = v.frames(f).y(y * w0 + x)
        assert(got == want, s"id=$id frame $f ($x,$y): $got vs law $want")
      }
    }
  }
}
