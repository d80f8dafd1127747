package graft

import graft.operators.{AviCodec, JpegCodec}
import graft.operators.Multimodal.SynthVideo
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the pure-JVM MJPEG/AVI container codec: the q105 law
  * round trip pinned without a cluster, frame ORDER sensitivity, and
  * loud failures on structural corruption. Per-frame JPEG fidelity
  * is JpegCodecSpec's job; this suite owns the container walk. */
class AviCodecSpec extends AnyFunSuite {

  test("synth law round-trips exactly: dims, frame count, every plane") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 32L, 33L, 456L, 9999L)) {
      val v = AviCodec.decode(SynthVideo.bytes(id))
      assert(v.width == SynthVideo.width(id) &&
        v.height == SynthVideo.height(id), s"dims for doc $id")
      assert(v.frames.length == SynthVideo.nFrames(id), s"frames for doc $id")
      assert(v.fps == SynthVideo.Fps)
      for (f <- v.frames.indices) {
        val img = v.frames(f)
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            assert(img.y(y * img.width + x) ==
              SynthVideo.lumaBlock(id, f, x / 8, y / 8),
              s"luma at ($x,$y) frame $f doc $id")
            x += 1
          }
          y += 1
        }
      }
    }
  }

  test("frame order survives the container (distinct consecutive frames)") {
    val id = 5L
    val v = AviCodec.decode(SynthVideo.bytes(id))
    // the law mixes f into the luma: consecutive frames must differ
    for (f <- 1 until v.frames.length)
      assert(!v.frames(f).y.sameElements(v.frames(f - 1).y),
        s"frames ${f - 1} and $f identical")
    // and frame f must equal an independent decode of frameBytes(f)
    for (f <- v.frames.indices) {
      val solo = JpegCodec.decode(SynthVideo.frameBytes(id, f))
      assert(v.frames(f).y.sameElements(solo.y), s"frame $f != solo decode")
    }
  }

  test("odd-size frame payloads honor the RIFF pad byte") {
    // force odd payload sizes by trying several ids; at least one of
    // the synthesized JPEGs is odd-length in practice — assert we
    // found one so the pad path is really exercised
    val odd = (0L to 40L).find(id =>
      (0 until SynthVideo.nFrames(id)).exists(f =>
        SynthVideo.frameBytes(id, f).length % 2 == 1))
    assert(odd.isDefined, "no odd-size frame in the probe range")
    val v = AviCodec.decode(SynthVideo.bytes(odd.get))
    assert(v.frames.length == SynthVideo.nFrames(odd.get))
  }

  test("truncation fails loudly") {
    val bytes = SynthVideo.bytes(4L)
    intercept[IllegalArgumentException](
      AviCodec.decode(bytes.take(bytes.length / 2)))
  }

  test("non-AVI RIFF (a WAV) fails loudly") {
    val wav = graft.operators.Multimodal.SynthWav.bytes(1L)
    intercept[IllegalArgumentException](AviCodec.decode(wav))
  }

  test("negative chunk length fails loudly, never loops (round-12 advice)") {
    // a corrupt length >= 2^31 reads as negative; unchecked it passes
    // the remaining-bytes guard and seeks BACKWARDS — the top-level
    // walker would revisit the same chunk forever
    val good = SynthVideo.bytes(5L)
    def u32(b: Array[Byte], q: Int) = (b(q) & 0xFF) |
      ((b(q + 1) & 0xFF) << 8) | ((b(q + 2) & 0xFF) << 16) |
      ((b(q + 3) & 0xFF) << 24)
    val list = ('L' & 0xFF) | (('I' & 0xFF) << 8) |
      (('S' & 0xFF) << 16) | (('T' & 0xFF) << 24)
    // corrupt the first LIST chunk's length to 0xFFFFFFF0 (negative)
    var p = 12
    while (u32(good, p) != list) p += 1
    val broken = good.clone()
    broken(p + 4) = 0xF0.toByte; broken(p + 5) = 0xFF.toByte
    broken(p + 6) = 0xFF.toByte; broken(p + 7) = 0xFF.toByte
    val e = intercept[IllegalArgumentException](AviCodec.decode(broken))
    assert(e.getMessage.contains("bad chunk length"))
  }

  test("frame-count mismatch between header and movi fails loudly") {
    val good = SynthVideo.bytes(6L)
    // avih dwTotalFrames sits 16 bytes into the avih body; find the
    // 'avih' fourcc and bump the count
    var p = 12
    def u32(q: Int) = (good(q) & 0xFF) | ((good(q + 1) & 0xFF) << 8) |
      ((good(q + 2) & 0xFF) << 16) | ((good(q + 3) & 0xFF) << 24)
    val avih = ('a' & 0xFF) | (('v' & 0xFF) << 8) | (('i' & 0xFF) << 16) | (('h' & 0xFF) << 24)
    while (u32(p) != avih) p += 1
    val broken = good.clone()
    val cntPos = p + 8 + 16
    broken(cntPos) = (broken(cntPos) + 1).toByte
    intercept[IllegalArgumentException](AviCodec.decode(broken))
  }

  test("a corrupted frame JPEG fails loudly, not silently") {
    val good = SynthVideo.bytes(8L)
    // find the first 00dc chunk and truncate its JPEG mid-stream by
    // zeroing bytes after its header (breaks a marker invariant)
    var p = 12
    def u32(q: Int) = (good(q) & 0xFF) | ((good(q + 1) & 0xFF) << 8) |
      ((good(q + 2) & 0xFF) << 16) | ((good(q + 3) & 0xFF) << 24)
    val dc = ('0' & 0xFF) | (('0' & 0xFF) << 8) | (('d' & 0xFF) << 16) | (('c' & 0xFF) << 24)
    while (u32(p) != dc) p += 1
    val broken = good.clone()
    // clobber the SOI of that frame
    broken(p + 8) = 0x00
    intercept[IllegalArgumentException](AviCodec.decode(broken))
  }
}
