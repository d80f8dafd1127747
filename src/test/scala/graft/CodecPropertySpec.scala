package graft

import graft.operators.Multimodal.{BmpCodec, WavCodec}
import graft.operators.{FlacCodec, PngCodec}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JVM media codecs: the handcrafted
  * MultimodalSpec cases pin known layouts; these pin the LAWS — any
  * signal/image a generator can produce must round-trip exactly.
  * ScalaCheck's runner is driven directly (no scalatest bridge in the
  * offline cache). */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("WAV: any PCM16 signal round-trips bit-exactly") {
    val gen = for {
      rate <- Gen.choose(8000, 48000)
      n <- Gen.choose(0, 400)
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, samples.toArray)
    check("wav round trip", Prop.forAll(gen) { case (rate, samples) =>
      val decoded = WavCodec.decodeSamples(1L,
        WavCodec.encode(rate, samples))
      val f = WavCodec.decode(1L, WavCodec.encode(rate, samples))
      decoded.sameElements(samples) &&
        f.sample_rate == rate && f.n_samples == samples.length &&
        f.n_bytes == 44 + 2 * samples.length &&
        f.duration_us == samples.length.toLong * 1000000L / rate &&
        f.peak == (if (samples.isEmpty) 0
          else samples.map(s => math.abs(s.toInt)).max)
    })
  }

  test("BMP: any 24-bpp image round-trips dims and exact means") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, seed)
    def px(seed: Long)(x: Int, y: Int): (Int, Int, Int) = {
      val v = seed + x * 7919L + y * 104729L
      (((v * 31) % 256).toInt.abs, ((v * 37) % 256).toInt.abs,
        ((v * 41) % 256).toInt.abs)
    }
    check("bmp round trip", Prop.forAll(gen) { case (w, h, seed) =>
      val f = BmpCodec.decode(1L, BmpCodec.encode(w, h, px(seed)))
      val all = for (x <- 0 until w; y <- 0 until h) yield px(seed)(x, y)
      val n = w * h
      def mean(sel: ((Int, Int, Int)) => Int) =
        math.floor(all.map(sel).sum.toDouble / n * 1e6 + 0.5) / 1e6
      f.width == w && f.height == h &&
        f.n_bytes == 54 + (3 * w + (4 - (3 * w) % 4) % 4) * h &&
        f.mean_r == mean(_._1) && f.mean_g == mean(_._2) &&
        f.mean_b == mean(_._3)
    })
  }

  test("BMP: pixelDigest is content-determined and injective on dims") {
    val gen = for {
      w <- Gen.choose(1, 16)
      h <- Gen.choose(1, 16)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, seed)
    def px(seed: Long)(x: Int, y: Int): (Int, Int, Int) = {
      val v = seed + x * 13L + y * 17L
      ((v % 256).toInt, ((v * 3) % 256).toInt, ((v * 5) % 256).toInt)
    }
    def digest(bytes: Array[Byte]) = BmpCodec.pixelDigest(
      java.security.MessageDigest.getInstance("MD5"), 1L, bytes)
    check("digest determinism", Prop.forAll(gen) { case (w, h, seed) =>
      val a = digest(BmpCodec.encode(w, h, px(seed)))
      val b = digest(BmpCodec.encode(w, h, px(seed)))
      // deterministic, and a single-pixel perturbation changes it
      val c = digest(BmpCodec.encode(w, h, (x, y) =>
        if (x == 0 && y == 0) { val (r, g, bl) = px(seed)(x, y)
          ((r + 1) % 256, g, bl) } else px(seed)(x, y)))
      a == b && a != c
    })
  }

  test("PNG: any 8-bit RGB image round-trips pixels exactly " +
    "(all five filters + split IDAT by construction)") {
    // height ≥ 5 guarantees the rotating encoder emits every filter
    // type 0–4, so a pass here proves every unfilter branch
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(5, 40)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, seed)
    def px(seed: Long)(x: Int, y: Int): (Int, Int, Int) = {
      val v = seed + x * 7919L + y * 104729L
      (((v * 31) % 256).toInt.abs, ((v * 37) % 256).toInt.abs,
        ((v * 41) % 256).toInt.abs)
    }
    check("png round trip", Prop.forAll(gen) { case (w, h, seed) =>
      val (dw, dh, pix) =
        PngCodec.decodePixels(1L, PngCodec.encode(w, h, px(seed)))
      val want = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = px(seed)(x, y); (r << 16) | (g << 8) | b
      }
      dw == w && dh == h && pix.toSeq == want
    })
  }

  test("PNG: feature decode matches exact means") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(5, 24)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, seed)
    // floorMod: v*3/v*5 can overflow Long negative, and the codec
    // stores bytes mod 256 — the test-side mean must use the same
    // 0..255 value the encoder wrote
    def px(seed: Long)(x: Int, y: Int): (Int, Int, Int) = {
      val v = seed + x * 13L + y * 17L
      (Math.floorMod(v, 256).toInt, Math.floorMod(v * 3, 256).toInt,
        Math.floorMod(v * 5, 256).toInt)
    }
    check("png means", Prop.forAll(gen) { case (w, h, seed) =>
      val f = PngCodec.decode(1L, PngCodec.encode(w, h, px(seed)))
      val all = for (x <- 0 until w; y <- 0 until h) yield px(seed)(x, y)
      val n = w * h
      def mean(sel: ((Int, Int, Int)) => Int) =
        math.floor(all.map(sel).sum.toDouble / n * 1e6 + 0.5) / 1e6
      f.width == w && f.height == h &&
        f.mean_r == mean(_._1) && f.mean_g == mean(_._2) &&
        f.mean_b == mean(_._3)
    })
  }

  test("PNG + BMP: same pixels digest identically across containers") {
    val gen = for {
      w <- Gen.choose(1, 16)
      h <- Gen.choose(5, 16)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, seed)
    def px(seed: Long)(x: Int, y: Int): (Int, Int, Int) = {
      val v = seed + x * 13L + y * 17L
      ((v % 256).toInt, ((v * 3) % 256).toInt, ((v * 5) % 256).toInt)
    }
    def md() = java.security.MessageDigest.getInstance("MD5")
    check("cross-container digest", Prop.forAll(gen) {
      case (w, h, seed) =>
        PngCodec.pixelDigest(md(), 1L, PngCodec.encode(w, h, px(seed))) ==
          BmpCodec.pixelDigest(md(), 1L, BmpCodec.encode(w, h, px(seed)))
    })
  }

  test("PNG: corruption is rejected loudly, never mis-decoded") {
    val bytes = PngCodec.encode(9, 7, (x, y) => (x * 20, y * 30, x + y))
    // flip one byte inside the first IDAT payload → CRC must catch it
    val idatPos = {
      var p = 8
      while (new String(bytes, p + 4, 4, "US-ASCII") != "IDAT")
        p += 12 + (((bytes(p) & 0xFF) << 24) | ((bytes(p + 1) & 0xFF) << 16) |
          ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF))
      p
    }
    val corrupted = bytes.clone()
    corrupted(idatPos + 8) = (corrupted(idatPos + 8) ^ 0x55).toByte
    val e1 = intercept[IllegalArgumentException] {
      PngCodec.decode(1L, corrupted)
    }
    assert(e1.getMessage.contains("CRC"))
    // truncation
    val e2 = intercept[IllegalArgumentException] {
      PngCodec.decode(1L, bytes.take(bytes.length - 20))
    }
    assert(e2.getMessage.toLowerCase.contains("trunc") ||
      e2.getMessage.contains("missing"))
    // wrong signature
    val e3 = intercept[IllegalArgumentException] {
      PngCodec.decode(1L, "not a png at all............".getBytes)
    }
    assert(e3.getMessage.contains("not a PNG"))
    // unsupported color type (grayscale): rewrite IHDR byte + its CRC
    val gray = bytes.clone()
    gray(8 + 8 + 9) = 0.toByte // IHDR data starts at 16; color type at +9
    val crc = new java.util.zip.CRC32()
    crc.update(gray, 12, 4 + 13)
    val cv = crc.getValue.toInt
    gray(8 + 8 + 13) = (cv >>> 24).toByte
    gray(8 + 8 + 14) = (cv >>> 16).toByte
    gray(8 + 8 + 15) = (cv >>> 8).toByte
    gray(8 + 8 + 16) = cv.toByte
    val e4 = intercept[IllegalArgumentException] {
      PngCodec.decode(1L, gray)
    }
    assert(e4.getMessage.contains("color type"))
  }

  test("FLAC: any PCM16 signal round-trips bit-exactly through every " +
    "fixed order and partition layout") {
    val gen = for {
      rate <- Gen.choose(8000, 48000)
      n <- Gen.choose(8, 512).map(_ * 4) // divisible by 4 for pOrder 2
      order <- Gen.choose(-1, 4)
      pOrder <- Gen.choose(0, 2)
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, order, pOrder, samples.toArray)
    check("flac round trip", Prop.forAllNoShrink(gen) {
      case (rate, order, pOrder, samples) =>
        val bytes = FlacCodec.encode(rate, samples, order, pOrder)
        val (dRate, decoded) = FlacCodec.decodeSamples(1L, bytes)
        dRate == rate && decoded.sameElements(samples)
    })
  }

  test("FLAC: any stereo PCM16 pair round-trips bit-exactly through " +
    "every channel assignment and subframe class") {
    import graft.operators.FlacCodec.{AutoSub, FixedSub, LpcSub, SubframeSpec}
    val specGen: Gen[SubframeSpec] = Gen.oneOf(
      Gen.const(AutoSub),
      Gen.choose(0, 4).map(FixedSub(_)),
      Gen.choose(1, 8).map(LpcSub(_)))
    val gen = for {
      rate <- Gen.choose(8000, 48000)
      // n ≥ 36: with pOrder ≤ 2 the first partition keeps
      // n/4 − order ≥ 1 residuals even at LPC order 8 (the encoder
      // rejects a partition layout the order doesn't fit)
      n <- Gen.choose(9, 256).map(_ * 4)
      mode <- Gen.oneOf(1, 8, 9, 10) // indep, L/S, R/S, M/S
      s0 <- specGen
      s1 <- specGen
      pOrder <- Gen.choose(0, 2)
      left <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
      right <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, n, mode, s0, s1, pOrder, left.toArray, right.toArray)
    check("flac stereo round trip", Prop.forAllNoShrink(gen) {
      case (rate, n, mode, s0, s1, pOrder, left, right) =>
        val bytes = FlacCodec.encodeStereo(rate, left, right, mode,
          s0, s1, pOrder)
        val (dRate, nCh, decoded) = FlacCodec.decodeSamplesMulti(1L, bytes)
        dRate == rate && nCh == 2 && decoded.length == 2 * n &&
          (0 until n).forall(i =>
            decoded(2 * i) == left(i) && decoded(2 * i + 1) == right(i))
    })
    // extremes: the side channel's 17-bit width is genuinely needed
    // (L = max, R = min ⇒ side = 65535) and must survive every
    // decorrelating mode
    val lo = Array.fill(64)(Short.MinValue)
    val hi = Array.fill(64)(Short.MaxValue)
    for (mode <- Seq(8, 9, 10)) {
      val b = FlacCodec.encodeStereo(16000, hi, lo, mode)
      val (_, _, d) = FlacCodec.decodeSamplesMulti(1L, b)
      assert((0 until 64).forall(i =>
        d(2 * i) == Short.MaxValue && d(2 * i + 1) == Short.MinValue),
        s"17-bit side extreme broke mode $mode")
    }
  }

  test("FLAC: LPC round-trips mono, predicts a smooth signal, and " +
    "degenerate input falls back") {
    import graft.operators.FlacCodec.LpcSub
    // LPC on a near-sinusoid: an order-2 predictor models it almost
    // exactly (x[i] ≈ 2cos(ω)x[i-1] − x[i-2]), so a CORRECT Levinson
    // sign/recursion compresses far below VERBATIM — a sign error
    // makes the "predictor" anti-predictive and blows the size up,
    // which is exactly what this pin catches (the round trip itself
    // is exact for any coefficients)
    val sine = Array.tabulate(1024)(i =>
      (12000 * math.sin(i * 0.07)).toShort)
    for (ord <- 1 to 8) {
      val b = FlacCodec.encodeSpec(16000, sine, LpcSub(ord))
      val (_, d) = FlacCodec.decodeSamples(1L, b)
      assert(d.sameElements(sine), s"LPC order $ord round trip")
      if (ord >= 2)
        // every order ≥ 2 must at least halve raw PCM; a Levinson
        // sign/recursion error makes the predictor anti-predictive
        // (residuals ~2|x|, ABOVE verbatim) and fails this by a mile
        assert(b.length < sine.length,
          s"LPC order $ord did not compress the sinusoid: "
            + s"${b.length} vs raw ${sine.length * 2}")
      if (ord == 2)
        // the Welch-windowed autocorrelation makes the order-2 model
        // near-exact on a sinusoid (x[i] ≈ 2cos(ω)x[i−1] − x[i−2];
        // measured residuals a few units) — ≥4× below raw PCM
        assert(b.length < sine.length * 2 / 4,
          s"windowed order-2 LPC lost the sinusoid structure: "
            + s"${b.length} vs raw ${sine.length * 2}")
    }
    // constant signal: autocorrelation is rank-1, Levinson falls back
    // to a fixed order (order-1 residuals are all zero) — still exact
    val const = Array.fill(256)((1234).toShort)
    val b = FlacCodec.encodeSpec(16000, const, LpcSub(4))
    val (_, d) = FlacCodec.decodeSamples(1L, b)
    assert(d.sameElements(const))
  }

  test("FLAC: wasted bits round-trip and genuinely narrow the stream") {
    import graft.operators.FlacCodec.{FixedSub, LpcSub}
    // every sample a multiple of 2^k ⇒ the encoder must detect k
    // shared trailing zeros, code at bits−k, and the decoder shift
    // back — across mono/stereo and subframe classes
    for (k <- 1 to 4) {
      val m = -(1 << k)
      val left = Array.tabulate(512)(i =>
        (((i * 31 + 7) % 60000 - 30000) & m).toShort)
      val right = Array.tabulate(512)(i =>
        (((i * 17 + 3) % 50000 - 25000) & m).toShort)
      val mono = FlacCodec.encode(16000, left, order = 2)
      val (_, dm) = FlacCodec.decodeSamples(1L, mono)
      assert(dm.sameElements(left), s"mono wasted k=$k")
      for (mode <- Seq(1, 8, 10)) {
        val st = FlacCodec.encodeStereo(16000, left, right, mode,
          FixedSub(2), LpcSub(3))
        val (_, nCh, d) = FlacCodec.decodeSamplesMulti(1L, st)
        assert(nCh == 2 && (0 until 512).forall(i =>
          d(2 * i) == left(i) && d(2 * i + 1) == right(i)),
          s"stereo wasted k=$k mode=$mode")
      }
    }
    // the detection is real, not a no-op: masking 4 low bits off a
    // verbatim-ish signal must shrink the stream by ~4 bits/sample
    val noisy = Array.tabulate(1024)(i =>
      (((i * 2654435761L) % 65536) - 32768).toShort)
    val masked = noisy.map(s => (s & -16).toShort)
    val a = FlacCodec.encode(16000, noisy, order = 0)
    val b = FlacCodec.encode(16000, masked, order = 0)
    assert(b.length < a.length - 1024 * 3 / 8,
      s"wasted-bit coding saved too little: ${a.length} -> ${b.length}")
  }

  test("FLAC: corrupted LPC/stereo frames are rejected loudly") {
    import graft.operators.FlacCodec.LpcSub
    val left = Array.tabulate(512)(i => (i * 31 % 20000 - 10000).toShort)
    val right = Array.tabulate(512)(i => (i * 17 % 18000 - 9000).toShort)
    val flac = FlacCodec.encodeStereo(16000, left, right, 10,
      LpcSub(4), LpcSub(3))
    // flips across the frame: header region, QLP coefficient region,
    // residual region, trailer — all CRC-covered
    for (p <- Seq(46, 50, 60, 80, flac.length / 2, flac.length - 3)) {
      val bad = flac.clone()
      bad(p) = (bad(p) ^ 0x41).toByte
      val threw =
        try { FlacCodec.decodeSamplesMulti(1L, bad); false }
        catch { case _: IllegalArgumentException => true
          case _: ArrayIndexOutOfBoundsException => true
          case _: NegativeArraySizeException => true }
      assert(threw, s"flip at byte $p decoded silently")
    }
    intercept[IllegalArgumentException] {
      FlacCodec.decodeSamplesMulti(1L, flac.take(flac.length - 4))
    }
  }

  test("FLAC: compression is real and corruption is rejected loudly") {
    // a smooth ramp compresses far below raw PCM through the
    // order-2 predictor (constant second difference -> tiny residuals)
    val ramp = Array.tabulate(1024)(i => (i * 7 - 3000).toShort)
    val flac = FlacCodec.encode(16000, ramp, order = 2)
    assert(flac.length < ramp.length * 2 / 4,
      s"ramp should compress >4x, got ${flac.length} vs ${ramp.length * 2}")
    // every byte position in the frame region must be CRC-protected:
    // flipping any one fails the decode (header CRC-8, frame CRC-16,
    // or a structural require)
    val frames = Seq(flac.length - 20, flac.length - 3, 46, 50)
    frames.foreach { p =>
      val bad = flac.clone()
      bad(p) = (bad(p) ^ 0x41).toByte
      val threw =
        try { FlacCodec.decodeSamples(1L, bad); false }
        catch { case _: IllegalArgumentException => true
          case _: ArrayIndexOutOfBoundsException => true }
      assert(threw, s"flip at byte $p decoded silently")
    }
    // truncation
    intercept[IllegalArgumentException] {
      FlacCodec.decodeSamples(1L, flac.take(flac.length - 4))
    }
    // wrong magic
    val e = intercept[IllegalArgumentException] {
      FlacCodec.decodeSamples(1L, "not a flac stream at all".getBytes)
    }
    assert(e.getMessage.contains("not a FLAC"))
  }

  test("JPEG: any block-constant image round-trips exactly " +
    "(both subsampling modes, with and without restarts)") {
    import graft.operators.JpegCodec
    val gen = for {
      w <- Gen.choose(8, 48)
      h <- Gen.choose(8, 48)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
      sub <- Gen.oneOf(true, false)
      rst <- Gen.oneOf(0, 1, 2, 3)
    } yield (w, h, seed, sub, rst)
    // luma constant per 8x8; chroma constant per MCU (16px when
    // subsampled, 8px at 4:4:4) — the DC-exactness precondition
    check("jpeg block-constant round trip",
      Prop.forAll(gen) { case (w, h, seed, sub, rst) =>
        val mcu = if (sub) 16 else 8
        // floorMod: seed*3/seed*5 may overflow Long; channel values
        // must land in 0..255 regardless (and shrinking may hand us
        // a negative seed outside the generator's range)
        def m(v: Long) = java.lang.Math.floorMod(v, 256L).toInt
        def yv(bx: Int, by: Int) = m(seed + bx * 13L + by * 29L)
        def cb(mx: Int, my: Int) = m(seed * 3 + mx * 17L + my * 23L)
        def cr(mx: Int, my: Int) = m(seed * 5 + mx * 19L + my * 31L)
        val bytes = JpegCodec.encode(w, h,
          (x, y) => (yv(x / 8, y / 8), cb(x / mcu, y / mcu), cr(x / mcu, y / mcu)),
          subsample = sub, restartInterval = rst)
        val img = JpegCodec.decode(bytes)
        img.width == w && img.height == h &&
          (0 until h).forall(y => (0 until w).forall { x =>
            val i = y * w + x
            img.y(i) == yv(x / 8, y / 8) &&
              img.cb(i) == cb(x / mcu, y / mcu) &&
              img.cr(i) == cr(x / mcu, y / mcu)
          })
      })
  }

  test("AVI: any MJPEG frame sequence round-trips count, order, pixels") {
    import graft.operators.{AviCodec, JpegCodec}
    val gen = for {
      w <- Gen.choose(8, 32)
      h <- Gen.choose(8, 32)
      n <- Gen.choose(1, 5)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (w, h, n, seed)
    check("avi mjpeg round trip", Prop.forAll(gen) { case (w, h, n, seed) =>
      def yv(f: Int)(bx: Int, by: Int) =
        java.lang.Math.floorMod(seed + f * 37L + bx * 13L + by * 29L, 256L).toInt
      val frames = (0 until n).map { f =>
        JpegCodec.encode(w, h, (x, y) => (yv(f)(x / 8, y / 8), 128, 128))
      }
      val v = AviCodec.decode(AviCodec.encode(w, h, 10, frames))
      v.width == w && v.height == h && v.fps == 10 &&
        v.frames.length == n &&
        v.frames.indices.forall { f =>
          (0 until h).forall(y => (0 until w).forall(x =>
            v.frames(f).y(y * w + x) == yv(f)(x / 8, y / 8)))
        }
    })
  }

  test("gzip framing: any payload round-trips ours<->JDK both directions") {
    // the q100 hand-written RFC 1952 framing over reused contexts —
    // fixed cases live in MultimodalSpec; this pins the LAW on
    // arbitrary payloads (empty, binary, incompressible) in both
    // directions against the JDK's own GZIP streams
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val inf = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32()
    val tmp = new Array[Byte](8192)
    val buf = new Array[Byte](8192)
    val gen = Gen.choose(0, 5000).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)
    check("gzip framing", Prop.forAll(gen) { raw =>
      val ours = graft.operators.Multimodal.gzipFrame(
        deflater, crc, tmp, raw)
      val jdkIn = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(ours))
      val viaJdk = jdkIn.readAllBytes(); jdkIn.close()
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      val viaOurs = graft.operators.Multimodal.gunzipFrame(
        inf, buf, 0L, bos.toByteArray)
      viaJdk.sameElements(raw) && viaOurs.sameElements(raw)
    })
  }
}
