package graft.operators

/** REAL pure-JVM FLAC codec (PCM16, mono + stereo) — the lossless
  * COMPRESSED audio rung of the media ladder, next to [[PngCodec]] on
  * the image side. Everything here is the public FLAC bitstream
  * format (RFC 9639): `encode`/`encodeStereo` write a spec-valid
  * stream — fLaC magic, STREAMINFO metadata block, one frame with a
  * CRC-8-protected header, per-channel subframes (CONSTANT, VERBATIM,
  * FIXED orders 0–4, LPC orders 1–8 with Levinson-Durbin-derived
  * quantized coefficients) with Rice-coded residuals (4-bit
  * parameters, partition orders 0+), the four stereo channel
  * assignments (independent, left/side, right/side, mid/side — the
  * side channel carries bps+1 bits per the spec), zero-padding to
  * byte alignment, CRC-16 frame footer — and `decodeSamples` is a
  * strict bit-level parser of the same: it verifies the sync code,
  * both CRCs, and every reserved bit, reconstructs the signal through
  * the fixed-predictor recurrences / the LPC dot-product-and-shift
  * recurrence / the inter-channel decorrelation inverses, and fails
  * loudly on truncation or corruption. This is the actual
  * decompression path (unary/Rice bitreading + predictor
  * integration), not a container walk. The decoder accepts any
  * conforming stream within scope — LPC orders up to 32, either
  * channel layout — not just this encoder's output.
  *
  * Wasted bits (RFC 9639 §9.2.2) are handled on both sides: the
  * encoder detects a block's shared trailing-zero count and codes
  * the shifted-down signal at the narrower width; the decoder shifts
  * back up — the field real encoders emit for any quiet or
  * bit-reduced material.
  *
  * Scope bounds (rejected loudly, never mis-decoded): 16-bit, 1–2
  * channels, Rice method 0, non-negative LPC shifts.
  */
object FlacCodec {

  // ---- bit I/O ----------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def writeBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) { buf.write(acc); acc = 0; n = 0 }
    }
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def align(): Unit = while (n != 0) writeBit(0)
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); buf.toByteArray }
  }

  private final class BitReader(val data: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(docId: Long): Int = {
      require(pos < data.length, s"doc $docId: truncated FLAC stream")
      val b = (data(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def read(bits: Int, docId: Long): Long = {
      var v = 0L; var i = 0
      while (i < bits) { v = (v << 1) | readBit(docId); i += 1 }
      v
    }
    def readSigned(bits: Int, docId: Long): Long = {
      val v = read(bits, docId)
      if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) else v
    }
    def readUnary(docId: Long): Long = {
      var q = 0L
      while (readBit(docId) == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- CRCs (FLAC polynomials) ------------------------------------

  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
          else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- predictors -------------------------------------------------

  /** Residual of `x` under fixed order `k` (k warmup samples pass
    * through). Coefficients are the binomial differences the spec
    * fixes. */
  private def residual(x: Array[Int], k: Int): Array[Long] = {
    val r = new Array[Long](x.length - k)
    var i = k
    while (i < x.length) {
      r(i - k) = k match {
        case 0 => x(i)
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) -
          4L * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    r
  }

  /** LPC prediction at `i` under quantized coefficients: the spec's
    * 64-bit dot product and arithmetic right shift. Shared verbatim
    * by the encoder's residual computation and the decoder's
    * reconstruction — the same expression on both sides is what makes
    * the lossy-free round trip a tautology. */
  private def lpcPredict(x: Array[Int], i: Int, q: Array[Int],
      shift: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < q.length) { acc += q(j).toLong * x(i - 1 - j); j += 1 }
    acc >> shift
  }

  /** Levinson-Durbin forward predictor of `order` for signal `x`:
    * autocorrelation + the standard recursion, returning the real
    * coefficients a_j of x̂[i] = Σ a_j·x[i−1−j], or None when the
    * signal is numerically degenerate (constant/silence — the caller
    * falls back to a fixed predictor). Order ≤ 8 keeps this a few
    * hundred flops; the ROUND TRIP is exact for ANY coefficients
    * (the residual code inverts whatever the encoder used), so the
    * recursion only decides compression quality, which
    * CodecPropertySpec pins against verbatim size on a smooth
    * signal. */
  private def levinson(x: Array[Int], order: Int): Option[Array[Double]] = {
    val n = x.length
    // Welch-window the AUTOCORRELATION estimate (residuals are still
    // computed on the raw signal — standard practice): the rectangular
    // estimate's edge bias flattens the predictor noticeably (measured
    // on a 1024-sample sinusoid: mean |residual| 62 un-windowed vs 0.7
    // windowed at order 2), and the window costs one multiply per
    // sample at encode time only
    val c = (n - 1) / 2.0
    val xw = new Array[Double](n)
    var w = 0
    while (w < n) {
      val t = if (c == 0) 0.0 else (w - c) / c
      xw(w) = x(w) * (1.0 - t * t)
      w += 1
    }
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += xw(i) * xw(i - lag); i += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) <= 0.0) return None
    var err = ac(0)
    val a = new Array[Double](order)
    var m = 0
    while (m < order) {
      var acc = ac(m + 1)
      var j = 0
      while (j < m) { acc -= a(j) * ac(m - j); j += 1 }
      val k = acc / err
      // in-place order update: a_m[j] = a_{m-1}[j] − k·a_{m-1}[m−1−j]
      var lo = 0
      var hi = m - 1
      while (lo < hi) {
        val t = a(lo)
        a(lo) = t - k * a(hi)
        a(hi) = a(hi) - k * t
        lo += 1; hi -= 1
      }
      if (lo == hi) a(lo) = a(lo) - k * a(lo)
      a(m) = k
      err *= (1.0 - k * k)
      if (err <= 0.0 || err.isNaN) return None
      m += 1
    }
    Some(a)
  }

  /** QLP coefficient precision (bits incl. sign) this encoder emits. */
  private val QlpPrecision = 12

  /** Quantize real LPC coefficients: pick the largest non-negative
    * 5-bit shift that keeps every rounded coefficient inside the
    * precision, then round+clamp. */
  private def quantizeLpc(a: Array[Double]): (Array[Int], Int) = {
    val cmax = a.map(math.abs).max
    val lim = (1 << (QlpPrecision - 1)) - 1
    var shift =
      if (cmax <= 0) 0
      else QlpPrecision - 2 - (math.getExponent(cmax) max -1)
    if (shift > 15) shift = 15
    if (shift < 0) shift = 0
    val q = a.map { c =>
      val v = math.round(c * (1L << shift)).toInt
      math.max(-lim - 1, math.min(lim, v))
    }
    (q, shift)
  }

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Cheapest 4-bit Rice parameter for a residual slice by exact bit
    * cost (escape code 15 reserved — params stay ≤ 14). */
  private def bestRice(u: Array[Long], from: Int, until: Int): Int = {
    var bestK = 0; var bestCost = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var cost = 0L
      var i = from
      while (i < until) { cost += (u(i) >>> k) + 1 + k; i += 1 }
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    bestK
  }

  // ---- encode -----------------------------------------------------

  val SampleBits = 16

  /** Per-channel subframe choice for [[encodeStereo]]. */
  sealed trait SubframeSpec
  /** Cheapest FIXED order by residual magnitude (the historical
    * `order = -1`). */
  case object AutoSub extends SubframeSpec
  /** Pinned FIXED predictor order 0–4. */
  final case class FixedSub(order: Int) extends SubframeSpec
  /** LPC of `order` 1–8 (Levinson-Durbin + [[QlpPrecision]]-bit
    * quantization; falls back to the best fixed order on a
    * numerically degenerate signal). */
  final case class LpcSub(order: Int) extends SubframeSpec

  /** Encode a mono PCM16 signal as a single-frame FLAC stream.
    * `order` pins the fixed predictor (0–4; −1 = pick by residual
    * magnitude); `partitionOrder` must divide the block evenly. */
  def encode(sampleRate: Int, samples: Array[Short], order: Int = -1,
      partitionOrder: Int = 0): Array[Byte] =
    encodeSpec(sampleRate, samples,
      if (order >= 0) FixedSub(order) else AutoSub, partitionOrder)

  /** Mono encode with the full subframe menu (LPC included). */
  def encodeSpec(sampleRate: Int, samples: Array[Short],
      spec: SubframeSpec, partitionOrder: Int = 0): Array[Byte] = {
    require(samples.nonEmpty, "empty signal")
    encodeFrame(sampleRate, Array(samples.map(_.toInt)),
      Array(SampleBits), chanCode = 0, Array(spec), partitionOrder,
      streamChannels = 1, totalSamples = samples.length)
  }

  /** Encode a stereo PCM16 pair as a single-frame FLAC stream under
    * channel assignment `mode`: 1 = independent L/R, 8 = left/side,
    * 9 = right/side, 10 = mid/side (side = L−R at bps+1, mid =
    * (L+R)>>1 with the dropped bit recovered from the side's parity —
    * the spec's lossless decorrelation). `spec0`/`spec1` choose each
    * encoded channel's subframe. */
  def encodeStereo(sampleRate: Int, left: Array[Short],
      right: Array[Short], mode: Int, spec0: SubframeSpec = AutoSub,
      spec1: SubframeSpec = AutoSub,
      partitionOrder: Int = 0): Array[Byte] = {
    require(left.nonEmpty && left.length == right.length,
      "stereo encode needs equal-length non-empty channels")
    val n = left.length
    def side = Array.tabulate(n)(i => left(i).toInt - right(i).toInt)
    val (ch0, ch1, bits0, bits1) = mode match {
      case 1 => (left.map(_.toInt), right.map(_.toInt),
        SampleBits, SampleBits)
      case 8 => (left.map(_.toInt), side, SampleBits, SampleBits + 1)
      case 9 => (side, right.map(_.toInt), SampleBits + 1, SampleBits)
      case 10 => (Array.tabulate(n)(i =>
        (left(i).toInt + right(i).toInt) >> 1), side,
        SampleBits, SampleBits + 1)
      case other => throw new IllegalArgumentException(
        s"stereo mode $other (want 1, 8, 9 or 10)")
    }
    encodeFrame(sampleRate, Array(ch0, ch1), Array(bits0, bits1),
      chanCode = mode, Array(spec0, spec1), partitionOrder,
      streamChannels = 2, totalSamples = n)
  }

  private def encodeFrame(sampleRate: Int, chans: Array[Array[Int]],
      chanBits: Array[Int], chanCode: Int, specs: Array[SubframeSpec],
      partitionOrder: Int, streamChannels: Int,
      totalSamples: Int): Array[Byte] = {
    require(totalSamples < (1 << 16), "single-frame encoder: n < 65536")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag + type 0, length 34
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(totalSamples.toLong, 16) // min block size
    si.write(totalSamples.toLong, 16) // max block size
    si.write(0, 24); si.write(0, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write(streamChannels.toLong - 1, 3)
    si.write(SampleBits - 1, 5)
    si.write(totalSamples.toLong, 36)
    si.write(0, 64); si.write(0, 64) // MD5 unset
    out.write(si.bytes)

    // frame header
    val fw = new BitWriter
    fw.write(0x3FFE, 14) // sync
    fw.write(0, 1) // reserved
    fw.write(0, 1) // fixed-blocksize strategy
    fw.write(0x7, 4) // block size: 16-bit at end of header
    fw.write(0, 4) // sample rate: from STREAMINFO
    fw.write(chanCode.toLong, 4) // channel assignment
    fw.write(4, 3) // sample size: 16 bits (0b100)
    fw.write(0, 1) // reserved
    fw.write(0, 8) // coded frame number 0 (single frame)
    fw.write(totalSamples.toLong - 1, 16)
    val headerBytes = fw.bytes
    fw.write(crc8(headerBytes, 0, headerBytes.length), 8)

    var c = 0
    while (c < chans.length) {
      writeSubframe(fw, chans(c), chanBits(c), specs(c), partitionOrder)
      c += 1
    }
    fw.align()
    val frameBytes = fw.bytes
    fw.write(crc16(frameBytes, 0, frameBytes.length), 16)
    out.write(fw.bytes)
    out.toByteArray
  }

  /** Wasted-bits subframe-header field: flag 0, or flag 1 followed
    * by unary-coded k−1 (RFC 9639 §9.2.2). */
  private def writeWastedFlag(fw: BitWriter, wasted: Int): Unit =
    if (wasted == 0) fw.write(0, 1)
    else { fw.write(1, 1); fw.writeUnary(wasted - 1L) }

  /** One subframe: header, warmup at the channel's bit width, then
    * partitioned Rice residuals. LPC falls back to the best FIXED
    * order when Levinson degenerates (constant signal). Wasted bits
    * are detected automatically (the shared trailing-zero count of
    * every sample — real encoders do the same): the subframe codes
    * the shifted-down signal at a narrower width and the decoder
    * shifts back up. */
  private def writeSubframe(fw: BitWriter, x0: Array[Int], bits0: Int,
      spec0: SubframeSpec, partitionOrder: Int): Unit = {
    // shared trailing zeros (0 for an all-zero signal — CONSTANT 0
    // codes fine without the wasted-bits machinery)
    var orAll = 0
    var w = 0
    while (w < x0.length) { orAll |= x0(w); w += 1 }
    val wasted =
      if (orAll == 0) 0
      else math.min(java.lang.Integer.numberOfTrailingZeros(orAll),
        bits0 - 1)
    val x = if (wasted == 0) x0 else x0.map(_ >> wasted)
    val bits = bits0 - wasted
    val mask = (1L << bits) - 1
    def bestFixed: Int = (0 to 4).filter(_ < x.length).minBy { o =>
      residual(x, o).map(r => math.abs(r)).sum
    }
    val (spec, lpcQ) = spec0 match {
      case AutoSub => (FixedSub(bestFixed), None)
      case f @ FixedSub(k) =>
        require(k >= 0 && k <= 4, s"fixed order $k"); (f, None)
      case l @ LpcSub(ord) =>
        require(ord >= 1 && ord <= 8, s"LPC order $ord (encoder scope)")
        require(x.length > ord, s"order $ord needs > $ord samples")
        levinson(x, ord) match {
          case Some(a) => (l, Some(quantizeLpc(a)))
          case None => (FixedSub(bestFixed), None)
        }
    }
    val parts = 1 << partitionOrder
    val order = spec match {
      case FixedSub(k) => k
      case LpcSub(o) => o
      case AutoSub => 0 // unreachable
    }
    require(x.length > order, s"order $order needs > $order samples")
    require(x.length % parts == 0 && x.length / parts > order,
      s"partition order $partitionOrder does not fit ${x.length} samples")

    fw.write(0, 1) // pad
    val u: Array[Long] = spec match {
      case FixedSub(k) =>
        fw.write(8 + k, 6) // type 0b001000 + k
        writeWastedFlag(fw, wasted)
        var i = 0
        while (i < k) { fw.write(x(i).toLong & mask, bits); i += 1 }
        residual(x, k).map(zigzag)
      case LpcSub(ord) =>
        fw.write(32 + (ord - 1), 6) // type 0b100000 | (order−1)
        writeWastedFlag(fw, wasted)
        var i = 0
        while (i < ord) { fw.write(x(i).toLong & mask, bits); i += 1 }
        val (q, shift) = lpcQ.get
        fw.write(QlpPrecision.toLong - 1, 4)
        fw.write(shift.toLong & 0x1F, 5)
        var j = 0
        while (j < ord) {
          fw.write(q(j).toLong & ((1L << QlpPrecision) - 1), QlpPrecision)
          j += 1
        }
        val r = new Array[Long](x.length - ord)
        i = ord
        while (i < x.length) {
          r(i - ord) = x(i).toLong - lpcPredict(x, i, q, shift)
          i += 1
        }
        r.map(zigzag)
      case AutoSub => throw new IllegalStateException("resolved above")
    }
    fw.write(0, 2) // Rice method 0 (4-bit params)
    fw.write(partitionOrder.toLong, 4)
    val perPart = x.length / parts
    var p = 0
    var uPos = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      val rice = bestRice(u, uPos, uPos + count)
      fw.write(rice.toLong, 4)
      var j = 0
      while (j < count) {
        val v = u(uPos + j)
        fw.writeUnary(v >>> rice)
        if (rice > 0) fw.write(v & ((1L << rice) - 1), rice)
        j += 1
      }
      uPos += count
      p += 1
    }
  }

  // ---- decode -----------------------------------------------------

  /** Decode a PCM16 FLAC stream produced by any spec-conforming
    * encoder within this codec's scope: (sampleRate, channels,
    * channel-interleaved samples). Verifies magic, both CRCs,
    * reserved bits, and sample-count consistency. */
  def decodeSamplesMulti(docId: Long,
      bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 4 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC",
      s"doc $docId: not a FLAC stream")
    val br = new BitReader(bytes, 4)
    // metadata blocks
    var sampleRate = -1; var totalSamples = -1L; var nChannels = -1
    var last = false
    var seenStreamInfo = false
    while (!last) {
      last = br.readBit(docId) == 1
      val typ = br.read(7, docId).toInt
      val len = br.read(24, docId).toInt
      if (typ == 0) {
        require(len == 34, s"doc $docId: STREAMINFO length $len")
        br.read(16, docId); br.read(16, docId)
        br.read(24, docId); br.read(24, docId)
        sampleRate = br.read(20, docId).toInt
        nChannels = br.read(3, docId).toInt + 1
        val bps = br.read(5, docId).toInt + 1
        require(nChannels <= 2 && bps == SampleBits,
          s"doc $docId: only 1-2 channel 16-bit supported " +
            s"($nChannels ch, $bps bps)")
        totalSamples = br.read(36, docId)
        br.read(64, docId); br.read(64, docId)
        seenStreamInfo = true
      } else {
        var skip = 0
        while (skip < len) { br.read(8, docId); skip += 1 }
      }
    }
    require(seenStreamInfo, s"doc $docId: missing STREAMINFO")
    // RFC 9639 allows total_samples = 0 meaning "unknown" — a
    // conforming stream this decoder must not silently treat as
    // empty (round-16 ADVICE): frame-walking to EOF is out of scope,
    // so fail loudly like every other scope bound
    require(totalSamples > 0,
      s"doc $docId: STREAMINFO total_samples = 0 (unknown length) " +
        "unsupported — this decoder requires a declared sample count")

    val outSamples = new Array[Short]((totalSamples * nChannels).toInt)
    var written = 0
    while (written < totalSamples) {
      val frameStart = br.bytePos
      require(br.aligned, s"doc $docId: frame not byte-aligned")
      require(br.read(14, docId) == 0x3FFE, s"doc $docId: bad frame sync")
      require(br.readBit(docId) == 0, s"doc $docId: reserved bit set")
      br.readBit(docId) // blocking strategy
      val bsCode = br.read(4, docId).toInt
      val srCode = br.read(4, docId).toInt
      val chan = br.read(4, docId).toInt
      val ssCode = br.read(3, docId).toInt
      require(br.readBit(docId) == 0, s"doc $docId: reserved bit set")
      val frameChannels = chan match {
        case 0 => 1
        case 1 => 2
        case 8 | 9 | 10 => 2 // left/side, right/side, mid/side
        case other => throw new IllegalArgumentException(
          s"requirement failed: doc $docId: unsupported channel " +
            s"assignment $other")
      }
      require(frameChannels == nChannels,
        s"doc $docId: frame channels $frameChannels vs STREAMINFO "
          + s"$nChannels")
      require(ssCode == 4, s"doc $docId: only 16-bit frames supported")
      // coded number: UTF-8-style, 1–7 bytes
      val first = br.read(8, docId).toInt
      var extra = 0
      var f = first
      while ((f & 0x80) != 0) { extra += 1; f <<= 1 }
      if (extra > 0) {
        // a 0b10xxxxxx first byte is a bare continuation — invalid
        require(extra >= 2, s"doc $docId: malformed coded number")
        var e = 0
        while (e < extra - 1) {
          require((br.read(8, docId).toInt & 0xC0) == 0x80,
            s"doc $docId: malformed coded number continuation")
          e += 1
        }
      }
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.read(8, docId).toInt + 1
        case 7 => br.read(16, docId).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case other =>
          throw new IllegalArgumentException(
            s"requirement failed: doc $docId: reserved block size $other")
      }
      if (srCode == 12) br.read(8, docId)
      else if (srCode == 13 || srCode == 14) br.read(16, docId)
      else require(srCode < 12, s"doc $docId: invalid sample rate code")
      val headCrc = crc8(bytes, frameStart, br.bytePos)
      require(br.read(8, docId).toInt == headCrc,
        s"doc $docId: frame header CRC-8 mismatch")

      // per-channel subframes — the side channel reads bps+1 bits
      // (left/side and mid/side carry it second, right/side first)
      val ch0Bits = SampleBits + (if (chan == 9) 1 else 0)
      val ch1Bits = SampleBits + (if (chan == 8 || chan == 10) 1 else 0)
      val sub0 = decodeSubframe(br, blockSize, ch0Bits, docId)
      val sub1 =
        if (frameChannels == 2) decodeSubframe(br, blockSize, ch1Bits, docId)
        else null
      br.align()
      val frameCrc = crc16(bytes, frameStart, br.bytePos)
      require(br.read(16, docId).toInt == frameCrc,
        s"doc $docId: frame CRC-16 mismatch")
      require(written + blockSize <= totalSamples,
        s"doc $docId: frames exceed STREAMINFO total")

      // inter-channel reconstruction + range check
      def emit(i: Int, l: Long, r: Long): Unit = {
        require(l >= Short.MinValue && l <= Short.MaxValue &&
          (frameChannels == 1 ||
            (r >= Short.MinValue && r <= Short.MaxValue)),
          s"doc $docId: decoded sample out of 16-bit range")
        val base = (written + i) * nChannels
        outSamples(base) = l.toShort
        if (frameChannels == 2) outSamples(base + 1) = r.toShort
      }
      var i = 0
      while (i < blockSize) {
        chan match {
          case 0 => emit(i, sub0(i), 0L)
          case 1 => emit(i, sub0(i), sub1(i))
          case 8 => // left/side: R = L − side
            emit(i, sub0(i), sub0(i).toLong - sub1(i))
          case 9 => // right/side: L = R + side
            emit(i, sub1(i).toLong + sub0(i), sub1(i))
          case 10 => // mid/side: the dropped low bit of L+R is the
            // side's parity (spec reconstruction)
            val m2 = (sub0(i).toLong << 1) | (sub1(i).toLong & 1L)
            emit(i, (m2 + sub1(i)) >> 1, (m2 - sub1(i)) >> 1)
        }
        i += 1
      }
      written += blockSize
    }
    (sampleRate, nChannels, outSamples)
  }

  /** One subframe at channel width `bits`: CONSTANT, VERBATIM, FIXED
    * 0–4, or LPC 1–32. Values are returned pre-decorrelation (a side
    * channel's 17-bit range is legal here; the 16-bit range check
    * happens after inter-channel reconstruction). */
  private def decodeSubframe(br: BitReader, blockSize: Int, bits0: Int,
      docId: Long): Array[Int] = {
    require(br.readBit(docId) == 0, s"doc $docId: subframe pad bit set")
    val sfType = br.read(6, docId).toInt
    // wasted bits (RFC 9639 §9.2.2): flag 1 ⇒ unary-coded k−1
    // follows; the subframe is coded at bits−k and every decoded
    // sample shifts left by k at the end — real encoders emit this
    // whenever a block's samples share trailing zero bits
    val wasted =
      if (br.readBit(docId) == 1) (br.readUnary(docId) + 1).toInt
      else 0
    require(wasted < bits0,
      s"doc $docId: $wasted wasted bits leave no sample bits")
    val bits = bits0 - wasted
    val block = new Array[Int](blockSize)

    /** Partitioned Rice residuals integrated through `predict`. */
    def readResiduals(order: Int)(predict: Int => Long): Unit = {
      require(br.read(2, docId) == 0,
        s"doc $docId: only Rice method 0 supported")
      val pOrder = br.read(4, docId).toInt
      val parts = 1 << pOrder
      require(blockSize % parts == 0,
        s"doc $docId: partition order $pOrder vs block $blockSize")
      val perPart = blockSize / parts
      // the first partition carries perPart − order residuals, which
      // the spec allows to be zero but never negative
      require(perPart >= order,
        s"doc $docId: partition order $pOrder vs predictor order $order")
      var idx = order
      var p = 0
      while (p < parts) {
        val rice = br.read(4, docId).toInt
        require(rice <= 14,
          s"doc $docId: Rice escape codes unsupported")
        val count = if (p == 0) perPart - order else perPart
        var j = 0
        while (j < count) {
          val q = br.readUnary(docId)
          val rem = if (rice > 0) br.read(rice, docId) else 0L
          val r = unzigzag((q << rice) | rem)
          val v = r + predict(idx)
          require(v >= Int.MinValue && v <= Int.MaxValue,
            s"doc $docId: decoded value overflows")
          block(idx) = v.toInt
          idx += 1; j += 1
        }
        p += 1
      }
    }

    sfType match {
      case 0 => // CONSTANT
        val v = br.readSigned(bits, docId).toInt
        java.util.Arrays.fill(block, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) {
          block(i) = br.readSigned(bits, docId).toInt; i += 1
        }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val k = t - 8
        require(k <= blockSize, s"doc $docId: order $k vs block $blockSize")
        var i = 0
        while (i < k) {
          block(i) = br.readSigned(bits, docId).toInt; i += 1
        }
        readResiduals(k) { idx =>
          k match {
            case 0 => 0L
            case 1 => block(idx - 1).toLong
            case 2 => 2L * block(idx - 1) - block(idx - 2)
            case 3 => 3L * block(idx - 1) - 3L * block(idx - 2) +
              block(idx - 3)
            case 4 => 4L * block(idx - 1) - 6L * block(idx - 2) +
              4L * block(idx - 3) - block(idx - 4)
          }
        }
      case t if t >= 32 => // LPC order 1–32
        val ord = t - 31
        require(ord <= blockSize,
          s"doc $docId: LPC order $ord vs block $blockSize")
        var i = 0
        while (i < ord) {
          block(i) = br.readSigned(bits, docId).toInt; i += 1
        }
        val precM1 = br.read(4, docId).toInt
        require(precM1 != 15,
          s"doc $docId: invalid QLP precision escape")
        val prec = precM1 + 1
        val shift = br.readSigned(5, docId).toInt
        require(shift >= 0,
          s"doc $docId: negative LPC shift is reserved")
        val q = new Array[Int](ord)
        var j = 0
        while (j < ord) { q(j) = br.readSigned(prec, docId).toInt; j += 1 }
        readResiduals(ord)(idx => lpcPredict(block, idx, q, shift))
      case other =>
        throw new IllegalArgumentException(
          s"requirement failed: doc $docId: unsupported subframe " +
            s"type $other")
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { block(i) = block(i) << wasted; i += 1 }
    }
    block
  }

  /** Mono-shaped compatibility decode: (sampleRate, samples).
    * Stereo streams decode fine — the result is channel-interleaved
    * (the [[decodeSamplesMulti]] layout with the channel count
    * dropped); mono-law callers ([[ForeignMedia]]) feed it mono
    * streams only. */
  def decodeSamples(docId: Long, bytes: Array[Byte]): (Int, Array[Short]) = {
    val (rate, _, samples) = decodeSamplesMulti(docId, bytes)
    (rate, samples)
  }

  /** Feature decode matching [[Multimodal.WavCodec.decode]]'s
    * quantities (no `n_bytes` — compressed size is codec-dependent).
    * `n_samples` is per-channel (inter-channel samples); rms/peak
    * aggregate over every channel's samples. */
  def decode(docId: Long, bytes: Array[Byte]): Multimodal.FlacFeature = {
    val (rate, channels, data) = decodeSamplesMulti(docId, bytes)
    var sumSq = BigInt(0); var peak = 0
    data.foreach { s =>
      val v = s.toInt
      sumSq += BigInt(v.toLong * v)
      if (math.abs(v) > peak) peak = math.abs(v)
    }
    val n = data.length // across channels
    val rms =
      if (n == 0) 0.0
      else math.floor(math.sqrt(sumSq.toDouble / n) * 1e6 + 0.5) / 1e6
    Multimodal.FlacFeature(docId, rate, channels, n / channels.max(1),
      (n / channels.max(1)).toLong * 1000000L / rate, rms, peak)
  }
}
