package graft.operators

/** REAL pure-JVM FLAC codec (mono PCM16) — the lossless COMPRESSED
  * audio rung of the media ladder, next to [[PngCodec]] on the image
  * side. Everything here is the public FLAC bitstream format
  * (RFC 9639): `encode` writes a spec-valid stream — fLaC magic,
  * STREAMINFO metadata block, one frame with a CRC-8-protected
  * header, a FIXED-predictor subframe (orders 0–4) with Rice-coded
  * residuals (4-bit parameters, partition orders 0+), zero-padding
  * to byte alignment, CRC-16 frame footer — and `decode` is a strict
  * bit-level parser of the same: it verifies the sync code, both
  * CRCs, and every reserved bit, reconstructs the signal through the
  * fixed-predictor recurrences, and fails loudly on truncation or
  * corruption. This is the actual decompression path (unary/Rice
  * bitreading + predictor integration), not a container walk.
  *
  * Scope bounds (rejected loudly, never mis-decoded): mono, 16-bit,
  * CONSTANT/VERBATIM/FIXED subframes (no LPC), Rice method 0. The
  * encoder picks the cheapest Rice parameter per partition by exact
  * bit cost and the best fixed order by residual magnitude unless
  * the caller pins one — property tests drive all five orders and
  * multi-partition layouts through the round trip.
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

  // ---- fixed predictors -------------------------------------------

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

  /** Encode a mono PCM16 signal as a single-frame FLAC stream.
    * `order` pins the fixed predictor (0–4; −1 = pick by residual
    * magnitude); `partitionOrder` must divide the block evenly. */
  def encode(sampleRate: Int, samples: Array[Short], order: Int = -1,
      partitionOrder: Int = 0): Array[Byte] = {
    require(samples.nonEmpty, "empty signal")
    require(samples.length < (1 << 16), "single-frame encoder: n < 65536")
    val x = samples.map(_.toInt)
    val k =
      if (order >= 0) { require(order <= 4); order }
      else (0 to 4).filter(_ < x.length).minBy { o =>
        residual(x, o).map(r => math.abs(r)).sum
      }
    require(x.length > k, s"order $k needs > $k samples")
    val parts = 1 << partitionOrder
    require(x.length % parts == 0 && x.length / parts > k,
      s"partition order $partitionOrder does not fit ${x.length} samples")

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag + type 0, length 34
    val si = new BitWriter
    si.write(1, 1); si.write(0, 7); si.write(34, 24)
    si.write(x.length.toLong, 16) // min block size
    si.write(x.length.toLong, 16) // max block size
    si.write(0, 24); si.write(0, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write(0, 3) // channels - 1
    si.write(SampleBits - 1, 5)
    si.write(x.length.toLong, 36)
    si.write(0, 64); si.write(0, 64) // MD5 unset
    out.write(si.bytes)

    // frame
    val fw = new BitWriter
    fw.write(0x3FFE, 14) // sync
    fw.write(0, 1) // reserved
    fw.write(0, 1) // fixed-blocksize strategy
    fw.write(0x7, 4) // block size: 16-bit at end of header
    fw.write(0, 4) // sample rate: from STREAMINFO
    fw.write(0, 4) // channels: mono
    fw.write(4, 3) // sample size: 16 bits (0b100)
    fw.write(0, 1) // reserved
    fw.write(0, 8) // coded frame number 0 (single frame)
    fw.write(x.length.toLong - 1, 16)
    val headerBytes = fw.bytes
    fw.write(crc8(headerBytes, 0, headerBytes.length), 8)

    // subframe: FIXED order k
    fw.write(0, 1) // pad
    fw.write(8 + k, 6) // type
    fw.write(0, 1) // no wasted bits
    var i = 0
    while (i < k) { fw.write(x(i).toLong & 0xFFFF, SampleBits); i += 1 }
    val u = residual(x, k).map(zigzag)
    fw.write(0, 2) // Rice method 0 (4-bit params)
    fw.write(partitionOrder.toLong, 4)
    val perPart = x.length / parts
    var p = 0
    var uPos = 0
    while (p < parts) {
      val count = if (p == 0) perPart - k else perPart
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
    fw.align()
    val frameBytes = fw.bytes
    fw.write(crc16(frameBytes, 0, frameBytes.length), 16)
    out.write(fw.bytes)
    out.toByteArray
  }

  // ---- decode -----------------------------------------------------

  /** Decode a mono PCM16 FLAC stream produced by any spec-conforming
    * encoder within this codec's scope. Verifies magic, both CRCs,
    * reserved bits, and sample-count consistency. */
  def decodeSamples(docId: Long, bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 4 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC",
      s"doc $docId: not a FLAC stream")
    val br = new BitReader(bytes, 4)
    // metadata blocks
    var sampleRate = -1; var totalSamples = -1L
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
        val channels = br.read(3, docId).toInt + 1
        val bps = br.read(5, docId).toInt + 1
        require(channels == 1 && bps == SampleBits,
          s"doc $docId: only mono 16-bit supported " +
            s"($channels ch, $bps bps)")
        totalSamples = br.read(36, docId)
        br.read(64, docId); br.read(64, docId)
        seenStreamInfo = true
      } else {
        var skip = 0
        while (skip < len) { br.read(8, docId); skip += 1 }
      }
    }
    require(seenStreamInfo, s"doc $docId: missing STREAMINFO")

    val outSamples = new Array[Short](totalSamples.toInt)
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
      require(chan == 0, s"doc $docId: only mono frames supported")
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

      // one mono subframe
      require(br.readBit(docId) == 0, s"doc $docId: subframe pad bit set")
      val sfType = br.read(6, docId).toInt
      require(br.readBit(docId) == 0,
        s"doc $docId: wasted bits unsupported")
      val block = new Array[Int](blockSize)
      sfType match {
        case 0 => // CONSTANT
          val v = br.readSigned(SampleBits, docId).toInt
          java.util.Arrays.fill(block, v)
        case 1 => // VERBATIM
          var i = 0
          while (i < blockSize) {
            block(i) = br.readSigned(SampleBits, docId).toInt; i += 1
          }
        case t if t >= 8 && t <= 12 => // FIXED order 0-4
          val k = t - 8
          var i = 0
          while (i < k) {
            block(i) = br.readSigned(SampleBits, docId).toInt; i += 1
          }
          require(br.read(2, docId) == 0,
            s"doc $docId: only Rice method 0 supported")
          val pOrder = br.read(4, docId).toInt
          val parts = 1 << pOrder
          require(blockSize % parts == 0,
            s"doc $docId: partition order $pOrder vs block $blockSize")
          val perPart = blockSize / parts
          var idx = k
          var p = 0
          while (p < parts) {
            val rice = br.read(4, docId).toInt
            require(rice <= 14,
              s"doc $docId: Rice escape codes unsupported")
            val count = if (p == 0) perPart - k else perPart
            var j = 0
            while (j < count) {
              val q = br.readUnary(docId)
              val rem = if (rice > 0) br.read(rice, docId) else 0L
              val r = unzigzag((q << rice) | rem)
              val v = k match {
                case 0 => r
                case 1 => r + block(idx - 1)
                case 2 => r + 2L * block(idx - 1) - block(idx - 2)
                case 3 => r + 3L * block(idx - 1) - 3L * block(idx - 2) +
                  block(idx - 3)
                case 4 => r + 4L * block(idx - 1) - 6L * block(idx - 2) +
                  4L * block(idx - 3) - block(idx - 4)
              }
              block(idx) = v.toInt
              idx += 1; j += 1
            }
            p += 1
          }
        case other =>
          throw new IllegalArgumentException(
            s"requirement failed: doc $docId: unsupported subframe " +
              s"type $other (LPC not in scope)")
      }
      br.align()
      val frameCrc = crc16(bytes, frameStart, br.bytePos)
      require(br.read(16, docId).toInt == frameCrc,
        s"doc $docId: frame CRC-16 mismatch")
      require(written + blockSize <= totalSamples,
        s"doc $docId: frames exceed STREAMINFO total")
      var i = 0
      while (i < blockSize) {
        val v = block(i)
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"doc $docId: decoded sample $v out of 16-bit range")
        outSamples(written + i) = v.toShort
        i += 1
      }
      written += blockSize
    }
    (sampleRate, outSamples)
  }

  /** Feature decode matching [[Multimodal.WavCodec.decode]]'s
    * quantities (no `n_bytes` — compressed size is codec-dependent). */
  def decode(docId: Long, bytes: Array[Byte]): Multimodal.FlacFeature = {
    val (rate, data) = decodeSamples(docId, bytes)
    var sumSq = BigInt(0); var peak = 0
    data.foreach { s =>
      val v = s.toInt
      sumSq += BigInt(v.toLong * v)
      if (math.abs(v) > peak) peak = math.abs(v)
    }
    val n = data.length
    val rms =
      if (n == 0) 0.0
      else math.floor(math.sqrt(sumSq.toDouble / n) * 1e6 + 0.5) / 1e6
    Multimodal.FlacFeature(docId, rate, n,
      n.toLong * 1000000L / rate, rms, peak)
  }
}
