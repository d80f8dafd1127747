package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL pure-JVM PNG codec — the compressed-image rung of the media
  * ladder ([[Multimodal.BmpCodec]] covers the uncompressed one).
  * Everything here is public-spec PNG (RFC 2083 / ISO 15948) over
  * public JDK zlib (`java.util.zip.Deflater`/`Inflater`) — no image
  * library.
  *
  * Scope: critical chunks only (IHDR / IDAT / IEND), 8-bit-depth
  * truecolor RGB (color type 2), no interlace — the exact subset the
  * synthesized corpora need, with every unsupported header field
  * rejected loudly rather than mis-decoded.
  *
  * `encode` deliberately picks a DIFFERENT filter per row
  * (`y mod 5` → None/Sub/Up/Average/Paeth) and splits the compressed
  * stream across two IDAT chunks: a round-trip gate through this
  * encoder therefore proves the decoder's unfilter logic for ALL
  * five filter types and its multi-IDAT reassembly, not just the
  * trivial filter-0 path. `decode` is a strict chunk WALKER: it
  * checks the 8-byte signature, verifies every chunk's CRC32,
  * requires IHDR first and IEND last, concatenates IDAT payloads in
  * order, inflates, and unfilters row by row — truncation, CRC
  * corruption, or an unsupported color type / bit depth / interlace
  * method fails loudly (the properties CodecPropertySpec pins).
  */
object PngCodec {
  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private val Bpp = 3 // bytes per pixel: 8-bit RGB

  // ---- encode ----------------------------------------------------

  /** Render `pixel(x, y) = (r, g, b)` into a spec-valid PNG byte
    * stream. Filter type for row y is `y mod 5`, so any image ≥ 5
    * rows tall exercises every filter; the deflate stream is split
    * across two IDAT chunks when it is ≥ 2 bytes long. */
  def encode(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims $width x $height")
    val stride = width * Bpp
    // raw scanlines, then per-row filtering into the zlib input
    val raw = Array.ofDim[Byte](height, stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        raw(y)(x * 3) = r.toByte
        raw(y)(x * 3 + 1) = g.toByte
        raw(y)(x * 3 + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val filtered = new Array[Byte]((stride + 1) * height)
    y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (stride + 1)) = ft.toByte
      val out = y * (stride + 1) + 1
      val cur = raw(y)
      val pri = if (y > 0) raw(y - 1) else null
      var i = 0
      while (i < stride) {
        val x = cur(i) & 0xFF
        val a = if (i >= Bpp) cur(i - Bpp) & 0xFF else 0 // left
        val b = if (pri != null) pri(i) & 0xFF else 0    // up
        val c = if (i >= Bpp && pri != null) pri(i - Bpp) & 0xFF else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        filtered(out + i) = f.toByte
        i += 1
      }
      y += 1
    }
    // thread-reused native zlib state (the q107 lesson: per-image
    // Deflater allocation is invisible churn on a quiet heap and
    // brutal under suite pressure); reset() re-arms a dirty context
    val deflater = sharedDeflater.get()
    deflater.reset()
    deflater.setInput(filtered)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    val z = zbuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte)  // compression: deflate
    ihdr.put(0.toByte)  // filter method 0
    ihdr.put(0.toByte)  // no interlace
    writeChunk(out, "IHDR", ihdr.array())
    // split IDAT to force multi-chunk reassembly in every round trip
    if (z.length >= 2) {
      val cut = z.length / 2
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    } else writeChunk(out, "IDAT", z)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
      typ: String, data: Array[Byte]): Unit = {
    val t = typ.getBytes("US-ASCII")
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---- decode ----------------------------------------------------

  /** Walk every pixel top-down row-major, calling `f(r, g, b)`;
    * returns (width, height). Same visit order as
    * [[Multimodal.BmpCodec.forEachPixel]], so content digests are
    * container-format-agnostic. */
  private def forEachPixel(docId: Long, bytes: Array[Byte])(
      f: (Int, Int, Int) => Unit): (Int, Int) = {
    require(bytes.length >= Signature.length + 12 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(bytes, Signature.length), Signature),
      s"doc $docId: not a PNG file")
    var pos = Signature.length
    var width = -1; var height = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length && !seenIend) {
      require(bytes.length - pos >= 12,
        s"doc $docId: truncated chunk header at $pos")
      val len = readInt(bytes, pos)
      require(len >= 0 && bytes.length - pos - 12 >= len,
        s"doc $docId: truncated chunk ($len declared, " +
          s"${bytes.length - pos - 12} left)")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == readInt(bytes, pos + 8 + len),
        s"doc $docId: CRC mismatch in '$typ' chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, s"doc $docId: duplicate IHDR")
          require(len == 13, s"doc $docId: IHDR length $len")
          val d = pos + 8
          width = readInt(bytes, d)
          height = readInt(bytes, d + 4)
          require(width > 0 && height > 0,
            s"doc $docId: bad dims $width x $height")
          val depth = bytes(d + 8) & 0xFF
          val color = bytes(d + 9) & 0xFF
          require(depth == 8 && color == 2,
            s"doc $docId: only 8-bit RGB supported " +
              s"(depth $depth, color type $color)")
          require((bytes(d + 10) & 0xFF) == 0,
            s"doc $docId: unknown compression ${bytes(d + 10)}")
          require((bytes(d + 11) & 0xFF) == 0,
            s"doc $docId: unknown filter method ${bytes(d + 11)}")
          require((bytes(d + 12) & 0xFF) == 0,
            s"doc $docId: interlaced PNG unsupported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, s"doc $docId: IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => // ancillary (tEXt/pHYs/…): skip
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, s"doc $docId: missing IHDR or IEND")

    val stride = width * Bpp
    val expected = (stride + 1) * height
    val rawAll = inflate(docId, idat.toByteArray, expected)

    var prior: Array[Byte] = null
    val recon = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val ft = rawAll(rowOff) & 0xFF
      require(ft <= 4, s"doc $docId: unknown filter type $ft in row $y")
      var i = 0
      while (i < stride) {
        val x = rawAll(rowOff + 1 + i) & 0xFF
        val a = if (i >= Bpp) recon(i - Bpp) & 0xFF else 0
        val b = if (prior != null) prior(i) & 0xFF else 0
        val c = if (i >= Bpp && prior != null) prior(i - Bpp) & 0xFF else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }
        recon(i) = v.toByte
        i += 1
      }
      var px = 0
      while (px < width) {
        f(recon(px * 3) & 0xFF, recon(px * 3 + 1) & 0xFF,
          recon(px * 3 + 2) & 0xFF)
        px += 1
      }
      prior = recon.clone()
      y += 1
    }
    (width, height)
  }

  private def readInt(bytes: Array[Byte], pos: Int): Int =
    ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
      ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)

  /** Thread-reused zlib contexts — Deflater/Inflater hold native
    * state, and allocating one per image is the q107 churn pattern;
    * executor threads are a bounded pool, so a thread-local pair ends
    * the per-row allocation without any API change. reset() at each
    * use re-arms a context a prior failure left dirty. */
  private val sharedDeflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION)
  }
  private val sharedInflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  private def inflate(docId: Long, z: Array[Byte],
      expected: Int): Array[Byte] = {
    val inf = sharedInflater.get()
    inf.reset()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      require(n > 0 || !inf.needsInput(),
        s"doc $docId: truncated IDAT stream ($off of $expected bytes)")
      if (n == 0 && inf.needsInput()) // ran out of compressed input
        throw new IllegalArgumentException(
          s"requirement failed: doc $docId: truncated IDAT stream " +
            s"($off of $expected bytes)")
      off += n
    }
    require(off == expected,
      s"doc $docId: IDAT inflated to $off bytes, expected $expected")
    out
  }

  /** Feature decode — [[Multimodal.BmpCodec.decode]]'s shape for
    * PNG. `n_bytes` is the container size (compression-dependent, so
    * the arithmetic oracle checks the DECODED quantities only). */
  def decode(docId: Long, bytes: Array[Byte]): Multimodal.PngFeature = {
    var sr = 0L; var sg = 0L; var sb = 0L
    val (width, height) = forEachPixel(docId, bytes) { (r, g, b) =>
      sr += r; sg += g; sb += b
    }
    val n = width.toLong * height
    def mean(s: Long) = math.floor(s.toDouble / n * 1e6 + 0.5) / 1e6
    Multimodal.PngFeature(docId, width, height,
      mean(sr), mean(sg), mean(sb))
  }

  /** Full pixel decode: (width, height, packed 0xRRGGBB, top-down
    * row-major) — for the aHash block walk. */
  def decodePixels(docId: Long,
      bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val buf = scala.collection.mutable.ArrayBuilder.make[Int]
    val (w, h) = forEachPixel(docId, bytes) { (r, g, b) =>
      buf += (r << 16) | (g << 8) | b
    }
    (w, h, buf.result())
  }

  /** Content digest over decoded pixels — bit-compatible with
    * [[Multimodal.BmpCodec.pixelDigest]] (dims + top-down row-major
    * RGB), so a BMP and a PNG holding the same image digest
    * identically: the cross-container dedup property. */
  def pixelDigest(md: java.security.MessageDigest, docId: Long,
      bytes: Array[Byte]): String = {
    val buf = new java.io.ByteArrayOutputStream()
    val (w, h) = forEachPixel(docId, bytes) { (r, g, b) =>
      buf.write(r); buf.write(g); buf.write(b)
    }
    md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
    md.update(buf.toByteArray)
    md.digest().map(b => f"${b & 0xFF}%02x").mkString
  }
}
