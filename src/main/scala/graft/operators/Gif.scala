package graft.operators

/** REAL pure-JVM GIF codec — the palette-indexed rung of the media
  * ladder, and the engine's real LZW implementation (PNG covers
  * deflate, FLAC covers Rice, JPEG covers Huffman; GIF87a/89a's
  * variable-width LZW is the remaining compression family real
  * corpora carry). Everything here is public-spec GIF89a.
  *
  * Scope: single-image GIFs, 8-bit global color table, interlaced
  * (4-pass row re-sequencing) or progressive-free, no transparency —
  * extensions (0x21 blocks) are SKIPPED per spec, and unsupported
  * structure (local color tables, truncation, LZW code overflow)
  * fails loudly rather than mis-decoding.
  *
  * `encode` writes header + logical screen descriptor + 256-entry
  * global color table + image descriptor + variable-width LZW
  * stream (LSB-first bit packing, 255-byte sub-blocks, dictionary
  * reset at 4096 — every moving part of the GIF LZW variant).
  * `decode` walks the same structure strictly and inverts the LZW
  * stream including the KwKwK self-reference case. Lossless, so the
  * q106 oracle recomputes decoded channel features exactly from the
  * per-PIXEL law (no DC-only trick needed), and GifCodecSpec pins
  * EXACT cross-decoder equality against `javax.imageio` in both
  * directions.
  */
object GifCodec {

  /** Build the fixed 256-entry palette used by the synthesized
    * corpus: index i → (i, (i*7)%256, (i*13)%256). A bijective-ish
    * ramp so index errors are visible in every channel. */
  def lawPalette: Array[Int] = Array.tabulate(256) { i =>
    (i << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
  }

  // ---- encode ------------------------------------------------------

  /** Encode `index(x, y)` (0..255) against `palette` (256 packed
    * 0xRRGGBB ints) as a single-image non-interlaced GIF89a. */
  def encode(width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims $width x $height")
    require(palette.length == 256, s"palette must have 256 entries")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0xF7) // GCT present, 8 bits/channel, GCT size 2^8
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    palette.foreach { c =>
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    // image descriptor
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0) // no LCT, no interlace
    // LZW-compressed index stream
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = index(x, y)
        require(v >= 0 && v < 256, s"index $v out of palette at ($x,$y)")
        pixels(y * width + x) = v
        x += 1
      }
      y += 1
    }
    out.write(8) // LZW minimum code size
    val data = lzwEncode(pixels, 8)
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: clear code 2^min, EOI clear+1, codes grow from
    * min+1 bits up to 12, dictionary reset via clear code at 4096. */
  private def lzwEncode(pixels: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits // LSB-first packing
      nbits += codeSize
      while (nbits >= 8) {
        out.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    // dictionary: map (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    var prefix = -1
    var i = 0
    while (i < pixels.length) {
      val k = pixels(i)
      if (prefix < 0) prefix = k
      else {
        val key = Integer.valueOf((prefix << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // giflib convention: the entry EQUAL to 1<<codeSize is
            // still added (and any emission of it happens after the
            // widen below), THEN the width grows — one entry later
            // than a naive "would not fit" check, and what every
            // real decoder expects (ImageIO-pinned in GifCodecSpec)
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12)
              codeSize += 1
          } else {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            codeSize = minCodeSize + 1
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (nbits > 0) out.write((acc & 0xFF).toInt)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------

  /** Decoded single-image GIF: full-resolution packed-RGB pixels. */
  final case class GifImage(width: Int, height: Int, rgb: Array[Int]) {
    def r(i: Int): Int = (rgb(i) >> 16) & 0xFF
    def g(i: Int): Int = (rgb(i) >> 8) & 0xFF
    def b(i: Int): Int = rgb(i) & 0xFF
  }

  def decode(bytes: Array[Byte]): GifImage = {
    def u8(p: Int) = bytes(p) & 0xFF
    def u16(p: Int) = u8(p) | (u8(p + 1) << 8)
    require(bytes.length > 13, "gif: truncated header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"gif: bad signature '$sig'")
    var pos = 6
    pos += 4 // logical screen w/h (image descriptor's dims are used)
    val packed = u8(pos); pos += 3
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 0x07)
    require(hasGct, "gif: global color table required")
    require(pos + gctSize * 3 <= bytes.length, "gif: truncated color table")
    val palette = Array.tabulate(gctSize) { i =>
      (u8(pos + i * 3) << 16) | (u8(pos + i * 3 + 1) << 8) | u8(pos + i * 3 + 2)
    }
    pos += gctSize * 3
    // walk blocks to the first image descriptor
    var image: GifImage = null
    while (image == null) {
      require(pos < bytes.length, "gif: no image descriptor before EOF")
      u8(pos) match {
        case 0x21 => // extension: label + sub-blocks, skipped per spec
          pos += 2
          while (u8(pos) != 0) {
            pos += 1 + u8(pos)
            require(pos < bytes.length, "gif: truncated extension")
          }
          pos += 1
        case 0x2C =>
          // single-image decode: a nonzero left/top offset means the
          // sub-image is NOT the whole logical screen — fail loudly
          // like every other unsupported structure, never silently
          // treat the sub-image as the frame
          require(u16(pos + 1) == 0 && u16(pos + 3) == 0,
            "gif: nonzero image offset unsupported")
          val w = u16(pos + 5)
          val h = u16(pos + 7)
          val flags = u8(pos + 9)
          require((flags & 0x80) == 0, "gif: local color tables unsupported")
          val interlaced = (flags & 0x40) != 0
          require(w > 0 && h > 0, s"gif: bad image dims $w x $h")
          pos += 10
          val minCodeSize = u8(pos); pos += 1
          require(minCodeSize >= 2 && minCodeSize <= 11,
            s"gif: bad LZW min code size $minCodeSize")
          // concatenate sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (u8(pos) != 0) {
            val len = u8(pos)
            require(pos + 1 + len <= bytes.length, "gif: truncated image data")
            data.write(bytes, pos + 1, len)
            pos += 1 + len
          }
          pos += 1
          val raw = lzwDecode(data.toByteArray, minCodeSize, w * h)
          // interlaced streams carry rows in 4 passes (offsets
          // 0/4/2/1, steps 8/8/4/2) — re-sequence to raster order
          val indices =
            if (!interlaced) raw
            else {
              val seq = new Array[Int](w * h)
              var src = 0
              for ((off, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- off until h by step) {
                System.arraycopy(raw, src, seq, y * w, w)
                src += w
              }
              seq
            }
          val rgb = new Array[Int](w * h)
          var i = 0
          while (i < rgb.length) {
            val ix = indices(i)
            require(ix < palette.length, s"gif: index $ix outside palette")
            rgb(i) = palette(ix)
            i += 1
          }
          image = GifImage(w, h, rgb)
        case 0x3B =>
          throw new IllegalArgumentException("gif: trailer before image data")
        case other =>
          throw new IllegalArgumentException(
            f"gif: unknown block 0x$other%02x at $pos")
      }
    }
    image
  }

  /** Invert the GIF LZW variant: variable code width, clear/EOI,
    * dictionary of (prefix code, appended byte), KwKwK case. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](expected)
    var outLen = 0
    // dictionary as parallel arrays: prefix code + appended byte
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var nextCode = eoi + 1
    var codeSize = minCodeSize + 1
    var acc = 0L
    var nbits = 0
    var pos = 0
    var prev = -1
    val buf = new Array[Int](4096) // expansion scratch (max seq length)

    def expand(code: Int): Int = { // writes sequence into buf, returns len
      var c = code
      var n = 0
      while (c >= clear) { // composite codes chain through prefix
        buf(n) = append(c); n += 1
        c = prefix(c)
        require(n < 4096, "gif: corrupt LZW chain")
      }
      buf(n) = c; n += 1
      // reverse in place (chain walks tail-first)
      var i = 0
      while (i < n / 2) {
        val t = buf(i); buf(i) = buf(n - 1 - i); buf(n - 1 - i) = t
        i += 1
      }
      n
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }

    var done = false
    while (!done) {
      while (nbits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xFFL) << nbits
        nbits += 8
        pos += 1
      }
      require(nbits >= codeSize, "gif: truncated LZW stream")
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        nextCode = eoi + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        require(code < nextCode || (code == nextCode && prev >= 0),
          s"gif: LZW code $code out of range (next=$nextCode)")
        val n =
          if (code < nextCode) expand(code)
          else { // KwKwK: code == nextCode references the in-flight entry
            val m = expand(prev)
            buf(m) = firstByte(prev)
            m + 1
          }
        require(outLen + n <= expected,
          s"gif: more pixels than ${expected} declared")
        var i = 0
        while (i < n) { out(outLen) = buf(i); outLen += 1; i += 1 }
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev
          append(nextCode) = buf(0)
          nextCode += 1
          // the decoder learns each entry one code later than the
          // encoder added it, so the encoder's widen-after-adding-
          // (1<<codeSize) lands here at exactly nextCode == 1<<codeSize
          if (nextCode == (1 << codeSize) && codeSize < 12)
            codeSize += 1
        }
        prev = code
      }
    }
    require(outLen == expected,
      s"gif: decoded $outLen pixels, image declares $expected")
    out
  }
}
