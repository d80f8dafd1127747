package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM MJPEG/AVI video codec — the VIDEO rung of the media
  * ladder, built on [[JpegCodec]]: an AVI (RIFF) container walker
  * whose frames are baseline JPEGs, i.e. Motion-JPEG — the one video
  * coding a pure-JVM stack can decode for real, because it has no
  * inter-frame prediction (every frame is an independent JPEG).
  * Everything here is public-spec: RIFF (the same container family
  * as WAV, see [[Multimodal.WavCodec]]) and the MS AVI chunk layout
  * (avih / strl / movi / idx1).
  *
  * `encode` writes a spec-valid single-video-stream AVI: LIST hdrl
  * (avih + one 'vids'/'MJPG' strl with a BITMAPINFOHEADER), LIST
  * movi with one '00dc' chunk per JPEG frame (odd-size chunks get
  * the RIFF pad byte), and an idx1 index. `decode` is a strict
  * walker: it verifies the RIFF/'AVI ' signature, walks top-level
  * chunks, reads the declared frame count and dimensions from avih,
  * collects '00dc' payloads from LIST movi honoring pad bytes,
  * cross-checks the idx1 entry count when the index is present,
  * JPEG-decodes every frame, and verifies each frame's dimensions
  * against the header — truncation, a wrong fourcc, a frame-count
  * mismatch, or dimension drift between frames fails loudly (the
  * properties AviCodecSpec pins).
  *
  * Scale note: frames decode lazily per row inside the partition
  * batch (an iterator, not a materialized pixel table) — per-doc
  * cost is bounded by its own payload, and only the fixed-width
  * feature row ever shuffles.
  */
object AviCodec {

  private def fourcc(s: String): Int = {
    require(s.length == 4, s"bad fourcc '$s'")
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
  }
  private val RIFF = fourcc("RIFF")
  private val AVI_ = fourcc("AVI ")
  private val LIST = fourcc("LIST")
  private val Hdrl = fourcc("hdrl")
  private val Avih = fourcc("avih")
  private val Strl = fourcc("strl")
  private val Strh = fourcc("strh")
  private val Strf = fourcc("strf")
  private val Movi = fourcc("movi")
  private val Idx1 = fourcc("idx1")
  private val Vids = fourcc("vids")
  private val MJPG = fourcc("MJPG")
  private val Dc00 = fourcc("00dc")

  // ---- encode ------------------------------------------------------

  /** Write `frames` (each a complete baseline JPEG of `width` x
    * `height`) as a Motion-JPEG AVI at `fps` frames per second. */
  def encode(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims $width x $height")
    require(fps > 0, s"bad fps $fps")
    require(frames.nonEmpty, "no frames")
    val maxFrame = frames.map(_.length).max

    def chunk(id: Int, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val bb = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(id).putInt(body.length).put(body)
      if (pad == 1) bb.put(0.toByte)
      bb.array()
    }
    def list(kind: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(LIST).putInt(body.length + 4).putInt(kind).put(body)
      bb.array()
    }

    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps) // dwMicroSecPerFrame
        .putInt(maxFrame * fps) // dwMaxBytesPerSec
        .putInt(0)              // padding granularity
        .putInt(0x10)           // AVIF_HASINDEX
        .putInt(frames.length)  // dwTotalFrames
        .putInt(0)              // initial frames
        .putInt(1)              // dwStreams
        .putInt(maxFrame)       // suggested buffer
        .putInt(width).putInt(height)
      // 4 reserved dwords stay zero
      bb.array()
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(Vids).putInt(MJPG)
        .putInt(0).putShort(0).putShort(0) // flags, priority, language
        .putInt(0)                         // initial frames
        .putInt(1).putInt(fps)             // scale / rate
        .putInt(0).putInt(frames.length)   // start / length
        .putInt(maxFrame)                  // suggested buffer
        .putInt(-1)                        // quality (default)
        .putInt(0)                         // sample size (varies)
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort) // rcFrame
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24) // planes / bit count
        .putInt(MJPG)             // biCompression
        .putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list(Hdrl,
      chunk(Avih, avih) ++ list(Strl, chunk(Strh, strh) ++ chunk(Strf, strf)))

    val moviChunks = frames.map(f => chunk(Dc00, f))
    val movi = list(Movi, moviChunks.flatten.toArray)

    // idx1 offsets are relative to the start of the movi LIST's data
    // (the conventional "offset from 'movi'" form)
    val idx1 = {
      val bb = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4 // skip the 'movi' kind fourcc
      frames.foreach { f =>
        bb.putInt(Dc00).putInt(0x10 /* AVIIF_KEYFRAME */)
          .putInt(off).putInt(f.length)
        off += 8 + f.length + (f.length % 2)
      }
      bb.array()
    }

    val body = hdrl ++ movi ++ chunk(Idx1, idx1)
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(body.length + 4).putInt(AVI_).put(body)
    out.array()
  }

  // ---- decode ------------------------------------------------------

  /** A decoded MJPEG video: per-frame [[JpegCodec.JpegImage]]s plus
    * the container-declared rate. */
  final case class Video(width: Int, height: Int, fps: Int,
      frames: IndexedSeq[JpegCodec.JpegImage])

  def decode(bytes: Array[Byte]): Video = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def need(n: Int, what: String): Unit =
      if (bb.remaining() < n)
        throw new IllegalArgumentException(s"avi: truncated in $what")
    need(12, "header")
    require(bb.getInt() == RIFF, "avi: not a RIFF file")
    val riffLen = bb.getInt()
    require(riffLen >= 4 && riffLen <= bytes.length - 8,
      "avi: RIFF size exceeds file")
    require(bb.getInt() == AVI_, "avi: RIFF form is not 'AVI '")

    var declaredFrames = -1
    var width = 0
    var height = 0
    var microSecPerFrame = 0
    var idxEntries = -1
    val payloads = IndexedSeq.newBuilder[Array[Byte]]
    var nPayloads = 0

    def walkMovi(end: Int): Unit = {
      while (bb.position() < end) {
        need(8, "movi chunk")
        val id = bb.getInt()
        val len = bb.getInt()
        require(len >= 0, "avi: bad chunk length") // signed overflow would seek backwards
        need(len, "movi chunk body")
        if (id == Dc00) {
          val f = new Array[Byte](len)
          bb.get(f)
          payloads += f
          nPayloads += 1
        } else if (id == LIST) {
          bb.getInt() // rec list kind
          // recurse into rec lists transparently (len includes kind)
          walkMovi(bb.position() + len - 4)
          // walkMovi consumed exactly to its end; padding handled below
        } else {
          bb.position(bb.position() + len) // non-video stream chunk
        }
        if (len % 2 == 1 && bb.position() < end) bb.get() // pad byte
      }
    }

    val fileEnd = 8 + riffLen
    while (bb.position() < fileEnd) {
      need(8, "chunk header")
      val id = bb.getInt()
      val len = bb.getInt()
      require(len >= 0, "avi: bad chunk length")
      need(math.min(len, 4), "chunk body")
      if (id == LIST) {
        val kind = bb.getInt()
        val end = bb.position() + len - 4
        if (kind == Movi) walkMovi(end)
        else if (kind == Hdrl) {
          // walk hdrl: avih + nested strl lists
          while (bb.position() < end) {
            need(8, "hdrl chunk")
            val hid = bb.getInt()
            val hlen = bb.getInt()
            require(hlen >= 0, "avi: bad chunk length")
            if (hid == Avih) {
              need(hlen, "avih")
              require(hlen >= 56, s"avi: avih too short ($hlen)")
              val p = bb.position()
              microSecPerFrame = bb.getInt(p)
              declaredFrames = bb.getInt(p + 16)
              require(bb.getInt(p + 24) >= 1, "avi: no streams declared")
              width = bb.getInt(p + 32)
              height = bb.getInt(p + 36)
              bb.position(p + hlen)
            } else if (hid == LIST) {
              bb.getInt() // strl (or odml) — walk transparently
            } else {
              need(hlen, "hdrl sub-chunk")
              bb.position(bb.position() + hlen)
            }
            if (hlen % 2 == 1 && bb.position() < end) bb.get()
          }
        } else bb.position(end) // other LIST (INFO etc.)
      } else if (id == Idx1) {
        require(len % 16 == 0, s"avi: idx1 length $len not a multiple of 16")
        idxEntries = len / 16
        bb.position(bb.position() + len)
      } else {
        need(len, "chunk body")
        bb.position(bb.position() + len)
      }
      if (len % 2 == 1 && bb.position() < fileEnd) bb.get()
    }

    require(declaredFrames >= 0, "avi: missing avih header")
    require(width > 0 && height > 0, s"avi: bad declared dims $width x $height")
    val raw = payloads.result()
    require(raw.length == declaredFrames,
      s"avi: header declares $declaredFrames frames, movi has ${raw.length}")
    if (idxEntries >= 0)
      require(idxEntries == raw.length,
        s"avi: idx1 has $idxEntries entries for ${raw.length} frames")
    val frames = raw.map { f =>
      val img = JpegCodec.decode(f)
      require(img.width == width && img.height == height,
        s"avi: frame dims ${img.width}x${img.height} != declared ${width}x$height")
      img
    }
    val fps =
      if (microSecPerFrame > 0) math.round(1000000.0 / microSecPerFrame).toInt
      else 0
    Video(width, height, fps, frames)
  }
}
