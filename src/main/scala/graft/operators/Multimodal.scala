package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct, and decode /
  * feature-extract steps run batched per partition — the Spark-side
  * schema, partitioning, and batch shape are real; the codec itself is
  * STUBBED (this container has no image/audio libraries) behind
  * [[FakeCodec]], a clearly-marked deterministic fake with the same
  * signature a real decoder (JNI/FFI or vectorized UDF) would have.
  *
  * Scale notes: media blobs dominate row size, so (a) metadata-only
  * queries must never deserialize the blob — keep meta in separate
  * top-level columns so parquet column pruning skips the bytes;
  * (b) decode runs via `mapPartitions` so per-batch setup (codec
  * init) amortizes across a partition, exactly like a Pandas-UDF
  * batch; (c) repartition before decode to balance skewed blob sizes.
  */
object Multimodal {

  /** A media row: payload + width/height the "decoder" reports. */
  final case class MediaFeature(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      mean_byte: Double, head_hex: String)

  /** STUB decoder — deterministic fake standing in for a real image
    * decode (??? in production this is the JNI/FFI codec call ???).
    * Derives plausible dimensions and a "pixel mean" purely from the
    * bytes so tests are reproducible with zero native deps. */
  object FakeCodec {
    def decode(docId: Long, bytes: Array[Byte]): MediaFeature = {
      val n = bytes.length
      val mean =
        if (n == 0) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / n
      MediaFeature(
        doc_id = docId,
        n_bytes = n,
        width = 64 + (n % 640),
        height = 64 + ((n / 2) % 480),
        mean_byte = math.round(mean * 1e6) / 1e6,
        head_hex = bytes.take(8).map(b => f"${b & 0xFF}%02x").mkString)
    }
  }

  /** Attach a binary media column (here synthesized from text — in a
    * real pipeline this is the stored blob) plus pruning-friendly
    * top-level metadata columns. */
  def withMediaColumn(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      octet_length(encode(col(textCol), "UTF-8")).as("media_bytes"),
      lit("fake/raw").as("media_format"))

  /** Batched decode/feature-extract over the media column —
    * partition-parallel, codec initialized once per partition (the
    * `mapPartitions` batch shape a real decoder needs). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized setup)
        it.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
      }
  }

  /** Frame-sample shape: take every `stride`-th fixed-size window of
    * the payload as a "frame" (per-row, array output — the video
    * sampling batch shape, stubbed on raw bytes). */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"),
      transform(
        sequence(lit(0),
          greatest(((octet_length(col("media")) - frameBytes) / stride)
            .cast("int"), lit(0))),
        i => substring(col("media"), (i * stride + 1).cast("int"),
          lit(frameBytes)))
        .as("frames"))
      .withColumn("n_frames", size(col("frames")))

  /** Resize shape: aspect-preserving fit of decoded dimensions into a
    * `maxW`×`maxH` box, never upscaling — pure column arithmetic over
    * the decode metadata (the pixel resample itself belongs to the
    * codec; the engine contributes the batch plumbing and the
    * dimension algebra, codegen'd per-row, zero shuffle). */
  def resizeDims(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, s"target box must be positive: $maxW x $maxH")
    // round + clamp rather than floor: maxW/width is rarely exactly
    // representable, so width*(maxW/width) can land at 159.999…,
    // which floor would undershoot to one short of the box edge
    features.withColumn("__scale",
        least(lit(maxW.toDouble) / col("width"),
          lit(maxH.toDouble) / col("height"), lit(1.0)))
      .withColumn("out_width",
        least(greatest(round(col("width") * col("__scale")), lit(1)),
          lit(maxW)).cast("int"))
      .withColumn("out_height",
        least(greatest(round(col("height") * col("__scale")), lit(1)),
          lit(maxH)).cast("int"))
      .drop("__scale")
  }
}
