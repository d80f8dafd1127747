package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic m× replication of the harness `documents` /
  * `embeddings` tables for scale demonstrations (ScaleBench,
  * ScaleContractSpec).
  *
  * The point of the construction is that every replica preserves its
  * internal duplicate / near-dup / cluster structure EXACTLY while no
  * similarity structure leaks across replicas BY CONSTRUCTION (not
  * probabilistically):
  *
  *  - documents: replica r > 0 suffixes every whitespace token with
  *    `~r`, so a replica's shingle sets are congruent to the original's
  *    (same sizes, same intersections — Jaccard is preserved to the
  *    digit) while sharing ZERO shingles with any other replica. The
  *    true near-dup pair count at m× is therefore exactly m× the 1×
  *    count, and per-shingle document frequency is unchanged (the
  *    stop-shingle cap keeps its meaning).
  *  - embeddings: replica r rotates each vector cyclically by r
  *    positions. Rotation is an orthogonal map, so within-replica
  *    cosines (and norms) are preserved exactly; cross-replica pairs
  *    decorrelate to the corpus's background cosine level.
  *
  * Any super-linear growth in a measured candidate-volume counter is
  * then algorithmic blowup, never a data artifact — which is what makes
  * the 10× bench table in BASELINE.md interpretable.
  */
object ScaleCorpus {

  /** Replica id offset. Far above any harness id PLUS the 1M/2M/3M
    * offsets the derived fixtures ([[Curation.flippedNearDupCorpus]],
    * [[Curation.clusteredEmbeddings]]) add on top, so replicated ids
    * never collide with fixture-derived ids. */
  val IdStride = 100000000L

  /** m× documents. Tokenization (single-space split) matches
    * [[TextDedup.shingleArray]] so the no-shared-shingles guarantee is
    * exact — PROVIDED original tokens never end in `~<digit>` (a token
    * "foo~1" in replica 0 would equal replica 1's suffixed "foo"); the
    * harness vocabulary has no tildes, and ScaleContractSpec's
    * distinct-gram m× equality would catch a violating corpus.
    * `n_chars` is recomputed for the rewritten text. */
  def documents(docs: DataFrame, mult: Int): DataFrame = {
    require(mult >= 1, s"mult must be >= 1, got $mult")
    (0 until mult).map { r =>
      if (r == 0) docs.select(
        col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      else docs.select(
        (col("doc_id") + lit(r * IdStride)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"~$r")))).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
  }

  /** m× embeddings. Replica r rotates by r positions, which is only an
    * injective replica map while r < dims — a vector of dims ≤ mult
    * would rotate onto (or past) itself and silently break the
    * no-cross-replica-structure guarantee. The static [1, 32] require
    * assumes the 64-dim harness floor; because `mult` can't see the
    * ACTUAL dimensionality at plan time, every rotated row also
    * carries a runtime `assert_true(size > mult)` so a shorter vector
    * fails the job loudly instead of yielding empty/negative slices. */
  def embeddings(vecs: DataFrame, mult: Int): DataFrame = {
    require(mult >= 1 && mult <= 32,
      s"mult must be in [1, 32] (rotation stays below 64 dims), got $mult")
    (0 until mult).map { r =>
      if (r == 0) vecs.select(col("vec_id"), col("embedding"), col("label"))
      else {
        val rotated = concat(
          slice(col("embedding"), lit(r + 1),
            size(col("embedding")) - r),
          slice(col("embedding"), lit(1), lit(r)))
        vecs.select(
          (col("vec_id") + lit(r * IdStride)).as("vec_id"),
          // assert_true returns null on success — the `when` wrapper
          // just sequences the check before the rotation per row
          when(assert_true(size(col("embedding")) > lit(mult),
            concat(lit(s"ScaleCorpus.embeddings(mult=$mult) needs " +
              "dims > mult, got dims="), size(col("embedding")))).isNull,
            rotated).as("embedding"),
          col("label"))
      }
    }.reduce(_ unionByName _)
  }
}
