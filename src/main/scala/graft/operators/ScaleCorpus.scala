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

  /** m× embeddings. Replica r applies the ORTHOGONAL map
    * `D_s ∘ rot_{r mod 32}` — a cyclic rotation by `r mod 32`
    * positions composed, for r ≥ 32, with the sign-flip diagonal
    * `D_s` (s = r / 32) that negates every coordinate whose index has
    * bit s−1 set (exactly half the coordinates, in a different block
    * pattern per s). Both factors are orthogonal, so within-replica
    * cosines and norms are preserved EXACTLY — the replica's internal
    * near-dup structure is congruent to the original's. Across
    * replicas: same s ⇒ rotations differ (the original injectivity
    * argument); different s ⇒ the relative map includes a diagonal
    * flipping exactly half the COORDINATES, so cross-replica cosines
    * decorrelate for corpora in generic position. (The 10×/30×
    * regimes, r < 32, execute the historical rotation-only path
    * bit-for-bit.) Neither factor decorrelates ADVERSARIAL structure
    * — a rotation-periodic vector survives rotation, a vector whose
    * squared mass concentrates off the flipped index half survives
    * the flip — which is why the construction's stated check is
    * EMPIRICAL, and for THIS counter a banded one: the embedding
    * near-dup truth counter is measured and published at every
    * multiplier but asserted only to a factor-2 band
    * (ScaleContractSpec), NOT to exact m× — under rotation each
    * replica flips a different coordinate of the near-dup
    * construction, so the per-replica pair count varies (the
    * published records are honestly inexact: 18509 vs 18660 at 10×,
    * 185053 vs 186600 at 100×). The exact-m× laws belong to the TEXT
    * counters (gram/passage/containment), whose replica maps commute
    * with the counted structure. Because the maps
    * can't see the ACTUAL dimensionality at plan time, every
    * replicated row carries a runtime `assert_true(size > minDims)`
    * (minDims = the replica's rotation distance, and at least the
    * flip pattern's block width when a sign pattern applies) so a
    * too-short vector fails the job loudly instead of yielding
    * empty/negative slices or a no-op flip. */
  def embeddings(vecs: DataFrame, mult: Int): DataFrame = {
    require(mult >= 1 && mult <= 128,
      s"mult must be in [1, 128] (4 sign patterns x 32 rotations), " +
        s"got $mult")
    (0 until mult).map { r =>
      if (r == 0) vecs.select(col("vec_id"), col("embedding"), col("label"))
      else {
        val rot = r % 32
        val s = r / 32
        val rotated =
          if (rot == 0) col("embedding")
          else concat(
            slice(col("embedding"), lit(rot + 1),
              size(col("embedding")) - rot),
            slice(col("embedding"), lit(1), lit(rot)))
        val mapped =
          if (s == 0) rotated
          else transform(rotated, (x, i) =>
            when(pmod(shiftright(i, s - 1), lit(2)) === 1, -x)
              .otherwise(x))
        // per-replica minimum dimensionality: the rotation distance
        // (slice bounds), and when a sign pattern applies, its block
        // width (a pattern flipping nothing would alias replicas) —
        // dims-16 corpora at mult ≤ 16 remain valid, as before the
        // sign-flip regime existed (round-14 review)
        val minDims = math.max(rot, if (s > 0) 1 << (s - 1) else 1)
        vecs.select(
          (col("vec_id") + lit(r * IdStride)).as("vec_id"),
          // assert_true returns null on success — the `when` wrapper
          // just sequences the check before the rotation per row
          when(assert_true(size(col("embedding")) > lit(minDims),
            concat(lit(s"ScaleCorpus.embeddings(mult=$mult) needs " +
              s"dims > $minDims, got dims="),
              size(col("embedding")))).isNull,
            mapped).as("embedding"),
          col("label"))
      }
    }.reduce(_ unionByName _)
  }
}
