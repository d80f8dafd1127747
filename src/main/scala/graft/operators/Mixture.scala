package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mix mechanics — the two steps between "curated corpus" and
  * "training batches": rebalancing a corpus toward target source
  * weights, and packing documents into fixed-token-budget training
  * sequences.
  *
  * Both are deterministic by construction (hash gates / id order, no
  * rand()), so re-runs, retries, and re-partitions produce the
  * identical sample and the identical pack layout — the property that
  * makes a training run reproducible from the raw corpus.
  */
object Mixture {

  /** Keep-rate table for rebalancing toward per-group `weightCol`
    * (any Column over the group key): group g's keep rate is
    * min(1, outFraction · total · w_g / (Σw · n_g)) — i.e. the corpus
    * shrunk to `outFraction` of its rows, distributed across groups
    * proportionally to weight, capped at keeping everything.
    *
    * Scale shape: one map-side-combined count per group (the shuffle
    * carries one row per group), then totals via an unpartitioned
    * window over the POST-aggregation rows — group-count-sized, the
    * q65 pattern — so the plan stays lazy (no driver job at
    * construction). All arithmetic is explicitly double so the oracle
    * (where bare literals are DECIMAL) computes bit-identical rates. */
  def keepRates(docs: DataFrame, groupCol: String, weightCol: Column,
      outFraction: Double): DataFrame = {
    val wd = Window.partitionBy(lit(1))
    docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_grp"))
      .withColumn("w", weightCol)
      .withColumn("total", sum(col("n_grp")).over(wd))
      .withColumn("sum_w", sum(col("w")).over(wd))
      .select(col(groupCol),
        round(least(lit(1.0),
          lit(outFraction) * col("total").cast("double") *
            col("w").cast("double") /
            (col("sum_w").cast("double") * col("n_grp").cast("double"))),
          6).as("keep_rate"))
  }

  /** Rebalanced sample: keep each doc iff its content-hash prefix
    * sorts below its group's keep rate (the q70 fixed-point-hex gate —
    * a pure function of the text, so exact duplicates sample
    * identically and the choice survives re-partitioning). The rate
    * table is group-count-sized and broadcast; the corpus is scanned,
    * never shuffled. */
  def rebalance(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, weightCol: Column, outFraction: Double): DataFrame =
    docs.join(broadcast(keepRates(docs, groupCol, weightCol, outFraction)),
        Seq(groupCol))
      // rate >= 1 short-circuits: floor(1.0·2^24) is SEVEN hex digits,
      // which a 6-char render would corrupt (and "keep everything"
      // should not depend on hash rendering at all)
      .filter(col("keep_rate") >= 1.0 ||
        substring(md5(col(textCol)), 1, 6) <
        lpad(lower(hex(floor(col("keep_rate") * (1L << 24)).cast("long"))),
          6, "0"))
      .select(col(idCol), col(groupCol), col("keep_rate"))

  /** Greedy sequential packing: documents are laid out in `idCol`
    * order within each `groupCol` partition, and each doc is assigned
    * to the fixed-`budget`-token pack where it STARTS (pack_id) plus
    * its token offset inside that pack — the sequence-packing manifest
    * a training loader consumes. Long docs straddle pack boundaries
    * by design (the loader splits them); budget is tokens, not docs.
    *
    * Scale shape: ONE window partitioned by the group key — packing
    * is per-group (per source / per shard), never a global running
    * sum, so the cumulative sums parallelize across groups exactly
    * like a real sharded layout job. */
  def sequencePacking(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budget: Int): DataFrame =
    sequencePackingByCount(
      docs.select(col(groupCol), col(idCol),
        size(split(col(textCol), " ")).as("n_tokens")),
      idCol, groupCol, budget)

  /** [[sequencePacking]] over a PRECOMPUTED token-count column —
    * the same greedy layout law for any token accounting (the BPE
    * subword counts of q145 pack through here; whitespace counts
    * are just the default accounting). Input: (groupCol, idCol,
    * n_tokens). */
  def sequencePackingByCount(counts: DataFrame, idCol: String,
      groupCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    counts
      .withColumn("endc", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        floor((col("endc") - col("n_tokens")).cast("double") / budget)
          .cast("int").as("pack_id"),
        ((col("endc") - col("n_tokens")) % budget)
          .cast("int").as("pack_offset"))
  }

  /** Deterministic TRAINING-SHARD manifest — the final global shuffle
    * of a curated corpus: each doc lands in one of 16 shards by the
    * first hex digit of its content hash, ordered inside the shard by
    * (hash, id). Content-hash placement is the distributed shuffle a
    * training run wants: (a) deterministic — re-runs and retries
    * rebuild byte-identical shards with no seed to manage; (b) a
    * hash-ordered shard is a uniform random sample of the corpus, so
    * any shard prefix is an unbiased training subset and sequential
    * shard reads ARE shuffled reads; (c) exact duplicates co-locate
    * (same hash ⇒ same shard, adjacent positions), making residual
    * dup auditing a per-shard local scan.
    *
    * Scale shape: one projection computes (hash, shard, token count)
    * per row, then ONE window partitioned by shard numbers the rows —
    * 16 parallel sort groups, each a shard's write order; no joins,
    * nothing global. At 100 TB you'd raise the digit count (16ᵈ
    * shards) to hold per-shard sort memory flat — the manifest shape
    * is unchanged. */
  def shardManifest(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(byShard))
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
  }
}
