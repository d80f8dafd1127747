package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over the documents table — the one IR
  * primitive a training-data pipeline needs that the dedup/ANN
  * family does not cover: decontamination and quality audits often
  * start from "which corpus documents does this query string
  * retrieve", and at 100 TB that is an inverted-index scan, not a
  * text scan.
  *
  * Scoring is BM25 with the standard (k1, b) length normalization
  * but the RATIONAL odds term (N − df + 0.5)/(df + 0.5) in place of
  * its logarithm. The log is BM25's only transcendental — and `ln`
  * is exactly the operation IEEE does NOT pin down across engines
  * (libm vs JVM intrinsics differ in the last ulp), which would put
  * a hash-compared score at the mercy of rounding at the 6-dp
  * boundary. The odds form keeps every per-term contribution inside
  * +,−,×,÷ — all correctly-rounded IEEE ops, bit-identical on any
  * engine — at the price of weighting rare terms more aggressively
  * than log-BM25 (the same monotone-per-term family; ranking
  * differences only arise across multi-term score sums, and the
  * choice is pinned in the operator contract). The numeric
  * discipline is the repo's standard: per-term contributions in
  * double (IEEE-exact per op), accumulated as DECIMAL(38,12)
  * (order-independent), final score one round(6).
  *
  * Scale shape (100 TB): the postings build is ONE tokenize +
  * shuffle — the classic inverted-file build, staged to a warehouse
  * artifact by [[buildBm25Index]] so query batches never pay it.
  * Document length is DENORMALIZED into each posting row, so
  * serving needs no doc-side join; the tiny (term, df) table and
  * the one-row corpus stats ride the artifact. A query batch is
  * broadcast; the postings scan is PARTITION-PRUNED to the query
  * terms' first-character prefixes (the sandbox-scale stand-in for
  * hash-bucket routing — same literal-pruning mechanics as the IVF
  * list probes), and the scoring exchange is bounded twice over:
  * only matched terms' postings are read, and safe max-score
  * pruning ([[bm25ServeMaxScore]]) keeps a hot term's corpus-sized
  * list out of the exchange whenever its score bound cannot reach
  * the query's top-k floor.
  */
object Retrieval {

  /** The corpus token law, shared with q29's token frequency: lower,
    * split on non-alphanumerics, drop empties. */
  def alnumTokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** (term, doc_id, tf, len): term frequencies with the doc length
    * denormalized in — the serving row of the inverted file. */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // tokenize ONCE into its own projection: explode and size over
    // the same inline alnumTokens tree would lower + regex-split +
    // HOF-filter every document twice (interpreted HOFs are the
    // measured Spark 4.x trap; round-16 review)
    docs.select(col(idCol).as("doc_id"),
        alnumTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"),
        size(col("toks")).as("len"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("len")).as("len"))

  /** Distinct query terms (query_id, term) — query term frequency is
    * deliberately ignored (the common simple-BM25 choice; documented
    * contract, mirrored by the oracle). */
  private def queryTerms(queries: DataFrame, qidCol: String,
      qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(alnumTokens(col(qtextCol)))).as("term"))

  /** The rational odds weight of a term with document frequency
    * `df` (see the object scaladoc for why not ln). */
  private def oddsCol(nDocs: Long): Column =
    (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))

  /** BM25 tf-saturation with (k1, b) length normalization —
    * monotone INCREASING in tf and DECREASING in len, which is what
    * makes tfpart(maxtf, minlen) a per-term upper bound. */
  private def tfpartCol(tf: Column, len: Column, k1: Double,
      b: Double, avgdl: Double): Column = {
    val tfd = tf.cast("double")
    (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * (len.cast("double") / lit(avgdl))))
  }

  /** One (term, doc, query) match's score contribution, cast to
    * exact decimal for order-independent accumulation (the per-term
    * doubles are bit-identical cross-engine; the decimal sum makes
    * the total independent of partitioning/row order). */
  private def contribCol(k1: Double, b: Double, avgdl: Double,
      nDocs: Long): Column =
    (oddsCol(nDocs) * tfpartCol(col("tf"), col("len"), k1, b, avgdl))
      .cast("decimal(28,12)")

  private def topKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double"), 6).as("score"), col("rank"))
  }

  /** The REFERENCE scoring phase (exhaustive): broadcast query terms
    * meet postings on term, every matched posting scores odds(df) ×
    * tf-saturation(tf, len) in double, scores accumulate per
    * (query, doc) in exact decimal, and a top-k window ranks by
    * (score desc, doc_id asc). `nDocs`/`sumLen` are the corpus
    * stats; `dfs` is (term, df, …). Kept private[graft] as the
    * pruning path's equality reference (RetrievalSpec) — the public
    * paths serve through [[bm25ServeMaxScore]]. */
  private[graft] def bm25Serve(qterms: DataFrame, postings: DataFrame,
      dfs: DataFrame, nDocs: Long, sumLen: Long, k: Int,
      k1: Double, b: Double): DataFrame = {
    // avgdl once, driver-side: one double division, same literal on
    // both engines
    val avgdl = sumLen.toDouble / nDocs.toDouble
    val qd = qterms.join(dfs.select(col("term"), col("df")), Seq("term"))
    val scored = postings.join(broadcast(qd), Seq("term"))
      .withColumn("c", contribCol(k1, b, avgdl, nDocs))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("decimal(38,12)").as("s"))
    topKWindow(scored, k)
  }

  /** Ulp armor for the pruning inequality: upper bounds and suffix
    * sums are computed in double (each op correctly rounded, but a
    * posting's contribution can exceed the term bound by rounding
    * noise), so a suffix is pruned only when it falls short of the
    * floor by MORE than a margin. The margin must SCALE with the
    * floor — BM25 scores grow with corpus size (odds(df=1) ≈ N/1.5),
    * so a fixed absolute margin is ~ulp-sized at 10⁹-doc score
    * magnitudes and the safety argument would collapse exactly at
    * the scale pruning targets (round-17 review). Relative 10⁻⁹ is
    * ~2³⁰ ulps at any magnitude — vastly wider than the few-ulp
    * accumulated rounding, vanishingly small against real score
    * gaps; the absolute floor covers θ near zero. */
  private def maxScoreMargin(theta: Column): Column =
    greatest(lit(1e-6), theta * lit(1e-9))

  /** Safe max-score (MaxScore/WAND-family) scoring: result-IDENTICAL
    * to [[bm25Serve]] — same contributions, same decimal sums, same
    * ranking — but the scoring exchange no longer carries every
    * posting of every matched term (the round-16 verdict gap: one
    * stopword-ish query term made the exchange corpus-sized at
    * 100 TB). The standard inverted-file answer, batch-shaped:
    *
    *  1. per (query, term), an upper bound on any single posting's
    *     contribution: ub = odds(df) × tfpart(maxtf, minlen) —
    *     tf-saturation is monotone in tf and len, so the per-term
    *     (maxtf, minlen) stored in the index bound every posting
    *     (both merge associatively on append: max/max, min/min);
    *  2. a top-k FLOOR θ per query: the k-th best single-posting
    *     contribution of the query's highest-ub term (every floor
    *     doc's full score ≥ its contribution, so the true k-th best
    *     full score ≥ θ — a valid lower bound);
    *  3. terms whose ub-descending SUFFIX sums to < θ − margin are
    *     NON-ESSENTIAL: a doc matching only those has full score ≤
    *     that suffix sum < θ ≤ the true k-th best — it cannot enter
    *     the top k (strictly below, so doc-id tie-breaks cannot
    *     resurrect it). The highest-ub term is always essential
    *     (θ ≤ its ub);
    *  4. candidates = docs matching ≥ 1 essential term; the full
    *     pass scores ALL query terms' postings but only for
    *     candidate docs — an un-hinted semi-join that AQE converts
    *     to broadcast when candidates are essential-list-sized (the
    *     pruning-works regime: map-side filter, the exchange
    *     carries candidate rows, not the hot term's corpus-sized
    *     list) and that degrades to a shuffle on the aggregate's
    *     own keys otherwise — worst case equals the exhaustive
    *     plan's cost, never a broadcast failure.
    *
    * Everything composes into ONE lazy plan (windows over the tiny
    * query×term frame, a broadcast floor, broadcast query frames) —
    * no driver job at plan construction, the query-entry contract.
    * Scale contract: the candidate set is the essential lists'
    * union — exactly the volume MaxScore commits to scoring; a
    * query whose essential lists are themselves corpus-sized gets
    * no pruning (and none is possible — those terms genuinely
    * contend for the top k). */
  /** Stages 1–4a of the max-score plan — the candidate (query_id,
    * doc_id) pairs that survive pruning. private[graft] so
    * RetrievalSpec can measure the pruning law directly: candidate-
    * matched posting volume < total matched posting volume on a
    * corpus with a deliberately hot term. */
  private[graft] def maxScoreCandidates(qterms: DataFrame,
      postings: DataFrame, dfs: DataFrame, nDocs: Long, sumLen: Long,
      k: Int, k1: Double, b: Double): DataFrame = {
    val avgdl = sumLen.toDouble / nDocs.toDouble
    val qd = qterms.join(dfs, Seq("term")) // + df, maxtf, minlen
      .withColumn("ub", oddsCol(nDocs) *
        tfpartCol(col("maxtf"), col("minlen"), k1, b, avgdl))
    // per-query ub-descending order (term asc tie-break) + suffix
    // sums — window over the queries × terms frame, which is tiny by
    // the broadcast-query contract
    val wOrd = Window.partitionBy(col("query_id"))
      .orderBy(col("ub").desc, col("term").asc)
    val wSuffix = wOrd.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val ubq = qd
      .withColumn("r", row_number().over(wOrd))
      .withColumn("sfx", sum(col("ub")).over(wSuffix))
    // floor pass: the k-th best single-posting contribution of each
    // query's top-ub term (absent when the term matches < k docs →
    // coalesce to 0 → nothing is pruned — exact by construction)
    val top1 = ubq.filter(col("r") === 1)
      .select(col("query_id"), col("term"), col("df"))
    val wFloor = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("doc_id").asc)
    val floor = postings.join(broadcast(top1), Seq("term"))
      .withColumn("c", contribCol(k1, b, avgdl, nDocs))
      .withColumn("fr", row_number().over(wFloor))
      .filter(col("fr") === k)
      .select(col("query_id"), col("c").cast("double").as("theta"))
    // essential terms: suffix sum reaches the floor (monotone in r,
    // so the pruned set is a clean suffix; margin: see maxScoreMargin)
    val theta = coalesce(col("theta"), lit(0.0))
    val essential = ubq
      .join(broadcast(floor), Seq("query_id"), "left")
      .filter(col("sfx") + maxScoreMargin(theta) >= theta)
      .select(col("query_id"), col("term"))
    // candidate (query, doc) pairs from essential lists only
    postings.join(broadcast(essential), Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
  }

  private[graft] def bm25ServeMaxScore(qterms: DataFrame,
      postings: DataFrame, dfs: DataFrame, nDocs: Long, sumLen: Long,
      k: Int, k1: Double, b: Double): DataFrame = {
    val avgdl = sumLen.toDouble / nDocs.toDouble
    val candidates = maxScoreCandidates(qterms, postings, dfs, nDocs,
      sumLen, k, k1, b)
    // full pass: every query term's contributions, candidate docs
    // only. NO forced broadcast on candidates (round-17 review): in
    // the pruning-works regime they are essential-list-sized and AQE
    // converts the semi-join to broadcast at runtime — map-side
    // filter, the exchange carries candidate rows only; in the
    // no-cut regime (a query whose essential lists are corpus-sized)
    // candidates are matched-doc-sized and a forced broadcast would
    // FAIL HARD where the exhaustive plan merely shuffled — the
    // un-hinted join degrades to a shuffle semi-join on the same
    // (query_id, doc_id) keys the aggregate needs, so its exchange
    // is reused and worst-case cost is the exhaustive plan's, never
    // an OOM. The query-side frames stay explicitly broadcast (tiny
    // by contract).
    val qdAll = qterms.join(dfs.select(col("term"), col("df")),
      Seq("term"))
    val scored = postings.join(broadcast(qdAll), Seq("term"))
      .withColumn("c", contribCol(k1, b, avgdl, nDocs))
      .join(candidates, Seq("query_id", "doc_id"), "left_semi")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("decimal(38,12)").as("s"))
    topKWindow(scored, k)
  }

  /** Corpus stats from the postings themselves (one row per (term,
    * doc) — distinct doc lengths): bounded driver fetch of two
    * longs, null-safe on an empty/zero-token corpus (sum over zero
    * rows is null — round-16 review). The ONE definition build,
    * append, and the in-plan path all share. */
  private def corpusStats(postings: DataFrame): (Long, Long) = {
    val row = postings.select(col("doc_id"), col("len")).distinct()
      .agg(count(lit(1)), coalesce(sum(col("len")), lit(0L)))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** The artifact's declared geometry + corpus stats. */
  private final case class Bm25Meta(nDocs: Long, sumLen: Long,
      k1E6: Long, bE6: Long)

  /** Read `_meta.json`, rejecting partial/hand-copied dirs loudly —
    * the ONE reader the append and serving paths share, via the
    * warehouse-wide shared meta reader (round-17 review). Gated on
    * layout version 2 (round-17 ADVICE): `dfs.parquet` gained the
    * maxtf/minlen pruning-bound columns in round 17, and an
    * EXTERNALLY stored pre-round-17 artifact would otherwise fail
    * deep inside serving with an opaque missing-column
    * AnalysisException instead of a rebuild-the-index message (the
    * substring index's v2 gate, mirrored; in-repo artifacts already
    * retire through the warehouse key bump). */
  private def readBm25Meta(snap: Warehouse.IndexSnapshot): Bm25Meta = {
    val meta = Warehouse.readMetaJson(snap, "BM25 index")
    val dir = snap.root
    Warehouse.requireMetaVersion(meta, dir, "BM25 index", 2L,
      "maxtf/minlen pruning bounds in dfs.parquet")
    def f(key: String): Long = Warehouse.metaLong(meta, dir, key)
    Bm25Meta(f("nDocs"), f("sumLen"), f("k1E6"), f("bE6"))
  }

  private def bm25MetaJson(m: Bm25Meta): String =
    s"""{"version":2,"nDocs":${m.nDocs},"sumLen":${m.sumLen},""" +
      s""""k1E6":${m.k1E6},"bE6":${m.bE6}}"""

  private def writeBm25Meta(dir: String, m: Bm25Meta): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_meta.json"), bm25MetaJson(m))

  /** In-plan BM25 top-k (q137): postings, dfs, and corpus stats all
    * derive in one job — the interactive path; [[buildBm25Index]] +
    * [[bm25TopKFromIndex]] are the deployment path. */
  /** The per-term statistics row: document frequency plus the
    * max-score pruning bounds — maxtf (max tf over the term's
    * postings) and minlen (min doc length over them), both
    * associatively mergeable on append (max/max, min/min), both
    * feeding the per-term contribution upper bound
    * [[bm25ServeMaxScore]] prunes with. */
  private def dfsOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("maxtf"),
        min(col("len")).as("minlen"))

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = postingsOf(docs, idCol, textCol).localCheckpoint(true)
    val (nDocs, sumLen) = corpusStats(postings)
    bm25ServeMaxScore(queryTerms(queries, qidCol, qtextCol), postings,
      dfsOf(postings), nDocs, sumLen, k, k1, b)
  }

  /** Persist the inverted file to `dir`:
    *  - `postings.parquet` (term, doc_id, tf, len), partitioned by
    *    the term's first character — queries resolve their terms'
    *    prefixes driver-side into literal partition filters, so a
    *    batch touching 3 prefixes reads 3/36ths of the index (the
    *    sandbox-scale stand-in for hash-bucket routing; same static
    *    pruning mechanics as the IVF list probes);
    *  - `dfs.parquet` (term, df, maxtf, minlen, pfx) — same
    *    partitioning; maxtf/minlen are the max-score pruning bounds
    *    ([[bm25ServeMaxScore]]), mergeable on append;
    *  - `ids.parquet` (doc_id) — the indexed-id ledger the append's
    *    duplicate guard probes (8 bytes/doc, the q136 digest-table
    *    shape);
    *  - `_meta.json` {nDocs, sumLen, k1E6, bE6} — corpus stats and
    *    the scoring parameters the index was DECLARED to serve (the
    *    meta discipline: serving reads them back, never trusts the
    *    caller, because a (k1, b) mismatch between gate and oracle
    *    would silently change every score). */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
      dir: String, k1: Double = 1.2, b: Double = 0.75): Unit = {
    val postings = postingsOf(docs, idCol, textCol).localCheckpoint(true)
    postings.withColumn("pfx", substring(col("term"), 1, 1))
      .write.mode("overwrite").partitionBy("pfx")
      .parquet(s"$dir/postings.parquet")
    dfsOf(postings)
      .withColumn("pfx", substring(col("term"), 1, 1))
      .write.mode("overwrite").partitionBy("pfx")
      .parquet(s"$dir/dfs.parquet")
    docs.select(col(idCol).cast("long").as("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/ids.parquet")
    val (nDocs, sumLen) = corpusStats(postings)
    writeBm25Meta(dir, Bm25Meta(nDocs, sumLen,
      math.round(k1 * 1e6), math.round(b * 1e6)))
  }

  /** Append an ingest batch to a persisted BM25 index WITHOUT a
    * rebuild (q139) — the maintenance op with a MUTABLE aggregate,
    * which the IVF/PQ appends don't have: document frequencies and
    * corpus stats change when docs arrive. Correctness is still an
    * exact identity, because every stored quantity is either
    * doc-local or ADDITIVE, and the additive ones are stored as
    * SIGNED SEGMENTS summed at serve (round-20 — the ingest-cycle
    * snapshot-isolation move):
    *  - postings (term, doc_id, tf, len): tf and len are functions
    *    of the document alone — batch rows land as one new prefix-
    *    partitioned SEGMENT dir, existing segments untouched;
    *  - dfs (term, df, maxtf, minlen): df(union) = df(existing) +
    *    df(batch), maxtf maxes, minlen mins — the batch's own stats
    *    land as one new segment and [[mergedDfs]] sum/max/min-merges
    *    at serve (a freshly built or [[compactBm25Dfs]]-compacted
    *    index is single-segment and skips the merge);
    *  - `_meta.json` stats: nDocs and sumLen are sums — the updated
    *    meta is REPLACED as an epoch-named file.
    * All four changes commit as ONE atomic manifest swap: a
    * concurrent reader serves the pre-append index or the
    * post-append index, never a torn cycle (and never a vanished
    * part-file — nothing here touches a served dir); a crash before
    * the commit leaves NO visible state change, so the retry re-runs
    * the whole cycle cleanly. Serving after an append answers the
    * SAME oracle as a fresh build — BM25 scores of existing docs
    * legitimately move when df moves; that is the ranking function's
    * corpus-relativity, not drift (IndexPathSpec pins append ≡
    * union-corpus build on postings rows AND the merged df table).
    *
    * Per-cycle cost ∝ batch: one batch tokenize, three segment
    * writes, one meta file, one manifest swap — the existing corpus
    * is NEVER read (the round-19 touched-prefix dfs rewrite is gone
    * entirely). Segment-count growth is the LSM trade;
    * [[Warehouse.compactIndexPartitions]] (postings),
    * [[Warehouse.compactUnpartitionedLedger]] (ids) and
    * [[compactBm25Dfs]] fold it back at the compaction cadence.
    *
    * APPEND-ONLY contract, enforced: a batch id already in the
    * index would not just duplicate candidate rows (the benign IVF/
    * PQ-append failure shape) — it would double-count df and nDocs
    * and move EVERY score, so re-ingesting an indexed doc fails
    * loudly against the stored id ledger (a broadcast probe of the
    * batch ids against the 8-byte `ids.parquet` column — exchange ∝
    * duplicates, the q136 verify shape). An empty batch (or one
    * whose docs all tokenize to zero terms) is a no-op, not an NPE
    * (round-16 review). Deletes are [[deleteFromBm25Index]] (df
    * subtraction + serve-time tombstones; updates = delete + purge +
    * re-append); a TOMBSTONED id stays un-appendable until
    * [[purgeBm25Deletes]] physically reclaims its old rows. */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = Warehouse.withIndexWriter(dir) {
    val txn = new Warehouse.EpochTxn(spark, dir)
    val snap = txn.snap
    val m = readBm25Meta(snap)
    val batchIds = batch.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    // a zero-ROW batch is a pure no-op — return before the dup
    // probe AND before any segment write (an unconditional ledger
    // append would add one empty segment per empty cycle; round-17
    // review)
    if (batchIds.isEmpty) return
    // the ledger probe only sees PREVIOUSLY indexed ids — a doc
    // appearing twice within this batch needs its own guard, on the
    // SAME cast the ledger stores
    Warehouse.requireUniqueBatchIds(batch, col(idCol).cast("long"),
      "BM25 index")
    // a TOMBSTONED id is not re-ingestable: its physical posting rows
    // would resurface next to the new generation's under one doc_id
    // once the anti-join filter lifts — purge first. Checked BEFORE
    // the generic ledger probe (tombstoned ids are still in
    // ids.parquet until a purge, and the purge-first message is the
    // actionable one).
    if (snap.hasPhysical("dels.parquet")) {
      val ghosts = snap.read(spark, "dels.parquet")
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(ghosts.isEmpty,
        s"BM25 index at $dir: doc ids ${ghosts.mkString(", ")}… are " +
          "tombstoned — re-ingesting before purgeBm25Deletes would " +
          "resurface their old posting rows under the same id; purge " +
          "first")
    }
    Warehouse.requireAppendOnly(
      snap.read(spark, "ids.parquet"), batchIds, "doc_id",
      s"BM25 index at $dir",
      "double-count df/nDocs and corrupt every score")
    val postings = postingsOf(batch, idCol, textCol)
      .localCheckpoint(true)
    val (bDocs, bLen) = corpusStats(postings)
    if (bDocs == 0) {
      // zero-token batch: no postings/df/stat changes, but the ids
      // still enter the ledger — buildBm25Index ledgers every doc id
      // regardless of token count, and an unledgered id would pass
      // the dup guard on a later re-ingest (round-16 advice)
      txn.appendSegment("ids.parquet", batchIds)
      txn.commit()
      return
    }
    txn.appendSegment("postings.parquet",
      postings.withColumn("pfx", substring(col("term"), 1, 1)),
      Seq("pfx"))
    txn.appendSegment("dfs.parquet", dfsOf(postings)
      .withColumn("pfx", substring(col("term"), 1, 1)), Seq("pfx"))
    txn.appendSegment("ids.parquet", batchIds)
    txn.replaceFile("_meta.json")(f =>
      java.nio.file.Files.writeString(f.toPath, bm25MetaJson(
        m.copy(nDocs = m.nDocs + bDocs, sumLen = m.sumLen + bLen))))
    txn.commit()
  }

  /** Tombstone DELETES for the BM25 index (q161) — the retrieval twin
    * of the substring index's signed-multiset deletes, closing the
    * "delete + rebuild" answer for this family too. Every stored
    * quantity either subtracts EXACTLY or stays SAFE:
    *  - `dfs`: df(remaining) = df − df(batch) — the same additive
    *    identity the append merges with, rewritten for the touched
    *    prefixes only (rows reaching df = 0 drop — the term no longer
    *    exists in the remaining corpus, matching a rebuild);
    *  - `_meta.json` stats: nDocs and sumLen subtract;
    *  - postings: the deleted docs' rows stay physically present and
    *    serving filters them with an anti-join against the
    *    `dels.parquet` tombstone ledger (un-hinted — AQE broadcasts
    *    the ledger while deletion volume is small, degrades to a
    *    shuffle otherwise; [[purgeBm25Deletes]] is the physical
    *    reclaim);
    *  - maxtf/minlen pruning bounds are NOT recomputed — max/min are
    *    not groups — but a stale bound is a SUPERSET bound: the
    *    per-term ub can only overestimate, so max-score pruning stays
    *    SAFE, merely less tight, until a purge-then-rebuild or fresh
    *    build re-tightens it.
    * Serving after a delete therefore equals a fresh build on the
    * remaining corpus EXACTLY (scores read df/nDocs/sumLen/tf/len,
    * all corrected; the bounds only gate which docs get fully scored
    * — RetrievalSpec pins served ≡ rebuilt-without and the df table;
    * the q161 oracle gates it end-to-end).
    *
    * Contract: the caller deletes the SAME (id, text) rows it
    * ingested (the standard tombstone contract — df subtraction
    * recomputes the batch's postings from the caller's text). Every
    * batch id must be indexed and not already tombstoned. UNLIKE the
    * substring index, a tombstoned id is NOT re-ingestable — its
    * physical posting rows would resurface next to the new
    * generation's under one doc_id — until [[purgeBm25Deletes]]
    * physically removes them (the append guard refuses with a
    * purge-first message). */
  def deleteFromBm25Index(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = Warehouse.withIndexWriter(dir) {
    val txn = new Warehouse.EpochTxn(spark, dir)
    val snap = txn.snap
    val m = readBm25Meta(snap)
    val batchIds = batch.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    if (batchIds.isEmpty) return
    Warehouse.requireUniqueBatchIds(batch, col(idCol).cast("long"),
      "BM25 index delete")
    // every id must be indexed… (ledger semi-joined MAP-SIDE against
    // the broadcast batch first — a direct batch-anti-ledger join
    // would shuffle the corpus-sized ledger, round-18 review — then
    // two batch-sized sets anti-join)
    val present = snap.read(spark, "ids.parquet")
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val unindexed = batchIds.join(present, Seq("doc_id"), "left_anti")
      .limit(5).collect().map(_.getLong(0))
    require(unindexed.isEmpty,
      s"BM25 index at $dir: doc ids ${unindexed.mkString(", ")}… were " +
        "never ingested — deleting them would subtract dfs that were " +
        "never added")
    // …and not already tombstoned
    if (snap.hasPhysical("dels.parquet")) {
      val twice = snap.read(spark, "dels.parquet")
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(twice.isEmpty,
        s"BM25 index at $dir: doc ids ${twice.mkString(", ")}… are " +
          "already tombstoned — a second delete would subtract their " +
          "dfs twice")
    }
    val postings = postingsOf(batch, idCol, textCol)
      .localCheckpoint(true)
    val (bDocs, bLen) = corpusStats(postings)
    // refuse to empty the index: an inverted file over zero docs has
    // nothing to serve — the delete-everything degenerate belongs to
    // delete-the-directory + rebuild (round-18 review)
    require(m.nDocs - bDocs > 0,
      s"BM25 index at $dir: this delete removes every indexed " +
        "document — an empty inverted file has nothing to serve; " +
        "delete the index directory and rebuild instead")
    // the whole delete is ONE atomic commit (round-20): tombstone
    // ledger segment + the batch's dfs NEGATED as one more segment
    // (the append's identity with the sign flipped — [[mergedDfs]]'s
    // sum cancels the mass exactly, and terms whose df reaches 0
    // drop at its df > 0 filter, matching a rebuild) + the
    // subtracted corpus stats. A crash before the commit leaves NO
    // visible state, so the retry re-runs cleanly — the round-18
    // ledger-first ordering this replaces protected a narrower
    // window and still needed rebuild-on-crash. maxtf/minlen bounds
    // are NOT subtracted (max/min don't cancel): a null-bound delta
    // row leaves the stored bound in place, a stale SUPERSET bound —
    // max-score pruning stays safe, merely less tight, until a
    // rebuild re-tightens it (the round-19 contract, unchanged).
    txn.appendSegment("dels.parquet", batchIds)
    if (bDocs > 0) {
      txn.appendSegment("dfs.parquet", dfsOf(postings)
        .select(col("term"), (-col("df")).as("df"),
          lit(null).cast("long").as("maxtf"),
          lit(null).cast("int").as("minlen"))
        .withColumn("pfx", substring(col("term"), 1, 1)), Seq("pfx"))
    }
    txn.replaceFile("_meta.json")(f =>
      java.nio.file.Files.writeString(f.toPath, bm25MetaJson(
        m.copy(nDocs = m.nDocs - bDocs, sumLen = m.sumLen - bLen))))
    txn.commit()
  }

  /** Filter tombstoned docs out of a postings scan — the serve-side
    * half of [[deleteFromBm25Index]]. Absent ledger = the pre-delete
    * layout, no filter (still v2: the file is purely additive). */
  private def withoutTombstones(
      spark: org.apache.spark.sql.SparkSession,
      snap: Warehouse.IndexSnapshot, postings: DataFrame): DataFrame =
    if (!snap.has("dels.parquet")) postings
    else postings.join(snap.read(spark, "dels.parquet"),
      Seq("doc_id"), "left_anti")

  /** The served per-term statistics view over the SIGNED dfs segment
    * list: sum df (append segments positive, delete segments
    * negative — terms cancelling to 0 drop, matching a rebuild), max
    * maxtf / min minlen (delete segments carry null bounds, which
    * max/min ignore — the stale-superset-bound contract). A
    * SINGLE-segment table is by construction a fresh build or a
    * [[compactBm25Dfs]] output — one positive row per term — so the
    * merge is skipped and the serve plan is byte-identical to the
    * round-19 one (no aggregate on the hot path of a compacted
    * index). `prefixes` prunes every segment scan to the probed
    * partitions before the merge. */
  private def mergedDfs(spark: org.apache.spark.sql.SparkSession,
      snap: Warehouse.IndexSnapshot, prefixes: Option[Seq[String]],
      restrictToTerms: Option[DataFrame] = None): DataFrame = {
    val raw0 = snap.read(spark, "dfs.parquet")
    val raw = prefixes match {
      case Some(p) => raw0.filter(col("pfx").isin(p: _*))
      case None => raw0
    }
    val pruned = raw.select(col("term"), col("df"), col("maxtf"),
      col("minlen"))
    if (snap.paths("dfs.parquet").lengthCompare(1) == 0) pruned
    else {
      // multi-segment merge, restricted to the QUERY'S TERMS before
      // the aggregate when the caller provides them: every serve-side
      // consumer joins dfs on term against the (tiny, broadcast)
      // query frame, and grouping key = join key makes the semi-join
      // pushdown exact — the merge's exchange then carries query
      // terms × segments instead of the vocabulary (Catalyst cannot
      // push a join below an aggregate itself, and the 10× bench
      // measured the difference at ~2× on the append-serving cell)
      val base = restrictToTerms match {
        case Some(t) => pruned.join(
          broadcast(t.select(col("term")).distinct()), Seq("term"),
          "left_semi")
        case None => pruned
      }
      base.groupBy(col("term"))
        .agg(sum(col("df")).as("df"), max(col("maxtf")).as("maxtf"),
          min(col("minlen")).as("minlen"))
        .filter(col("df") > 0)
    }
  }

  /** SUMMING compaction for the signed dfs segment list — folds all
    * segments into ONE with sum(df) > 0 rows only (cancelled terms
    * physically drop; bounds keep their stored max/min — still
    * supersets). Restores the single-segment fast path
    * [[mergedDfs]] serves builds with. [[Warehouse
    * .compactIndexPartitions]] must NOT run on dfs — it concatenates,
    * leaving signed rows inside one segment, which would break the
    * single-segment-is-summed invariant. Returns (rowsBefore,
    * rowsAfter); single-segment tables are a no-op (0, 0). */
  def compactBm25Dfs(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long) = Warehouse.withIndexWriter(dir) {
    val snap = Warehouse.indexSnapshot(dir)
    readBm25Meta(snap) // the meta gate
    if (snap.paths("dfs.parquet").lengthCompare(1) == 0)
      return (0L, 0L)
    val segs = snap.read(spark, "dfs.parquet")
    val before = segs.count()
    val merged = segs.groupBy(col("pfx"), col("term"))
      .agg(sum(col("df")).as("df"), max(col("maxtf")).as("maxtf"),
        min(col("minlen")).as("minlen"))
      .filter(col("df") > 0)
      .select(col("term"), col("df"), col("maxtf"), col("minlen"),
        col("pfx"))
      .localCheckpoint(true) // one materialization: count + write
    val after = merged.count()
    val epochName = Warehouse.epochDirName("dfs.parquet")
    merged.repartition(col("pfx")).write.partitionBy("pfx")
      .parquet(s"$dir/$epochName")
    Warehouse.commitEpoch(dir, snap.allTables
      + ("dfs.parquet" -> Seq(epochName)))
    (before, after)
  }

  /** Stored postings/dfs accessors for the bench harness (ScaleBench
    * reads the artifact's vocabulary to pick hot/rare terms and to
    * feed the exhaustive contrast) — raw `$dir/table` paths stopped
    * resolving when ingest went multi-segment. */
  private[graft] def storedPostings(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Warehouse.indexSnapshot(dir).read(spark, "postings.parquet")

  private[graft] def storedDfs(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    mergedDfs(spark, Warehouse.indexSnapshot(dir), None)

  /** Physically reclaim tombstoned docs: rewrite the postings
    * partitions without the deleted rows, shrink the id ledger to the
    * active set, drop the tombstone ledger — after which the purged
    * ids are re-ingestable again. Cost ∝ index (a full postings
    * rewrite — the compaction-tier operation, run at the deployment's
    * compaction cadence, not per delete). The maxtf/minlen bounds
    * stay conservative until a rebuild re-tightens them (documented;
    * safe — see [[deleteFromBm25Index]]).
    *
    * SNAPSHOT-ISOLATED (round-19): new postings and ids land in fresh
    * epoch dirs and the THREE-table change (postings rewritten, ids
    * shrunk, dels dropped) commits as ONE atomic manifest swap — a
    * concurrent reader serves either the pre-purge view (old postings
    * + tombstone anti-join) or the post-purge view (purged postings,
    * no ledger), never old postings without the ledger. Crash before
    * the swap leaves the pre-purge layout fully intact; the round-18
    * write-aside-then-swap window (ids dir briefly ABSENT) is gone.
    *
    * Returns (postingRowsBefore, postingRowsAfter); a ledger-less
    * index is a no-op (0, 0). */
  def purgeBm25Deletes(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long) = Warehouse.withIndexWriter(dir) {
    val snap = Warehouse.indexSnapshot(dir)
    readBm25Meta(snap) // the meta gate
    if (!snap.has("dels.parquet")) return (0L, 0L)
    val dels = snap.read(spark, "dels.parquet").distinct()
      .localCheckpoint(true)
    val p = snap.read(spark, "postings.parquet")
    val before = p.count()
    // the checkpoint only saves a second full scan (count + write) —
    // the epoch layout reads old files and writes new ones, so there
    // is no read-while-overwrite hazard left to guard
    val kept = p.join(dels, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val after = kept.count()
    // refuse to purge an index down to ZERO posting rows: an empty
    // inverted file has nothing to serve and a later read would fail
    // on a schema-less dir (round-18 review) — the everything-deleted
    // degenerate belongs to delete-the-directory + rebuild. Checked
    // BEFORE any mutation.
    require(after > 0,
      s"BM25 index at $dir: purging would remove every posting row " +
        "— an empty inverted file has nothing to serve; delete the " +
        "index directory and rebuild instead")
    val postEpoch = Warehouse.epochDirName("postings.parquet")
    kept.repartition(col("pfx"))
      .write.partitionBy("pfx")
      .parquet(s"$dir/$postEpoch")
    // active id ledger as one part-file — the ledger receipt must
    // keep measuring append-cycle accumulation, not this rewrite's
    // shuffle fan-out
    val idsEpoch = Warehouse.epochDirName("ids.parquet")
    snap.read(spark, "ids.parquet")
      .join(dels, Seq("doc_id"), "left_anti")
      .coalesce(1)
      .write.parquet(s"$dir/$idsEpoch")
    Warehouse.commitEpoch(dir, snap.allTables
      + ("postings.parquet" -> Seq(postEpoch))
      + ("ids.parquet" -> Seq(idsEpoch))
      - "dels.parquet")
    (before, after)
  }

  /** Serve BM25 from the persisted inverted file (q138): identical
    * results to the in-plan [[bm25TopK]] (the postings/dfs/stats are
    * the same deterministic derivation), with zero index-build cost
    * per query batch and BOTH artifact scans pruned to the query
    * terms' prefix partitions (IndexPathSpec asserts partitions read
    * == prefixes probed). */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, qidCol: String, qtextCol: String,
      dir: String, k: Int): DataFrame = {
    // ONE snapshot resolve per query batch: every read below — meta
    // included — belongs to the same epoch, so an append/delete/
    // purge/compaction committing mid-query can never mix old
    // postings with new stats or a dropped tombstone ledger
    val snap = Warehouse.indexSnapshot(dir)
    val m = readBm25Meta(snap)
    val qterms = queryTerms(queries, qidCol, qtextCol)
      .localCheckpoint(true)
    // the probed prefixes, driver-resolved into literal partition
    // filters: bounded (≤ 36 one-char strings), the plan-the-read
    // phase of any index lookup — pruning applies per segment root
    val prefixes = qterms.select(substring(col("term"), 1, 1).as("pfx"))
      .distinct().collect().map(_.getString(0)).sorted
    val postings = withoutTombstones(spark, snap,
      snap.read(spark, "postings.parquet")
        .filter(col("pfx").isin(prefixes.toSeq: _*))
        .select(col("term"), col("doc_id"), col("tf"), col("len")))
    val dfs = mergedDfs(spark, snap, Some(prefixes.toSeq),
      restrictToTerms = Some(qterms))
    bm25ServeMaxScore(qterms, postings, dfs, m.nDocs, m.sumLen, k,
      m.k1E6 / 1e6, m.bE6 / 1e6)
  }
}
