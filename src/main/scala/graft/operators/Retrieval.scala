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
  * list probes) and the scoring exchange carries only postings of
  * matched terms.
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

  /** The scoring phase shared by the in-plan and stored paths:
    * broadcast query terms meet postings on term, each match scores
    * odds(df) × tf-saturation(tf, len) in double, scores accumulate
    * per (query, doc) in exact decimal, and a top-k window ranks by
    * (score desc, doc_id asc). `nDocs`/`sumLen` are the corpus
    * stats; `dfs` is (term, df). */
  private def bm25Serve(qterms: DataFrame, postings: DataFrame,
      dfs: DataFrame, nDocs: Long, sumLen: Long, k: Int,
      k1: Double, b: Double): DataFrame = {
    // avgdl once, driver-side: one double division, same literal on
    // both engines
    val avgdl = sumLen.toDouble / nDocs.toDouble
    val qd = qterms.join(dfs, Seq("term")) // query terms with df
    val odds = (lit(nDocs.toDouble) - col("df").cast("double") +
      lit(0.5)) / (col("df").cast("double") + lit(0.5))
    val tfd = col("tf").cast("double")
    val tfpart = (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("len").cast("double") / lit(avgdl))))
    val scored = postings.join(broadcast(qd), Seq("term"))
      .withColumn("c", (odds * tfpart).cast("decimal(28,12)"))
      .groupBy(col("query_id"), col("doc_id"))
      // exact decimal accumulation: the per-term doubles are
      // bit-identical cross-engine, and the decimal sum makes the
      // total independent of partitioning/row order
      .agg(sum(col("c")).cast("decimal(38,12)").as("s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double"), 6).as("score"), col("rank"))
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
    * the ONE reader the append and serving paths share (round-16
    * review: the require + regex was duplicated verbatim). */
  private def readBm25Meta(dir: String): Bm25Meta = {
    val p = java.nio.file.Paths.get(s"$dir/_meta.json")
    require(java.nio.file.Files.exists(p),
      s"BM25 index at $dir has no _meta.json — not a complete " +
        "buildBm25Index artifact; rebuild the index")
    val meta = java.nio.file.Files.readString(p)
    def metaLong(key: String): Long =
      s""""$key":(\\d+)""".r.findFirstMatchIn(meta) match {
        case Some(m) => m.group(1).toLong
        case None => throw new IllegalArgumentException(
          s"BM25 index meta at $dir lacks '$key': $meta")
      }
    Bm25Meta(metaLong("nDocs"), metaLong("sumLen"),
      metaLong("k1E6"), metaLong("bE6"))
  }

  private def writeBm25Meta(dir: String, m: Bm25Meta): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_meta.json"),
      s"""{"nDocs":${m.nDocs},"sumLen":${m.sumLen},""" +
        s""""k1E6":${m.k1E6},"bE6":${m.bE6}}""")

  /** In-plan BM25 top-k (q137): postings, dfs, and corpus stats all
    * derive in one job — the interactive path; [[buildBm25Index]] +
    * [[bm25TopKFromIndex]] are the deployment path. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = postingsOf(docs, idCol, textCol).localCheckpoint(true)
    val dfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val (nDocs, sumLen) = corpusStats(postings)
    bm25Serve(queryTerms(queries, qidCol, qtextCol), postings, dfs,
      nDocs, sumLen, k, k1, b)
  }

  /** Persist the inverted file to `dir`:
    *  - `postings.parquet` (term, doc_id, tf, len), partitioned by
    *    the term's first character — queries resolve their terms'
    *    prefixes driver-side into literal partition filters, so a
    *    batch touching 3 prefixes reads 3/36ths of the index (the
    *    sandbox-scale stand-in for hash-bucket routing; same static
    *    pruning mechanics as the IVF list probes);
    *  - `dfs.parquet` (term, df, pfx) — same partitioning;
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
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
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
    * doc-local or additive:
    *  - postings (term, doc_id, tf, len): tf and len are functions
    *    of the document alone — batch rows APPEND into the matching
    *    prefix partitions, existing rows untouched;
    *  - dfs (term, df): df(union) = df(existing) + df(batch) — the
    *    batch's own term→count merges in by rewriting ONLY the
    *    prefix partitions the batch's terms touch (dynamic
    *    partition overwrite; untouched prefixes are never read);
    *  - `_meta.json` stats: nDocs and sumLen are sums.
    * So append ≡ the index buildBm25Index would write for the union
    * corpus, row for row (IndexPathSpec pins it), and serving after
    * an append answers the SAME oracle as a fresh build — BM25
    * scores of existing docs legitimately move when df moves; that
    * is the ranking function's corpus-relativity, not drift.
    *
    * Per-cycle cost ∝ batch: one batch tokenize, one partitioned
    * postings append, a dfs rewrite of the touched prefixes (each
    * read scans one prefix's (term, df) rows — vocabulary-sized ÷
    * prefix fanout, never the postings), one meta rewrite. Like
    * every partitioned append here, it belongs inside an artifact
    * build or behind the deployment's ingest-cycle barrier.
    *
    * APPEND-ONLY contract, enforced: a batch id already in the
    * index would not just duplicate candidate rows (the benign IVF/
    * PQ-append failure shape) — it would double-count df and nDocs
    * and move EVERY score, so re-ingesting an indexed doc fails
    * loudly against the stored id ledger (a broadcast probe of the
    * batch ids against the 8-byte `ids.parquet` column — exchange ∝
    * duplicates, the q136 verify shape). An empty batch (or one
    * whose docs all tokenize to zero terms) is a no-op, not an NPE
    * (round-16 review). Updates/deletes are out of scope: delete +
    * rebuild, the standard inverted-file answer. */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val m = readBm25Meta(dir)
    val batchIds = batch.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    val dup = spark.read.parquet(s"$dir/ids.parquet")
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"BM25 index at $dir already contains batch doc ids " +
        s"${dup.mkString(", ")}… — re-ingesting an indexed doc would " +
        "double-count df/nDocs and corrupt every score; the append " +
        "contract is append-only (delete + rebuild to update)")
    val postings = postingsOf(batch, idCol, textCol)
      .localCheckpoint(true)
    val (bDocs, bLen) = corpusStats(postings)
    if (bDocs == 0) {
      // zero-token batch: no postings/df/stat changes, but the ids
      // still enter the ledger — buildBm25Index ledgers every doc id
      // regardless of token count, and an unledgered id would pass
      // the dup guard on a later re-ingest (round-16 advice)
      batchIds.write.mode("append").parquet(s"$dir/ids.parquet")
      return
    }
    postings.withColumn("pfx", substring(col("term"), 1, 1))
      .write.mode("append").partitionBy("pfx")
      .parquet(s"$dir/postings.parquet")
    val batchDfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("bdf"))
      .withColumn("pfx", substring(col("term"), 1, 1))
      .localCheckpoint(true)
    // df merge, touched prefixes only: read those partitions' stored
    // (term, df), outer-join the batch counts, rewrite just those
    // partitions (dynamic partition overwrite — untouched prefixes
    // keep their files)
    val touched = batchDfs.select(col("pfx")).distinct()
      .collect().map(_.getString(0)).sorted
    val storedDfs = spark.read.parquet(s"$dir/dfs.parquet")
      .filter(col("pfx").isin(touched.toSeq: _*))
      .select(col("term"), col("df"))
      .localCheckpoint(true) // materialize BEFORE overwriting the files
    val merged = storedDfs
      .join(batchDfs.select(col("term"), col("bdf")), Seq("term"), "full")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("bdf"), lit(0L)))
          .as("df"))
      .withColumn("pfx", substring(col("term"), 1, 1))
    // per-WRITE dynamic overwrite (not a session-conf toggle): a
    // concurrent writer in the same session must never inherit
    // DYNAMIC from this append's window (round-16 verdict)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pfx")
      .parquet(s"$dir/dfs.parquet")
    // the id ledger grows with the batch; corpus stats are additive
    batchIds.write.mode("append").parquet(s"$dir/ids.parquet")
    writeBm25Meta(dir, m.copy(nDocs = m.nDocs + bDocs,
      sumLen = m.sumLen + bLen))
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
    val m = readBm25Meta(dir)
    val qterms = queryTerms(queries, qidCol, qtextCol)
      .localCheckpoint(true)
    // the probed prefixes, driver-resolved into literal partition
    // filters: bounded (≤ 36 one-char strings), the plan-the-read
    // phase of any index lookup
    val prefixes = qterms.select(substring(col("term"), 1, 1).as("pfx"))
      .distinct().collect().map(_.getString(0)).sorted
    val postings = spark.read.parquet(s"$dir/postings.parquet")
      .filter(col("pfx").isin(prefixes.toSeq: _*))
      .select(col("term"), col("doc_id"), col("tf"), col("len"))
    val dfs = spark.read.parquet(s"$dir/dfs.parquet")
      .filter(col("pfx").isin(prefixes.toSeq: _*))
      .select(col("term"), col("df"))
    bm25Serve(qterms, postings, dfs, m.nDocs, m.sumLen, k,
      m.k1E6 / 1e6, m.bE6 / 1e6)
  }
}
