package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Max-score (WAND-family) pruning contract: result-IDENTICAL to the
  * exhaustive reference on every corpus, and on a corpus with a
  * deliberately hot term the scoring exchange must shrink — the
  * round-16 verdict #2 gap (one stopword-ish term made the exchange
  * corpus-sized at 100 TB).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("max-score serving equals the exhaustive reference on the harness " +
    "corpus (all query shapes)") {
    val docs = Tables.documents(spark, sf)
    // the q137 query fixture plus a single-term and an
    // absent-term query — the no-pruning edge shapes
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ",
          slice(Retrieval.alnumTokens(col("text")), 1, 5)).as("qtext"))
      .unionByName(Seq(
        (9001L, "the"),
        (9002L, "zzzzneverinthecorpus")).toDF("query_id", "qtext"))
      .localCheckpoint(true)
    // serve both ways over the SAME artifact frames
    val dir = java.nio.file.Files.createTempDirectory("rspec").toString
    try {
      Retrieval.buildBm25Index(docs, "doc_id", "text", dir)
      val postings = spark.read.parquet(s"$dir/postings.parquet")
        .select(col("term"), col("doc_id"), col("tf"), col("len"))
        .localCheckpoint(true)
      val dfs = graft.operators.Retrieval.storedDfs(spark, dir)
        .select(col("term"), col("df"), col("maxtf"), col("minlen"))
        .localCheckpoint(true)
      val stats = postings.select(col("doc_id"), col("len")).distinct()
        .agg(count(lit(1)), sum(col("len"))).collect()(0)
      val (n, sl) = (stats.getLong(0), stats.getLong(1))
      val qterms = queries.select(col("query_id"),
        explode(array_distinct(
          Retrieval.alnumTokens(col("qtext")))).as("term"))
        .localCheckpoint(true)
      val exhaustive = rows(Retrieval.bm25Serve(qterms, postings, dfs,
        n, sl, 10, 1.2, 0.75))
      val pruned = rows(Retrieval.bm25ServeMaxScore(qterms, postings,
        dfs, n, sl, 10, 1.2, 0.75))
      assert(exhaustive.nonEmpty)
      assert(pruned == exhaustive,
        s"max-score diverges: missing ${(exhaustive -- pruned).take(5)}, "
          + s"extra ${(pruned -- exhaustive).take(5)}")
    } finally graft.operators.Warehouse.deleteRec(new java.io.File(dir))
  }

  test("hot-term corpus: pruning shrinks the scoring exchange, result " +
    "identical (the WAND law)") {
    // 200 docs, every one carrying the hot term; 20 carrying the
    // rare marker. Query = rare + hot: the hot term's ub (odds ≈
    // 0.5/n) cannot reach the floor set by the rare term's
    // contributions, so its 200-posting list must stay OUT of the
    // exchange.
    val docs = (0L until 200L).map { i =>
      val rare = if (i % 10 == 0) " marker" else ""
      (i, s"hot filler$i common$rare text")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rspec2").toString
    try {
      Retrieval.buildBm25Index(docs, "doc_id", "text", dir)
      val postings = spark.read.parquet(s"$dir/postings.parquet")
        .select(col("term"), col("doc_id"), col("tf"), col("len"))
        .localCheckpoint(true)
      val dfs = graft.operators.Retrieval.storedDfs(spark, dir)
        .select(col("term"), col("df"), col("maxtf"), col("minlen"))
        .localCheckpoint(true)
      val (n, sl) = {
        val r = postings.select(col("doc_id"), col("len")).distinct()
          .agg(count(lit(1)), sum(col("len"))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val qterms = Seq((1L, "marker"), (1L, "hot"))
        .toDF("query_id", "term").localCheckpoint(true)
      val k = 5
      val exhaustive = rows(Retrieval.bm25Serve(qterms, postings, dfs,
        n, sl, k, 1.2, 0.75))
      val pruned = rows(Retrieval.bm25ServeMaxScore(qterms, postings,
        dfs, n, sl, k, 1.2, 0.75))
      assert(pruned == exhaustive, "pruned ranking diverges")
      // every top-k doc must carry the rare term (the hot-only docs
      // are exactly the prunable mass)
      assert(exhaustive.forall { case (_, d, _, _) => d % 10 == 0 })
      // the pruning law, measured: candidate-matched posting volume
      // strictly below the total matched volume — the hot term's
      // corpus-sized list stays out of the exchange
      val candidates = Retrieval.maxScoreCandidates(qterms, postings,
        dfs, n, sl, k, 1.2, 0.75).localCheckpoint(true)
      val candDocs = candidates.select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(candDocs == (0L until 200L).filter(_ % 10 == 0).toSet,
        s"candidates should be exactly the rare-term docs: $candDocs")
      val totalMatched = postings
        .join(qterms.select(col("term")).distinct(), Seq("term"))
        .count()
      val scoredVolume = postings
        .join(qterms, Seq("term"))
        .join(candidates, Seq("query_id", "doc_id"), "left_semi")
        .count()
      assert(totalMatched == 220L, s"fixture drifted: $totalMatched")
      assert(scoredVolume == 40L,
        s"expected 20 rare + 20 hot-on-candidate rows, got $scoredVolume")
    } finally graft.operators.Warehouse.deleteRec(new java.io.File(dir))
  }

  test("max-score bounds survive an append: merged maxtf/minlen equal " +
    "the union build's") {
    val docs = (0L until 100L).map { i =>
      (i, s"alpha beta w$i " + ("pad " * (i % 7).toInt).trim)
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rspec3").toString
    try {
      Retrieval.buildBm25Index(docs.filter(col("doc_id") % 4 =!= 3),
        "doc_id", "text", s"$dir/a")
      Retrieval.appendToBm25Index(spark,
        docs.filter(col("doc_id") % 4 === 3), "doc_id", "text", s"$dir/a")
      Retrieval.buildBm25Index(docs, "doc_id", "text", s"$dir/b")
      def dfs(d: String) = graft.operators.Retrieval.storedDfs(spark, d)
        .select(col("term"), col("df"), col("maxtf"), col("minlen"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(dfs(s"$dir/a") == dfs(s"$dir/b"),
        "merged pruning bounds diverge from the union build")
    } finally graft.operators.Warehouse.deleteRec(new java.io.File(dir))
  }
}
