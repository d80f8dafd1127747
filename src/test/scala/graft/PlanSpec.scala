package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the scale contract (SURVEY §4): filters
  * reach the parquet scan, projections prune columns, dimension joins
  * broadcast. These lock in the plan shape so a refactor that silently
  * breaks pushdown fails CI, not the 100 TB run. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  import graft.operators.Reports

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val plan = executedPlan(Reports.q01PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$plan")
  }

  test("q01: scan reads only the referenced columns") {
    val plan = executedPlan(Reports.q01PricingSummary(spark, sf))
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"),
      s"scan reads unused columns: $read")
  }

  test("q03: dimension joins broadcast (no fact shuffle for dims)") {
    val plan = executedPlan(Reports.q03SalesRegister(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q03: orderdate filter pushed down to the orders scan") {
    val plan = executedPlan(Reports.q03SalesRegister(spark, sf))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"missing orderdate pushdown in:\n$plan")
  }

  test("q11: monthly roll-up uses partial (map-side) aggregation") {
    val plan = executedPlan(Reports.q11Monthly(spark, sf))
    // two HashAggregates (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("bucketed co-located join is shuffle-free (the warehouse story)") {
    import spark.implicits._
    // a previous JVM's managed-table dirs survive on disk while the
    // in-memory catalog forgets them — clear both sides first
    Seq("plan_bt_a", "plan_bt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    Seq(("g1", 1), ("g2", 2), ("g3", 3)).toDF("guid", "v")
      .write.bucketBy(4, "guid").sortBy("guid")
      .mode("overwrite").saveAsTable("plan_bt_a")
    Seq(("g1", 10), ("g2", 20)).toDF("guid", "w")
      .write.bucketBy(4, "guid").sortBy("guid")
      .mode("overwrite").saveAsTable("plan_bt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("plan_bt_a")
        .join(spark.table("plan_bt_b"), "guid")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q07: top-1-per-group runs a single window over one sort") {
    val plan = executedPlan(Reports.q07TopOrderPerCustomer(spark, sf))
    assert(plan.contains("Window"))
    assert(plan.contains("RunningWindowFunction") ||
      "row_number".r.findAllIn(plan).nonEmpty)
  }

  test("q48: bucketed near-dup pair generation contains no cross join") {
    val plan = executedPlan(
      graft.operators.Curation.q48EmbedNearDupLsh(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed near-dup degenerated to a cross join:\n$plan")
  }

  test("q64: eval gram side broadcasts — the corpus is never shuffled") {
    val plan = executedPlan(
      graft.operators.Curation.q64Decontamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q62: incremental dedup is equi-joins only, no cross join") {
    val plan = executedPlan(
      graft.operators.Curation.q62DedupIncremental(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup degenerated to a cross join:\n$plan")
  }

  test("ANN plan construction launches zero Spark jobs (no driver probes)") {
    import graft.operators.Similarity
    // round-8 verdict #2: lshTopK/saltedKeysAgg used to run a take(1)
    // dims probe at plan-build time — at 100 TB a blocking driver
    // round-trip before any useful work. Construction must be lazy.
    // table load happens BEFORE the watch window: spark.read.parquet
    // itself runs a footer/schema job (Spark's, for any read — not an
    // operator probe)
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
    // the async listener bus may still hold JobStart events from prior
    // work when this listener registers — count only jobs that START
    // after this point, and sort marker sub-jobs out by job group
    val groups = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t0 = System.currentTimeMillis()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (s.time >= t0) {
          val props = Option(s.properties)
          val grp = props.map(_.getProperty("spark.jobGroup.id", "none"))
            .getOrElse("none")
          // carry the callsite so a failure NAMES the probe
          val site = props
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          val detail = s.stageInfos.headOption.map(_.details.linesIterator
            .take(3).mkString(" | ")).getOrElse("")
          groups.add(if (grp == "ann-marker") grp
            else s"$grp [$site] $detail")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      Similarity.lshTopK(q, e, "vec_id", "embedding", k = 5,
        planes = 4, tables = 4)
      // the round-9 regression spot (ADVICE r9 #1): the scale-derived
      // near-dup path used to run a sampled-count runJob at plan
      // construction when candidatesPerVector > 0. With a size hint
      // (q48 reads parquet footers — driver metadata, not a Spark job)
      // construction must stay job-free.
      Similarity.cosineNearDupPairsLsh(
        graft.operators.Curation.flippedNearDupCorpus(e),
        "vec_id", "embedding", minCosine = 0.9,
        candidatesPerVector = 32.0, corpusSizeHint = 4000L)
      // the round-14 quantized-domain scorer inherits the contract:
      // pure projections + broadcast join + window, zero construction
      // jobs. (ivfSq8TopK is deliberately NOT here: ivfCandidates
      // runs the checkpointed k-means BUILD eagerly by design — the
      // index-build phase a deployment stages to storage, not a plan
      // probe.)
      Similarity.quantizedTopK(q, e, "vec_id", "embedding", k = 5)
      // (the shipped q48 entry is NOT constructed here: its
      // Tables.embeddings read triggers Spark's own footer/schema jobs
      // — read machinery, not operator probes, same reason the table
      // load above sits before the watch window. Its footer-count hint
      // is driver-side Hadoop I/O, covered by the parquetRowCount test)
      // marker action: the listener bus is FIFO, so once the marker's
      // jobs arrive, any construction-time job would already have been
      // recorded — and would carry a different (or no) job group
      spark.sparkContext.setJobGroup("ann-marker", "marker")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!groups.contains("ann-marker") && System.nanoTime() < deadline)
        Thread.sleep(20)
      val nonMarker = {
        val it = groups.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) { val g = it.next(); if (g != "ann-marker") b += g }
        b.result()
      }
      assert(groups.contains("ann-marker"), "marker job never observed")
      assert(nonMarker.isEmpty,
        s"ANN construction launched ${nonMarker.size} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("parquetRowCount: footer count is exact and layout-independent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("footer").toString
    // multi-file layout: the count must be the SUM over part files
    (1 to 137).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(5).write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.parquetRowCount(spark, s"$dir/t.parquet") == 137L)
    // and on the harness table it equals the true count
    val n = Tables.embeddings(spark, sf).count()
    assert(Tables.parquetRowCount(spark, s"$sf/embeddings.parquet") == n)
  }

  test("q21: exactly ONE grams-to-grams self-join in the plan") {
    import spark.implicits._
    // uncapped (no stop-shingle anti-join), so every join keyed on the
    // gram column IS the self-join — the round-2 shape ran it twice
    // (candidate pass + intersection pass); the fix derives pairs from
    // the single aggregated intersection join
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val q = graft.operators.TextDedup.ngramJaccardPairs(
      df, "doc_id", "text", n = 3, minJaccard = 0.8)
    q.collect()
    // AQE's toString prints the final AND the initial plan — count
    // joins only in the final one
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val gramJoins =
      "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)(?:\\w*)? \\[g#"
        .r.findAllIn(plan).length
    assert(gramJoins == 1,
      s"expected exactly 1 gram self-join, found $gramJoins in:\n$plan")
  }

  test("spread(): a pre-split input shows no Exchange before a wide op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    // write `documents` with >= defaultParallelism splits — the
    // cluster-scale arrival shape; spread() must pass it through
    val par = spark.sparkContext.defaultParallelism
    (1 to 200).map(i => (i.toLong, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pre-split input still repartitions:\n$plan")
    // and the single-file local case still spreads
    (1 to 50).map(i => (i.toLong, s"t $i", "en")).toDF("doc_id", "text", "lang")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = Tables.documents(spark, dir)
    assert(one.rdd.getNumPartitions >= par)
  }

  test("q21: gram self-join is bounded by the stop-shingle cap") {
    import spark.implicits._
    // 60 docs sharing one boilerplate shingle + 2 genuine near-dups:
    // uncapped, the hot shingle alone creates C(60,2) = 1770 candidate
    // pairs; capped at df<=10 it creates none, yet the true near-dup
    // pair (unique shingles) must survive
    val hot = "lorem ipsum dolor"
    val docs = (1 to 60).map(i => (i.toLong, s"$hot unique$i a$i b$i c$i")) ++
      Seq((100L, "same same text here exactly"),
          (101L, "same same text here exactly"))
    val df = docs.toDF("doc_id", "text")
    val pairs = graft.operators.TextDedup.ngramJaccardPairs(
      df, "doc_id", "text", n = 3, minJaccard = 0.8, maxShingleDf = 10)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 101L)), pairs.mkString(","))
  }

  test("bounded CC reuses the edge exchange across rounds") {
    // every propagation round joins the SAME symmetric edge set; the
    // physical plan must compute that subplan once and ReusedExchange
    // it in later rounds — with a full MinHash pipeline as the edge
    // input (q68/q72), recomputing it per round would multiply the
    // dominant cost by the round count
    import graft.operators.Components
    import spark.implicits._
    val edges = (1L to 200L).map(i => (i, i % 97L + 1000L)).toDF("a", "b")
    val df = Components.connectedComponentsBounded(edges)
    val plan = executedPlan(df)
    val fin = plan.split("== Initial Plan ==").head
    val reused = "ReusedExchange".r.findAllMatchIn(fin).size
    assert(reused >= 4,
      s"expected the edge exchange reused in rounds 2-5, got $reused in:\n$fin")
  }

  test("q84: passage occurrence join reuses the digest exchange") {
    // the occurrence count aggregates (id, digest) rows grouped on the
    // digest and the per-doc rollup joins the SAME rows back on that
    // key — one digest exchange, reused, and never any form of
    // cartesian: the wide state is 16-byte digests end to end
    import graft.operators.TextDedup
    import spark.implicits._
    val df = (1 to 60)
      .map(i => (i.toLong, s"w$i " * 3 + ("common block " * 5)))
      .toDF("doc_id", "text")
    val plan = executedPlan(
      TextDedup.passageDupStats(df, "doc_id", "text", passageLen = 5))
    val fin = plan.split("== Initial Plan ==").head
    // two acceptable shapes: the shuffle join reusing the digest
    // exchange (what a corpus-scale run plans), or AQE demoting the
    // tiny occurrence side to a broadcast hash join (what this
    // fixture-sized run picks) — both keyed on the digest, neither
    // any form of cartesian
    assert("ReusedExchange".r.findAllMatchIn(fin).nonEmpty ||
      fin.contains("BroadcastHashJoin"),
      s"expected digest-exchange reuse or a broadcast digest join in:\n$fin")
    assert(!fin.contains("CartesianProduct") &&
      !fin.contains("BroadcastNestedLoop"), s"cartesian in:\n$fin")
  }

  test("q86: shard manifest plans no join at all") {
    // one projection + one shard-partitioned window (+ the final
    // presentation sort): a join anywhere means the manifest stopped
    // being a pure re-key of the corpus
    val plan = executedPlan(
      graft.operators.Curation.q86ShardManifest(spark, sf))
    val fin = plan.split("== Initial Plan ==").head
    assert(!fin.contains("Join"), s"unexpected join in:\n$fin")
    assert(fin.contains("Window"), s"expected the shard window in:\n$fin")
  }

  test("q88/q89: passage forensics plan digest-keyed, never cartesian") {
    // q88's source-pair matrix: the only join is the digest self-join
    // (bounded per digest by the source count); q89's effective-token
    // rollup: one digest-partitioned window, no join at all
    val m = executedPlan(
      graft.operators.Curation.q88SourcePassageMatrix(spark, sf))
      .split("== Initial Plan ==").head
    assert(!m.contains("CartesianProduct") &&
      !m.contains("BroadcastNestedLoop"), s"cartesian in q88:\n$m")
    val e = executedPlan(
      graft.operators.Curation.q89EffectiveTokens(spark, sf))
      .split("== Initial Plan ==").head
    assert(!e.contains("Join"), s"unexpected join in q89:\n$e")
    assert(e.contains("Window"), s"expected the digest window in q89:\n$e")
  }

  test("shared pair index: the q68 family scans materialized pairs, " +
    "not the gram pipeline") {
    // round-11 verdict #2: q68/q71/q72/q78 each rebuilt the MinHash
    // edge set and q80 the cosine one — the pair sweep must run once
    // per corpus and every consumer must plan a plain parquet scan of
    // the shared warehouse artifact ('graft_pairs/<family>-<key>',
    // round 13's durable home) with no xxhash64 gram/signature stage
    // left in its own plan
    import graft.operators.Curation
    val textPlans = Seq(
      "q68" -> executedPlan(Curation.q68DupClusters(spark, sf)),
      "q71" -> executedPlan(Curation.q71SourceOverlap(spark, sf)),
      "q72" -> executedPlan(Curation.q72ClusterReps(spark, sf)),
      "q78" -> executedPlan(Curation.q78SplitLeakage(spark, sf)))
    textPlans.foreach { case (n, p) =>
      assert(p.contains("graft_pairs/text-"),
        s"$n does not scan the shared pair index:\n$p")
      assert(!p.contains("xxhash64"),
        s"$n still runs the gram/LSH pipeline in its own plan:\n$p")
    }
    val q80 = executedPlan(Curation.q80SemanticDedup(spark, sf))
    assert(q80.contains("graft_pairs/cos-"),
      s"q80 does not scan the shared cosine pair index:\n$q80")
    // q129: the Bloom probe must be a map-side native filter on the
    // incoming scan (no UDF, no extra exchange) feeding the exact
    // semi-join — candidates only cross the wire. The public
    // operator's returned frame sits behind its checkpoint boundary
    // (the round-16 broadcast-lifecycle fix), so the executed probe
    // shape is asserted on the package-private lazy twin over q129's
    // own split
    val d129 = Tables.documents(spark, sf)
    val succ129 = d129.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("succ_text"))
    val inc129 = d129.filter(col("doc_id") % 4 === 0)
      .join(succ129, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 8 === 0, col("succ_text"))
          .otherwise(col("text")).as("text"))
    val (lazy129, b129) = graft.operators.TextDedup
      .bloomExactIncomingIdsLazy(d129.filter(col("doc_id") % 4 =!= 0),
        inc129, "doc_id", "text", 0.01)
    val q129 = executedPlan(lazy129)
    b129.destroy()
    assert(q129.contains("bloom_might_contain"),
      s"q129's plan carries no native bloom probe:\n$q129")
    assert(q129.contains("LeftSemi"),
      s"q129's exact verify semi-join is missing:\n$q129")
    // round-14 verdict #3: q52's near-dup phase must consume the same
    // τ=0.8 artifact (its input is the raw corpus, exactly what the
    // artifact holds) instead of re-running the signature sweep; q22
    // stays the definitional direct pipeline
    val q52 = executedPlan(Curation.q52DedupCorpus(spark, sf))
    assert(q52.contains("graft_pairs/text-"),
      s"q52 does not scan the shared pair index:\n$q52")
    assert(!q52.contains("xxhash64"),
      s"q52 still runs the gram/LSH pipeline in its own plan:\n$q52")
  }

  test("shared gram exchange: the n-gram family scans one materialized " +
    "gram table and never re-tokenizes") {
    // round-13 verdict #2: q21/q73/q85/q87 each re-ran the tokenize +
    // explode + gram-count shuffle. The family must now scan the
    // warehouse gram exchange; the stop-shingle cap must reach the
    // artifact scan as a pushed parquet predicate (not an anti-join),
    // and novelty/surprisal must plan no gram-keyed join of their own
    import graft.operators.Curation
    val q21 = executedPlan(Curation.q21DedupNgram(spark, sf))
    assert(q21.contains("graft_pairs/gram3-"),
      s"q21 does not scan the shared gram exchange:\n$q21")
    assert(q21.contains("LessThanOrEqual(df,100)"),
      s"q21's stop-shingle cap is not pushed to the artifact scan:\n$q21")
    val q73 = executedPlan(Curation.q73GramNovelty(spark, sf))
    assert(q73.contains("graft_pairs/gram3-"),
      s"q73 does not scan the shared gram exchange:\n$q73")
    // novelty consumes the baked first_id: no gram-keyed join remains
    val q73fin = q73.split("== Initial Plan ==").head
    assert(!"(SortMergeJoin|ShuffledHashJoin) \\[g#".r
        .findFirstIn(q73fin).isDefined,
      s"q73 still joins on the gram key:\n$q73fin")
    val q87 = executedPlan(Curation.q87BigramSurprisal(spark, sf))
    assert(q87.contains("graft_pairs/tok2-"),
      s"q87 does not scan the shared token exchange:\n$q87")
    val q87fin = q87.split("== Initial Plan ==").head
    assert(!"(SortMergeJoin|ShuffledHashJoin) \\[t#".r
        .findFirstIn(q87fin).isDefined,
      s"q87 still joins on the token key (cnt is baked in):\n$q87fin")
    // q85's gram scan lives behind the checkpointed pair aggregation
    // (see the sizes-ride-the-aggregation test below); tokenization
    // must be gone from every family member's visible plan
    Seq("q21" -> q21, "q73" -> q73, "q87" -> q87).foreach { case (n, p) =>
      assert(!p.contains("split("),
        s"$n still tokenizes documents in its own plan:\n$p")
    }
  }

  test("q85: containment sizes ride the pair aggregation — one gram " +
    "self-join, one checkpointed pair table, one size join") {
    // round-11 verdict #6: per-doc kept-set sizes used to cost a
    // second pass over the gram table plus TWO joins onto the
    // intersections; the <= self-join's diagonal now carries them,
    // and the (a, b, inter) aggregation is checkpointed so both
    // consumers scan ONE materialized pair table. The visible plan
    // must therefore hold exactly one join (directed ⋈ diagonal) over
    // ExistingRDD scans — the gram self-join lives inside the
    // checkpoint, computed once
    val plan = executedPlan(
      graft.operators.Curation.q85Containment(spark, sf))
    val fin = plan.split("== Initial Plan ==").head
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllMatchIn(fin).size
    assert(joins == 1, s"expected exactly the diagonal size join, got " +
      s"$joins in:\n$fin")
    assert(fin.contains("ExistingRDD"),
      s"pair aggregation must be checkpointed (one physical compute):\n$fin")
  }

  test("q43: sales register broadcasts its dimensions against the " +
    "bulk voucher fact") {
    // with the ~10k-voucher bulk fixture the register is a real
    // fact-dims star: voucher type / ledger lookups must broadcast,
    // never shuffle the accounting fact for a dimension join
    val plan = executedPlan(
      graft.tally.TallyReportQueries.queries("q43_tally_sales_register")(
        spark, sf))
    val fin = plan.split("== Initial Plan ==").head
    assert(fin.contains("BroadcastHashJoin"),
      s"register dimensions not broadcast:\n$fin")
    assert(!fin.contains("CartesianProduct") &&
      !fin.contains("BroadcastNestedLoop"), s"cartesian in q43:\n$fin")
  }

  test("q77: surprisal reuses the vocab exchange; no global window") {
    // the corpus-total scalar is an aggregation over the vocab
    // aggregation, cross-joined back as a broadcast — the vocab
    // shuffle must be computed once (ReusedExchange), and no stage may
    // single-partition the vocabulary (the pre-round-10 global-window
    // total did exactly that)
    import graft.operators.TextAnalysis
    import spark.implicits._
    val df = (1 to 50)
      .map(i => (i.toLong, s"tok$i the and of common tok${i % 7}"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
    val plan = executedPlan(res)
    val fin = plan.split("== Initial Plan ==").head
    assert("ReusedExchange".r.findAllMatchIn(fin).nonEmpty,
      s"expected the vocab exchange reused by the total branch in:\n$fin")
    assert(!fin.contains("Window"),
      s"no window may remain in the surprisal plan:\n$fin")
  }

  test("q79: importance weights reuse the vocab exchange; no global window") {
    // one conditional vocab aggregation serves both distributions; the
    // totals branch must reuse its exchange (not recompute the corpus
    // explode) and nothing may single-partition the vocabulary
    import graft.operators.TextAnalysis
    import spark.implicits._
    val df = (1 to 50)
      .map(i => (i.toLong, s"tok$i the and of common tok${i % 7}",
        if (i % 5 == 0) "tgt" else "raw"))
      .toDF("doc_id", "text", "source")
    val res = TextAnalysis.importanceWeights(df, "doc_id", "text",
      $"source" === "tgt")
    val plan = executedPlan(res)
    val fin = plan.split("== Initial Plan ==").head
    assert("ReusedExchange".r.findAllMatchIn(fin).nonEmpty,
      s"expected the vocab exchange reused by the totals branch in:\n$fin")
    assert(!fin.contains("Window"),
      s"no window may remain in the importance-weight plan:\n$fin")
  }

  test("q81: centroid scoring broadcasts — the corpus never shuffles to be scored") {
    // the only wide exchange over exploded rows is the (group, pos)
    // centroid aggregation; scoring must be a broadcast join (no
    // sort-merge of the corpus against centroids, no cartesian)
    import graft.operators.Similarity
    import spark.implicits._
    val df = (1 to 60)
      .map(i => (i.toLong,
        Array.tabulate(8)(j => ((i * 7 + j) % 13 + 1).toFloat / 13f), i % 3))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.centroidOutliers(df, "vec_id", "embedding", "label")
    val plan = executedPlan(res)
    val fin = plan.split("== Initial Plan ==").head
    assert(fin.contains("BroadcastHashJoin"),
      s"expected broadcast centroid scoring in:\n$fin")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("Cartesian"),
      s"no corpus-wide join shuffle allowed in:\n$fin")
  }

  test("q55: the as-of composition is one key shuffle, no range join") {
    import graft.operators.AsOf
    import spark.implicits._
    val left = (1 to 100).map(i => ((i % 5).toLong, i.toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 100).map(i => ((i % 5).toLong, i.toLong + 3, i.toLong))
      .toDF("k", "t", "rid")
    val df = AsOf.asOfJoin(left, right, "k", "t", Seq("rid"))
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"), s"unexpected join in:\n$plan")
    // the union reaches the window through a single hash exchange on
    // the key — as-of cost is one shuffle of |left|+|right| rows
    // (AQE prints the plan twice; count only the final section)
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(finalPlan).size
    assert(exchanges == 1, s"expected 1 key exchange, got $exchanges in:\n$plan")
  }

  test("media decode family: decode runs in-pipeline, only the final " +
    "sort exchanges") {
    // q104 (JPEG) and q109 (video frame sampling) stand for the whole
    // encode→mapPartitions-decode→feature family: per-row media work
    // must stay inside the scan pipeline — the ONLY exchange a decode
    // query may carry is the orderBy's range partitioning; a hash
    // exchange would mean pixels or payload bytes started shuffling
    for (q <- Seq(
        graft.operators.Curation.q104MediaJpeg(spark, sf),
        graft.operators.Curation.q109FrameSample(spark, sf),
        // q112/q127: same contract over the STORED foreign corpora —
        // the decode side must be a parquet scan of the warehouse
        // artifact feeding mapPartitions, with only the sort exchange
        graft.operators.ForeignMedia.features(spark, sf).toDF()
          .orderBy("doc_id"),
        graft.operators.ForeignMedia.videoFeatures(spark, sf).toDF()
          .orderBy("doc_id"),
        graft.operators.ForeignMedia.progFeatures(spark, sf).toDF()
          .orderBy("doc_id"))) {
      val plan = executedPlan(q)
      val finalPlan = plan.split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllMatchIn(finalPlan).isEmpty,
        s"media decode shuffled by hash:\n$plan")
      assert("Exchange rangepartitioning".r.findAllMatchIn(finalPlan).size <= 1,
        s"more than the sort exchange:\n$plan")
      assert(plan.contains("MapPartitions"),
        s"decode not batched per partition:\n$plan")
    }
    // and the q112 scan really is the stored artifact, not in-plan
    // synthesis
    val q112 = executedPlan(graft.operators.ForeignMedia
      .features(spark, sf).toDF().orderBy("doc_id"))
    assert(q112.contains("graft_pairs/media-"),
      s"q112 does not scan the stored foreign corpus:\n$q112")
    val q127 = executedPlan(graft.operators.ForeignMedia
      .videoFeatures(spark, sf).toDF().orderBy("doc_id"))
    assert(q127.contains("graft_pairs/mediavideo-"),
      s"q127 does not scan the stored foreign-frame video corpus:\n$q127")
    val q128 = executedPlan(graft.operators.ForeignMedia
      .progFeatures(spark, sf).toDF().orderBy("doc_id"))
    assert(q128.contains("graft_pairs/mediaprog-"),
      s"q128 does not scan the stored progressive corpus:\n$q128")
  }
}
