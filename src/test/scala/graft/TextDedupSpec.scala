package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  // near-dup: one word changed out of 20 → high trigram overlap
  private val nearDup = base.replace("sigma", "SIGMA2")

  private def docs = Seq(
    (0L, base), (1L, base), (2L, nearDup),
    (3L, "completely different words with no overlap at all here now"),
    (4L, "short text")).toDF("doc_id", "text")

  test("exact groups collapse identical texts, keeper is min id") {
    val g = TextDedup.exactGroups(docs, "doc_id", "text")
    val dup = g.filter($"n_docs" > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keeper") == 0L)
    assert(g.count() == 4)
  }

  test("shingleArray produces size-n word windows, distinct") {
    val r = docs.filter($"doc_id" === 4L)
      .select(TextDedup.shingleArray($"text", 2)).as[Seq[String]].head()
    assert(r == Seq("short text"))
    val tri = docs.filter($"doc_id" === 0L)
      .select(TextDedup.shingleArray($"text", 3)).as[Seq[String]].head()
    assert(tri.length == 18 && tri.head == "alpha beta gamma")
  }

  test("ngram jaccard finds exact and near duplicates, not unrelated") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.5).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)))  // identical: jaccard 1.0
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    val j01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
      .getAs[Double]("jaccard")
    assert(j01 == 1.0)
  }

  test("minhash LSH finds the same pairs as exact jaccard here") {
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhash banding catches identical and near-identical docs") {
    val pairs = TextDedup.simhashPairs(docs, "doc_id", "text",
      n = 3, maxHamming = 7, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))  // identical simhash, hamming 0
  }

  test("per-row signature APIs agree with the exploded pipelines") {
    import org.apache.spark.sql.functions._
    // minhashSignature (per-row HOF) vs the exploded min-agg in
    // minhashLshPairs share derivation: xxhash64(gram) → xxhash64(h, seed)
    val d = docs.filter($"doc_id" === 0L)
    val hofSig = d.select(TextDedup.minhashSignature(
        transform(TextDedup.shingleArray($"text", 3), g => xxhash64(g)), 8)
      .as("sig")).as[Seq[Long]].head()
    val gh = TextDedup.explodedShingles(d, "doc_id", "text", 3)
      .select(xxhash64($"g").as("h"))
    val aggSig = (0 until 8).map(seed =>
      gh.agg(min(xxhash64($"h", lit(seed)))).head().getLong(0))
    assert(hofSig == aggSig)
    // simhash64 (per-row) vs the exploded bit-sums in simhashPairs
    val hofSim = d.select(TextDedup.simhash64(
        transform(TextDedup.shingleArray($"text", 3), g => xxhash64(g)))
      .as("s")).head().getLong(0)
    val bitSums = (0 until 64).map(j =>
      gh.agg(sum(when(shiftright($"h", j).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L))).head().getLong(0))
    val expSim = bitSums.zipWithIndex
      .map { case (s, j) => if (s > 0) 1L << j else 0L }
      .reduce(_ | _)
    assert(hofSim == expSim)
  }

  test("degenerate-bucket guard drops pathological buckets only") {
    // cap of 1 kills every bucket → no pairs; default cap → pairs found
    val none = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      minJaccard = 0.5, maxBucketSize = 1)
    assert(none.count() == 0)
  }

  test("dedupedCorpus drops exact dups then near-dups, keeps min ids") {
    // doc 1 is an exact dup of 0 (digest phase), doc 2 a near-dup of 0
    // (LSH phase) — 3 and 4 are unrelated and must survive
    val kept = TextDedup.dedupedCorpus(docs, "doc_id", "text",
      n = 3, minJaccard = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 3L, 4L))
  }

  test("stop-shingle removal drops high-df shingles") {
    val g = TextDedup.explodedShingles(docs, "doc_id", "text", 3,
      maxShingleDf = 2)
    // shingles shared by docs 0,1,2 (df=3) must be gone
    assert(g.groupBy($"g").count().filter($"count" > 2).count() == 0)
  }

  test("exchange-backed family equals the direct pipelines (df filter " +
    "≡ hot-set anti-join; baked first_id/cnt ≡ gram-keyed joins)") {
    // the q21/q73/q85/q87 entries read the warehouse gram exchange
    // (id, g, df, first_id) / (id, t, cnt); this pins the consumer
    // halves value-equal to the direct pipelines on a corpus with a
    // hot boilerplate shingle that the cap must drop on BOTH paths
    import org.apache.spark.sql.functions._
    val hot = "lorem ipsum dolor sit"
    val corpus = ((1 to 8).map(i => (i.toLong, s"$hot unique$i a$i b$i")) ++
      Seq((100L, "same same text here exactly five"),
          (101L, "same same text here exactly five")))
      .toDF("doc_id", "text")
    val cap = 3L
    val g = TextDedup.explodedShingles(corpus, "doc_id", "text", 3)
    val exchange = g.join(
      g.groupBy($"g").agg(count(lit(1)).as("df"),
        min($"id").as("first_id")), Seq("g"))
      .select($"id", $"g", $"df", $"first_id")
    val capped = exchange.filter($"df" <= cap).select($"id", $"g")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(TextDedup.ngramJaccardPairsFromGrams(capped, 0.8)) ==
      pairSet(TextDedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, minJaccard = 0.8, maxShingleDf = cap)))
    assert(pairSet(TextDedup.containmentDupPairsFromGrams(capped, 0.5)) ==
      pairSet(TextDedup.containmentDupPairs(corpus, "doc_id", "text",
        n = 3, minContainment = 0.5, maxShingleDf = cap)))
    assert(graft.operators.TextAnalysis
        .gramNoveltyFromExchange(corpus, "doc_id", exchange)
        .collect().map(_.toSeq).toSet ==
      graft.operators.TextAnalysis
        .gramNovelty(corpus, "doc_id", "text", 3)
        .collect().map(_.toSeq).toSet)
    val tok = corpus.select($"doc_id".as("id"),
      explode(graft.operators.TextAnalysis.gramArray($"text", 2)).as("t"))
    val toks = tok.join(
      tok.groupBy($"t").agg(count(lit(1)).as("cnt")), Seq("t"))
      .select($"id", $"t", $"cnt")
    assert(graft.operators.TextAnalysis
        .gramSurprisalFromToks(toks, "doc_id")
        .collect().map(_.toSeq).toSet ==
      graft.operators.TextAnalysis
        .gramSurprisal(corpus, "doc_id", "text", 2)
        .collect().map(_.toSeq).toSet)
  }

  test("incremental near-dup finds only cross-side pairs") {
    // existing corpus: 0 and its exact dup 1; incoming batch: a
    // near-dup of 0 (10), an unrelated doc (11), and an exact dup of
    // base (12). Within-side pairs (0,1) and any incoming×incoming
    // pair must NOT appear.
    val existing = Seq((0L, base), (1L, base), (3L,
      "completely different words with no overlap at all here now"))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, nearDup), (11L,
      "yet another unrelated block of words that matches nothing"),
      (12L, base)).toDF("doc_id", "text")
    val got = TextDedup.incrementalNearDupPairs(existing, incoming,
        "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val keys = got.map(p => (p._1, p._2))
    // base vs nearDup trigram jaccard: 18 grams each, 15 shared
    val jNear = BigDecimal(15.0 / 21.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(keys == Set((0L, 10L), (1L, 10L), (0L, 12L), (1L, 12L)))
    assert(got.contains((0L, 12L, 1.0)))
    assert(got.contains((0L, 10L, jNear)))
  }

  test("contamination pairs count shared 8-grams, train×eval only") {
    // base is 20 words → 13 8-gram windows; nearDup differs at word 18
    // (1-based), so windows starting at 11..13 differ → 10 shared
    val train = Seq((0L, base), (1L,
      "completely different words with no overlap at all here now"))
      .toDF("doc_id", "text")
    val evalSet = Seq((10L, nearDup), (11L, base)).toDF("doc_id", "text")
    val got = TextDedup.contaminationPairs(train, evalSet,
        "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((0L, 10L) -> 10L, (0L, 11L) -> 13L))
  }

  test("persisted near-dup index answers ingest cycles identically") {
    val existing = Seq((0L, base), (1L, base), (3L,
      "completely different words with no overlap at all here now"))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, nearDup), (12L, base)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("neardup_index").toString
    try {
      TextDedup.buildNearDupIndex(existing, "doc_id", "text", dir)
      val fromIndex = TextDedup.incrementalNearDupPairsFromIndex(
          spark, incoming, dir, "doc_id", "text", minJaccard = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val direct = TextDedup.incrementalNearDupPairs(existing, incoming,
          "doc_id", "text", minJaccard = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fromIndex == direct)
      assert(fromIndex.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("simhashParamsForScale trades guaranteed radius for chunk width") {
    // the pigeonhole trade, pinned: wider corpora force wider chunk
    // keys, shrinking the exact Hamming guarantee
    assert(TextDedup.simhashParamsForScale(500L) == ((8, 7)))
    assert(TextDedup.simhashParamsForScale(5000L) == ((6, 5)))
    assert(TextDedup.simhashParamsForScale(50000L) == ((4, 3)))
    assert(TextDedup.simhashParamsForScale(1000000000L) == ((2, 1)))
    // monotone: radius never widens as n grows
    val radii = Seq(1L, 100L, 10000L, 1000000L, 100000000L)
      .map(n => TextDedup.simhashParamsForScale(n)._2)
    assert(radii == radii.sorted.reverse)
    // past ~7e10 even 32-bit chunks blow the budget — degrade to the
    // floor config rather than throw (the warn-and-degrade branch)
    assert(TextDedup.simhashParamsForScale(100000000000L) == ((2, 1)))
    // and the derived config still FINDS near-identical docs: an exact
    // duplicate has Hamming 0, inside every radius
    val docs = Seq((1L, base), (2L, base), (3L,
      "completely different words with no overlap at all here now"))
      .toDF("doc_id", "text")
    val grams = TextDedup.explodedShingles(docs, "doc_id", "text", 3)
    val (k, h) = TextDedup.simhashParamsForScale(50000L)
    val cand = TextDedup.simhashCandidatesFromGrams(grams, k, h)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
  }

  test("index without _meta.json fails loudly, mismatched config too") {
    val existing = Seq((0L, base)).toDF("doc_id", "text")
    val incoming = Seq((10L, nearDup)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("neardup_index_meta").toString
    try {
      TextDedup.buildNearDupIndex(existing, "doc_id", "text", dir)
      // mismatched banding parameters → loud failure
      val eCfg = intercept[IllegalArgumentException] {
        TextDedup.incrementalNearDupPairsFromIndex(
          spark, incoming, dir, "doc_id", "text", bands = 16)
      }
      assert(eCfg.getMessage.contains("built with"))
      // a deleted meta file (partial build / manual copy) must fail
      // too — assuming a matching config would silently find nothing
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/_meta.json"))
      val eMissing = intercept[IllegalArgumentException] {
        TextDedup.incrementalNearDupPairsFromIndex(
          spark, incoming, dir, "doc_id", "text")
      }
      assert(eMissing.getMessage.contains("_meta.json"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("incremental near-dup equals the full self-join's cross slice") {
    // on the harness corpus: splitting by content hash and running the
    // incremental path must recover exactly the cross-side subset of
    // the all-pairs MinHash result (same banding, same verification)
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val full = TextDedup.minhashLshPairs(docs, "doc_id", "text",
        minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val side = docs.select($"doc_id",
        (substring(md5($"text"), 1, 1) >= "c").as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expected = full.collect {
      case (a, b) if side(a) != side(b) =>
        if (side(b)) (a, b) else (b, a)  // (existing, incoming)
    }
    val got = TextDedup.incrementalNearDupPairs(
        docs.filter(substring(md5($"text"), 1, 1) < "c"),
        docs.filter(substring(md5($"text"), 1, 1) >= "c"),
        "doc_id", "text", minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no cross-side pairs")
  }

  test("passage dup stats: fixed windows, tail remainder, corpus counts") {
    // 5-token passages; doc 20 repeats doc 0's first block and doc 0's
    // own second block is unique; doc 21 is 7 tokens → blocks of 5+2
    val p = Seq(
      (0L, "a b c d e f g h i j"),   // blocks: [a b c d e] [f g h i j]
      (20L, "a b c d e"),            // duplicates doc 0's first block
      (21L, "x y z w v u t"))        // [x y z w v] [u t] — both unique
      .toDF("doc_id", "text")
    val got = TextDedup.passageDupStats(p, "doc_id", "text", passageLen = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((2, 1, 0.5)))
    assert(got(20L) == ((1, 1, 1.0)))
    assert(got(21L) == ((2, 0, 0.0)))
  }

  test("containment: subset doc scores 1.0 into its superset, not back") {
    // doc 30's trigrams are a strict subset of doc 0's (a prefix), so
    // C(30→0) = 1.0 while C(0→30) = 3/18 — below any real threshold
    val sub = base.split(" ").take(5).mkString(" ")
    val p = Seq((0L, base), (30L, sub)).toDF("doc_id", "text")
    val got = TextDedup.containmentDupPairs(p, "doc_id", "text",
        n = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((30L, 0L, 1.0)))
    // jaccard at the same threshold misses the pair entirely
    assert(TextDedup.ngramJaccardPairs(p, "doc_id", "text",
      n = 3, minJaccard = 0.5).collect().isEmpty)
  }

  test("pinned 13-chunk SimHash equals the exact τ=0.8 set (retired q23 pin)") {
    // moved here from the shipped q23 entry (round-12 verdict #2, the
    // τ=0.4 LSH precedent): 13-chunk / radius-12 banding is recall-1
    // on the shipped corpora — every exact-Jaccard-0.8 pair measures
    // Hamming ≤ 12 (sf0.001 holds one pair at exactly 12, the
    // round-10 sweep that moved the pin off 12 chunks) — but its
    // 4-bit chunk keys cost ~0.8·n² pre-Hamming join rows, quadratic
    // by construction, so it must never be a shipped query plan. The
    // equivalence is still worth guarding; q23 now executes the
    // scale-derived config under the per-pair pigeonhole contract.
    val d = Tables.documents(spark, SparkTestSession.sf)
    val exact = TextDedup.ngramJaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pinned = TextDedup.simhashPairs(d, "doc_id", "text",
        n = 3, maxHamming = 12, minJaccard = 0.8, numChunks = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinned == exact)
    assert(exact.nonEmpty)
  }

  test("bloom-prefiltered exact incremental equals the plain semi-join, " +
    "candidates stay near the dup count") {
    // q129's operator contract: the Bloom has no false negatives, so
    // every true duplicate survives the prefilter; the exact verify
    // join kills every false positive — result == plain digest
    // semi-join. Candidate volume (the rows the join actually sees)
    // must sit near dups + fpp·|incoming|, the whole point of the
    // prefilter at corpus scale.
    val d = Tables.documents(spark, SparkTestSession.sf)
    val succ = d.select(($"doc_id" - 1).as("doc_id"), $"text".as("succ_text"))
    val incoming = d.filter($"doc_id" % 4 === 0)
      .join(succ, Seq("doc_id"))
      .select($"doc_id",
        when($"doc_id" % 8 === 0, $"succ_text").otherwise($"text").as("text"))
      .localCheckpoint(true)
    val existing = d.filter($"doc_id" % 4 =!= 0)
    val viaBloom = graft.operators.TextDedup
      .bloomExactIncomingIds(existing, incoming, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val exDigests = existing.select(md5($"text").as("__d"))
    val plain = incoming.withColumn("__d", md5($"text"))
      .join(exDigests, Seq("__d"), "left_semi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(plain.nonEmpty, "fixture produced no exact cross-side dups")
    assert(viaBloom == plain,
      s"bloom path diverges: missing ${(plain -- viaBloom).take(5)}, "
        + s"extra ${(viaBloom -- plain).take(5)}")
    // candidate contract: rebuild the same filter and count survivors
    val items = math.max(1L, exDigests.count())
    val bf = exDigests.stat.bloomFilter("__d", items, 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val nIncoming = incoming.count()
    val candidates = incoming.withColumn("__d", md5($"text"))
      .filter(graft.functions.BloomExpressions.mightContain($"__d", bcast))
      .count()
    assert(candidates >= plain.size, "prefilter dropped a true duplicate")
    assert(candidates <= plain.size + math.max(5, 5 * 0.01 * nIncoming),
      s"prefilter passed $candidates of $nIncoming incoming rows for "
        + s"${plain.size} dups — not selective")
  }

  test("persisted bloom artifact: merged equals rebuilt byte-for-byte, " +
    "serving equals the in-plan path, saturation and partial dirs fail loudly") {
    // q136's operator contract (round-15 verdict #4): per cycle a
    // deployment merges the BATCH's filter into the stored artifact —
    // identical geometry (expectedItems, fpp) makes mergeInPlace a
    // pure bitset OR, and inserting the union directly sets the very
    // same bits, so merged ≡ rebuilt EXACTLY, not approximately.
    val d = Tables.documents(spark, SparkTestSession.sf)
    val slice1 = d.filter($"doc_id" % 4 === 1 || $"doc_id" % 4 === 2)
    val slice2 = d.filter($"doc_id" % 4 === 3)
    val dir = java.nio.file.Files.createTempDirectory("bloomart").toString
    try {
      val cap = 4L * d.count()
      TextDedup.buildBloomArtifact(slice1, "text", s"$dir/a",
        expectedItems = cap)
      TextDedup.appendToBloomArtifact(spark, slice2, "text", s"$dir/a")
      TextDedup.buildBloomArtifact(slice1.unionByName(slice2), "text",
        s"$dir/b", expectedItems = cap)
      val merged = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(graft.operators.Warehouse
          .indexSnapshot(s"$dir/a").path("bloom.bin")))
      val rebuilt = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/b/bloom.bin"))
      assert(java.util.Arrays.equals(merged, rebuilt),
        "merged filter bitset diverges from a one-shot rebuild")
      // the stored digest table covers both slices (the verify side)
      assert(graft.operators.Warehouse.indexSnapshot(s"$dir/a")
        .read(spark, "digests.parquet").count()
        == slice1.count() + slice2.count())
      // serving from the artifact == the in-plan path == the oracle
      val succ = d.select(($"doc_id" - 1).as("doc_id"),
        $"text".as("succ_text"))
      val incoming = d.filter($"doc_id" % 4 === 0)
        .join(succ, Seq("doc_id"))
        .select($"doc_id",
          when($"doc_id" % 8 === 0, $"succ_text").otherwise($"text")
            .as("text"))
        .localCheckpoint(true)
      val fromArtifact = TextDedup.bloomExactIncomingIdsFromArtifact(
          spark, incoming, "doc_id", "text", s"$dir/a")
        .collect().map(_.getLong(0)).toSet
      val inPlan = TextDedup.bloomExactIncomingIds(
          d.filter($"doc_id" % 4 =!= 0), incoming, "doc_id", "text")
        .collect().map(_.getLong(0)).toSet
      assert(inPlan.nonEmpty && fromArtifact == inPlan,
        s"artifact path diverges: missing ${(inPlan -- fromArtifact).take(5)}"
          + s", extra ${(fromArtifact -- inPlan).take(5)}")
      // saturation: an append past expectedItems voids the fpp
      // guarantee and must refuse, never degrade silently
      TextDedup.buildBloomArtifact(slice1, "text", s"$dir/tiny",
        expectedItems = slice1.count())
      val sat = intercept[IllegalArgumentException] {
        TextDedup.appendToBloomArtifact(spark, slice2, "text",
          s"$dir/tiny")
      }
      assert(sat.getMessage.contains("saturated"))
      // the meta discipline: a partial/hand-copied dir fails loudly
      // (delete the RESOLVED meta — the append replaced it as an
      // epoch-named file in its commit)
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        graft.operators.Warehouse.indexSnapshot(s"$dir/a")
          .path("_meta.json")))
      val err = intercept[IllegalArgumentException] {
        TextDedup.bloomExactIncomingIdsFromArtifact(spark, incoming,
          "doc_id", "text", s"$dir/a")
      }
      assert(err.getMessage.contains("_meta.json"))
    } finally graft.operators.Warehouse.deleteRec(new java.io.File(dir))
  }

  test("artifact-fed dedupedCorpus equals the direct pipeline (q52 sharing)") {
    // round-14 verdict #3: q52 consumes the shared τ=0.8 pair table
    // restricted to keeper endpoints instead of re-running the sweep.
    // The restriction must be an IDENTITY: banding is per-document
    // and exact Jaccard pair-local, so keeper–keeper pairs of the
    // full corpus ARE the pair set of the exact-kept subset.
    val d = Tables.documents(spark, SparkTestSession.sf)
    val direct = TextDedup.dedupedCorpus(d, "doc_id", "text",
        n = 3, minJaccard = 0.8)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val fullPairs = TextDedup.minhashLshPairs(d, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, minJaccard = 0.8)
    val fed = TextDedup.dedupedCorpus(d, "doc_id", "text",
        n = 3, minJaccard = 0.8, precomputedPairs = Some(fullPairs))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(direct.nonEmpty)
    assert(fed == direct,
      s"artifact-fed dedup diverges: missing ${(direct -- fed).take(5)}, "
        + s"extra ${(fed -- direct).take(5)}")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("exactSubstringSpans: separated duplicated windows stay two spans") {
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c x y z f g h")).toDF("doc_id", "text")
    val r = TextDedup.exactSubstringSpans(d, "doc_id", "text", minLen = 3)
      .orderBy($"doc_id").collect()
    // doc 0: "a b c" (pos 1) and "f g h" (pos 6) duplicated → spans
    // [1,3] and [6,8]; the gap "d e" is the cleaned text
    assert(r(0).getAs[Int]("n_dup_spans") == 2)
    assert(r(0).getAs[Int]("dup_tokens") == 6)
    assert(r(0).getAs[Int]("kept_tokens") == 2)
    assert(r(0).getAs[String]("kept_digest") == md5Hex("d e"))
    assert(r(1).getAs[Int]("n_dup_spans") == 2)
    assert(r(1).getAs[String]("kept_digest") == md5Hex("x y z"))
  }

  test("exactSubstringSpans: overlapping duplicated windows merge to one maximal span") {
    val d = Seq(
      (0L, "p q r s t"),
      (1L, "p q r s u")).toDF("doc_id", "text")
    val r = TextDedup.exactSubstringSpans(d, "doc_id", "text", minLen = 3)
      .orderBy($"doc_id").collect()
    // "p q r" and "q r s" both duplicated → ONE span [1,4] in each
    assert(r(0).getAs[Int]("n_dup_spans") == 1)
    assert(r(0).getAs[Int]("dup_tokens") == 4)
    assert(r(0).getAs[String]("kept_digest") == md5Hex("t"))
    assert(r(1).getAs[String]("kept_digest") == md5Hex("u"))
  }

  test("exactSubstringSpans: sub-window docs and exact copies at the extremes") {
    val d = Seq(
      (0L, "zz yy"),                 // shorter than the window: no starts
      (1L, "m n o p q r"),           // exact copy pair: fully covered
      (2L, "m n o p q r")).toDF("doc_id", "text")
    val r = TextDedup.exactSubstringSpans(d, "doc_id", "text", minLen = 3)
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Int]("n_dup_spans") == 0)
    assert(r(0).getAs[Int]("kept_tokens") == 2)
    assert(r(0).getAs[Double]("dup_frac") == 0.0)
    assert(r(1).getAs[Int]("dup_tokens") == 6)
    assert(r(1).getAs[Double]("dup_frac") == 1.0)
    assert(r(1).getAs[String]("kept_digest") == md5Hex(""))
    assert(r(1) == r(2) || r(1).getAs[Int]("dup_tokens") ==
      r(2).getAs[Int]("dup_tokens"))
  }

  test("substring index: append ≡ union build, ledger rejects re-ingest, meta gates") {
    val a = Seq((0L, "a b c d e f g h"), (1L, "a b c x y z f g h"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "a b c d e q r s"), (3L, "n o p q r s t u"))
      .toDF("doc_id", "text")
    val union = a.unionByName(b)
    val dirU = java.nio.file.Files
      .createTempDirectory("ss_union").toString
    val dirA = java.nio.file.Files
      .createTempDirectory("ss_appended").toString
    def rm(f: java.io.File): Unit =
      graft.operators.Warehouse.deleteRec(f)
    try {
      TextDedup.buildSubstringIndex(union, "doc_id", "text", 3, dirU)
      TextDedup.buildSubstringIndex(a, "doc_id", "text", 3, dirA)
      TextDedup.appendToSubstringIndex(spark, b, dirA, "doc_id", "text")
      // segment-summed dfs equal the union build's exactly (resolved
      // through the manifest snapshot — compaction epochs the table —
      // and summing base ⊕ delta segments where both exist)
      def dfs(d: String) = {
        val snap = graft.operators.Warehouse.indexSnapshot(d)
        val base = snap.read(spark, "wdf.parquet")
        val all = if (snap.has("wdelta.parquet"))
          base.unionByName(snap.read(spark, "wdelta.parquet"))
        else base
        all.groupBy($"d").agg(sum($"df").as("df")).filter($"df" =!= 0)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(dfs(dirA) == dfs(dirU))
      // and the served spans equal the in-plan pass row for row
      val served = TextDedup.substringSpansFromIndex(
        spark, union, "doc_id", "text", dirA).orderBy($"doc_id").collect()
      val inPlan = TextDedup.exactSubstringSpans(
        union, "doc_id", "text", 3).orderBy($"doc_id").collect()
      assert(served.toSeq == inPlan.toSeq)
      // segment files accumulate under prefix partitions; compaction
      // rewrites multi-file partitions with content identity
      val (before, after) = graft.operators.Warehouse
        .compactIndexPartitions(spark, dirA, "wdf.parquet", "pfx")
      assert(before > after && after > 0,
        s"append cycles should leave compactable partitions ($before -> $after)")
      assert(dfs(dirA) == dfs(dirU))
      val servedC = TextDedup.substringSpansFromIndex(
        spark, union, "doc_id", "text", dirA).orderBy($"doc_id").collect()
      assert(servedC.toSeq == inPlan.toSeq)
      // batch-restricted serving (round-17 verdict #1): a STRICT
      // SUBSET batch served from the full index equals the
      // full-corpus truth filtered to the batch's ids — dup flags are
      // corpus-global, so this IS the restricted ≡ unrestricted
      // identity (the restriction only drops segment digests the
      // batch can never join)
      val batch = union.filter($"doc_id".isin(0L, 3L))
      val servedSub = TextDedup.substringSpansFromIndex(
        spark, batch, "doc_id", "text", dirA)
        .orderBy($"doc_id").collect()
      val truthSub = inPlan.filter(r => Set(0L, 3L)(r.getLong(0)))
      assert(servedSub.toSeq == truthSub.toSeq)
      // re-ingesting an indexed id fails loudly
      val err = intercept[IllegalArgumentException] {
        TextDedup.appendToSubstringIndex(spark,
          Seq((2L, "a b c")).toDF("doc_id", "text"), dirA,
          "doc_id", "text")
      }
      assert(err.getMessage.contains("append-only"))
      // a batch carrying the same NEW id twice fails the intra-batch
      // guard (round-17 ADVICE: the ledger probe only sees previously
      // indexed ids)
      val errDup = intercept[IllegalArgumentException] {
        TextDedup.appendToSubstringIndex(spark,
          Seq((9L, "a b c d"), (9L, "e f g h"))
            .toDF("doc_id", "text"), dirA, "doc_id", "text")
      }
      assert(errDup.getMessage.contains("duplicated ids"))
      // a NULL id would never match a ledger probe — the silently
      // re-ingestable id (round-18 review); refused
      val errNull = intercept[IllegalArgumentException] {
        TextDedup.appendToSubstringIndex(spark,
          Seq((None: Option[Long], "a b c d"))
            .toDF("doc_id", "text"), dirA, "doc_id", "text")
      }
      assert(errNull.getMessage.contains("NULL ids"))
      // a meta-less directory is not an artifact
      rm(new java.io.File(s"$dirA/_meta.json"))
      intercept[IllegalArgumentException] {
        TextDedup.substringSpansFromIndex(spark, union, "doc_id",
          "text", dirA)
      }
    } finally { rm(new java.io.File(dirU)); rm(new java.io.File(dirA)) }
  }

  test("substring index tombstone deletes: delete ≡ rebuild-without, " +
    "re-ingest restores, guards, compaction reclaims") {
    val a = Seq((0L, "a b c d e f g h"), (1L, "a b c x y z f g h"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "a b c d e q r s"), (3L, "n o p q r s t u"))
      .toDF("doc_id", "text")
    val union = a.unionByName(b)
    val dir = java.nio.file.Files
      .createTempDirectory("ss_del").toString
    val dirA = java.nio.file.Files
      .createTempDirectory("ss_del_ref").toString
    try {
      TextDedup.buildSubstringIndex(union, "doc_id", "text", 3, dir)
      TextDedup.deleteFromSubstringIndex(spark, b, dir, "doc_id", "text")
      // the post-delete index answers the a-only corpus's truth
      val served = TextDedup.substringSpansFromIndex(
        spark, a, "doc_id", "text", dir).orderBy($"doc_id").collect()
      val truth = TextDedup.exactSubstringSpans(a, "doc_id", "text", 3)
        .orderBy($"doc_id").collect()
      assert(served.toSeq == truth.toSeq,
        "tombstone delete diverges from the rebuild-without truth")
      // and the summed segment table equals a fresh a-only build's
      TextDedup.buildSubstringIndex(a, "doc_id", "text", 3, dirA)
      def dfs(d: String) = {
        val snap = graft.operators.Warehouse.indexSnapshot(d)
        val base = snap.read(spark, "wdf.parquet")
        val all = if (snap.has("wdelta.parquet"))
          base.unionByName(snap.read(spark, "wdelta.parquet"))
        else base
        all.groupBy($"d").agg(sum($"df").as("df")).filter($"df" =!= 0)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(dfs(dir) == dfs(dirA))
      // deleted ids are re-ingestable; the re-append restores the
      // union-build state exactly
      TextDedup.appendToSubstringIndex(spark, b, dir, "doc_id", "text")
      val reServed = TextDedup.substringSpansFromIndex(
        spark, union, "doc_id", "text", dir).orderBy($"doc_id").collect()
      val unionTruth = TextDedup.exactSubstringSpans(
        union, "doc_id", "text", 3).orderBy($"doc_id").collect()
      assert(reServed.toSeq == unionTruth.toSeq,
        "re-ingest after delete diverges from the union build")
      // guards: double delete and deleting an unindexed doc refuse
      TextDedup.deleteFromSubstringIndex(spark, b, dir, "doc_id", "text")
      val dd = intercept[IllegalArgumentException] {
        TextDedup.deleteFromSubstringIndex(spark, b, dir,
          "doc_id", "text")
      }
      assert(dd.getMessage.contains("not active"))
      val un = intercept[IllegalArgumentException] {
        TextDedup.deleteFromSubstringIndex(spark,
          Seq((99L, "zz yy xx ww")).toDF("doc_id", "text"), dir,
          "doc_id", "text")
      }
      assert(un.getMessage.contains("not active"))
      // compaction physically reclaims the cancelled mass: rows
      // shrink, zero-sum digests vanish, serving identical
      val rowsBefore = graft.operators.Warehouse.indexSnapshot(dir)
        .read(spark, "wdf.parquet").count()
      val (cb, ca) = TextDedup.compactSubstringSegments(spark, dir)
      assert(cb == rowsBefore && ca < cb,
        s"compaction should shrink the segment table ($cb -> $ca)")
      assert(dfs(dir) == dfs(dirA),
        "compaction changed the summed dfs")
      val servedC = TextDedup.substringSpansFromIndex(
        spark, a, "doc_id", "text", dir).orderBy($"doc_id").collect()
      assert(servedC.toSeq == truth.toSeq,
        "compaction changed the served spans")
    } finally {
      graft.operators.Warehouse.deleteRec(new java.io.File(dir))
      graft.operators.Warehouse.deleteRec(new java.io.File(dirA))
    }
  }

  test("substring dup summary: compacted serving ≡ the full-segment " +
    "sum across post-compaction appends, deletes, and the ambiguous " +
    "base-unique overlap — base probed only when deltas force it") {
    val W = graft.operators.Warehouse
    val base = Seq(
      (0L, "a b c d e f"),   // shares "a b c" with doc 1; "d e f" unique
      (1L, "a b c x y z"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("ss_summary").toString
    def truthOf(corpus: org.apache.spark.sql.DataFrame) =
      TextDedup.exactSubstringSpans(corpus, "doc_id", "text", 3)
        .orderBy($"doc_id").collect().toSeq
    def servedOf(corpus: org.apache.spark.sql.DataFrame) =
      TextDedup.substringSpansFromIndex(spark, corpus, "doc_id",
        "text", dir).orderBy($"doc_id").collect().toSeq
    try {
      TextDedup.buildSubstringIndex(base, "doc_id", "text", 3, dir)
      TextDedup.compactSubstringSegments(spark, dir)
      val snap0 = W.indexSnapshot(dir)
      assert(snap0.has("dups.parquet"),
        "compaction must emit the dup summary")
      // summary holds exactly the df>1 digests with their values
      val dups0 = spark.read.parquet(snap0.path("dups.parquet"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dups0.values.toSet == Set(2L), s"dups: $dups0")
      // pure-summary serving (no deltas): ≡ truth
      assert(servedOf(base) == truthOf(base))
      // APPEND after compaction → routes to the delta table, and the
      // new doc's "d e f" window net-appears ONCE while base holds it
      // with df = 1 — the AMBIGUOUS case that forces the base
      // membership probe (base 1 + delta 1 = 2 → dup)
      val app = Seq((10L, "d e f g h i")).toDF("doc_id", "text")
      TextDedup.appendToSubstringIndex(spark, app, dir, "doc_id", "text")
      val snap1 = W.indexSnapshot(dir)
      assert(snap1.has("wdelta.parquet"),
        "post-compaction appends must land in the delta table")
      val c1 = base.unionByName(app)
      assert(servedOf(c1) == truthOf(c1),
        "summary ⊕ delta (ambiguous overlap) diverges from truth")
      // a doc repeating its own window: delta-sum ≥ 2 decides dup
      // with NO base membership (base 0 + delta 2)
      val app2 = Seq((11L, "w w w w")).toDF("doc_id", "text")
      TextDedup.appendToSubstringIndex(spark, app2, dir, "doc_id", "text")
      val c2 = c1.unionByName(app2)
      assert(servedOf(c2) == truthOf(c2),
        "summary ⊕ delta (delta-only dup) diverges from truth")
      // DELETE after compaction → negative delta cancels a SUMMARY
      // digest ("a b c": base 2 − 1 = 1 → no longer duplicated)
      TextDedup.deleteFromSubstringIndex(spark,
        Seq((1L, "a b c x y z")).toDF("doc_id", "text"), dir,
        "doc_id", "text")
      val c3 = c2.filter($"doc_id" =!= 1L)
      assert(servedOf(c3) == truthOf(c3),
        "summary ⊕ negative delta diverges from truth")
      // RE-compaction folds the deltas: summary recomputed, delta
      // table dropped, serving unchanged
      TextDedup.compactSubstringSegments(spark, dir)
      val snap2 = W.indexSnapshot(dir)
      assert(!snap2.has("wdelta.parquet"),
        "re-compaction must fold and drop the delta table")
      val dups1 = spark.read.parquet(snap2.path("dups.parquet"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dups1.values.toSet == Set(2L) && dups1.size == 2,
        s"recomputed dups should hold 'd e f' and 'w w w': $dups1")
      assert(servedOf(c3) == truthOf(c3),
        "re-compacted serving diverges from truth")
    } finally {
      graft.operators.Warehouse.deleteRec(new java.io.File(dir))
    }
  }

  test("q167 pipeline provenance: every doc exactly one status, a " +
    "doc both near-dup and contaminated drops once as near_dup, " +
    "phase precedence deterministic") {
    // corpus: E = eval reference carrying the 8-gram; A = kept-shape
    // doc that CONTAINS the eval 8-gram (contam_ngram); B = near-dup
    // of A (one end token changed) that also carries the 8-gram AND
    // is semantically flagged — every later phase would drop it too,
    // so its status pins the precedence law; C = exact copy of A;
    // D = clean doc flagged only semantically; F = clean kept doc;
    // G = too short (quality gate); H = non-English (lang gate)
    val egram = "e1 e2 e3 e4 e5 e6 e7 e8"
    val filler = (1 to 20).map(i => s"w$i").mkString(" ")
    val aText = s"the $filler the $egram"   // 30 tokens, stopworded
    // near-dup of A: one early filler token changed (trigram jaccard
    // ~0.87), the eval 8-gram left intact so the n-gram sweep ALSO
    // flags it — the precedence case
    val bText2 = aText.replace("w1 ", "z1 ")
    val fFill = (1 to 25).map(i => s"f$i").mkString(" ")
    val dFill = (1 to 25).map(i => s"d$i").mkString(" ")
    val corpus = Seq(
      (0L, s"the eval set doc has $egram inside it twice the", "en", "src0"),
      (1L, aText, "en", "src1"),
      (2L, bText2, "en", "src1"),
      (3L, aText, "en", "src1"),
      (4L, s"the $dFill the unique tokens here", "en", "src1"),
      (5L, s"the $fFill the other unique tokens", "en", "src1"),
      (6L, "too short here", "en", "src1"),
      (7L, s"the $fFill das ist nicht englisch", "de", "src1")
    ).toDF("doc_id", "text", "lang", "source")
    val semFlags = Seq(4L, 2L).toDF("doc_id") // 2 also near-dup: precedence
    val out = graft.operators.Curation.pipelineV2Status(
        corpus, "src0", semFlags)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // exactly one row per document — the drop-once law
    assert(out.length == 8 && out.map(_._1).distinct.length == 8,
      s"expected one status row per doc: ${out.toSeq}")
    val m = out.toMap
    assert(m(0L) == "eval", s"E: ${m(0L)}")
    assert(m(1L) == "contam_ngram", s"A: ${m(1L)}")
    assert(m(2L) == "near_dup", // NOT contam_ngram / contam_semantic
      s"B must drop once as near_dup: ${m(2L)}")
    assert(m(3L) == "exact_dup", s"C: ${m(3L)}")
    assert(m(4L) == "contam_semantic", s"D: ${m(4L)}")
    assert(m(5L).startsWith("kept_"), s"F: ${m(5L)}")
    assert(m(6L) == "gated" && m(7L) == "gated",
      s"G/H: ${m(6L)} / ${m(7L)}")
  }

  test("q158 streamed segment appends answer the one-batch q151 result") {
    // df is additive over any disjoint split of the doc set, so three
    // single-file micro-batch segments must serve exactly what q151's
    // one-batch append serves
    val sf = SparkTestSession.sf
    assert(graft.operators.Curation.q158StreamSubstringAppend(spark, sf)
        .collect().toSeq ==
      graft.operators.Curation.q151SubstringDedupStored(spark, sf)
        .collect().toSeq)
  }

  test("q147 spliced corpus forces multi-span documents") {
    val out = graft.operators.Curation.q147SubstringDedup(
      spark, SparkTestSession.sf)
    assert(out.filter($"n_dup_spans" >= 2).count() > 0,
      "the spliced corpus law must produce documents with merged, " +
        "separated spans — otherwise the island logic is ungated")
    // spliced twins carry a unique marker token: it is always kept
    val spliced = out.filter(
      $"doc_id" >= graft.operators.Curation.Q147SpliceOffset)
    assert(spliced.count() > 0)
    assert(spliced.filter($"kept_tokens" === 0).count() == 0)
  }
}
