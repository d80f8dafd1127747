package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f)),   // identical to 0 → cos 1
    (2L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 0 → cos 0
    (3L, Seq(1.0f, 1.0f, 0.0f)),   // 45° to 0 → cos ≈ 0.707107
    (4L, Seq(-1.0f, 0.0f, 0.0f)))  // opposite → cos -1
    .toDF("vec_id", "embedding")

  test("cosine building block matches hand-computed values") {
    val a = vecs.as("a").filter($"vec_id" === 0).select($"embedding".as("x"))
    val c = a.crossJoin(vecs.as("b"))
      .select($"vec_id", Similarity.cosine($"x", $"embedding").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c(0L) == 1.0 && c(1L) == 1.0)
    assert(c(2L) == 0.0)
    assert(c(3L) == 0.707107)  // round(1/sqrt(2), 6)
    assert(c(4L) == -1.0)
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(top.toSeq == Seq((1L, 1), (3L, 2), (2L, 3), (4L, 4)))
  }

  test("LSH top-k finds an identical vector (same buckets always)") {
    val top = Similarity.lshTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 2,
      planes = 6, tables = 4)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(top.contains(1L))
  }

  test("near-dup pairs: only identical pair at cos >= 0.99") {
    val p = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.toSeq == Seq((0L, 1L)))
  }

  test("derived LSH params are selective and miss-bounded for real τ") {
    Seq(0.7, 0.8, 0.9).foreach { tau =>
      val (planes, tables) = Similarity.lshParamsFor(tau)
      val ratio = tables.toDouble / math.pow(2.0, planes)
      assert(ratio < 1.0, s"τ=$tau: degenerate ($planes, $tables)")
      assert(ratio <= 0.125, s"τ=$tau: fan-out cap violated ($ratio)")
      val p = 1.0 - math.acos(tau) / math.Pi
      val miss = math.pow(1.0 - math.pow(p, planes), tables)
      assert(miss <= 1e-4, s"τ=$tau: miss $miss too high")
    }
  }

  test("scale-aware LSH params tighten with n, keep the miss bound") {
    val p = 1.0 - math.acos(0.9) / math.Pi
    var lastRatio = Double.MaxValue
    Seq(1000L, 10000L, 100000L, 1000000L).foreach { n =>
      val (planes, tables) = Similarity.lshParamsForScale(0.9, n, 32.0)
      val ratio = tables.toDouble / math.pow(2.0, planes)
      assert(ratio <= 32.0 / n,
        s"n=$n: collision cap violated ($planes, $tables)")
      assert(ratio <= lastRatio, s"n=$n: cap not monotone")
      lastRatio = ratio
      val miss = math.pow(1.0 - math.pow(p, planes), tables)
      assert(miss <= 1e-4, s"n=$n: miss $miss too high")
    }
    // beyond the 32-plane key width the derive degrades gracefully
    // (returns the tightest config instead of throwing)
    val (pl, _) = Similarity.lshParamsForScale(0.9, 100000000000L, 1.0)
    assert(pl == 32)
  }

  test("default (derived) near-dup LSH finds the identical pair") {
    // planes/tables omitted → lshParamsFor(0.99) drives the bucketing
    val p = Similarity.cosineNearDupPairsLsh(
        vecs, "vec_id", "embedding", minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.toSeq == Seq((0L, 1L)))
  }

  test("IVF top-k finds identical vectors and reports sane recall") {
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val exact = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(
        e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 10,
        nLists = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@10 too low: $recall")
    // probing every list ≡ brute force
    val full = Similarity.ivfTopK(
        e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 10,
        nLists = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
  }

  test("persisted IVF index answers queries identically to in-memory") {
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_index").toString
    try {
      Similarity.buildIvfIndex(e, "vec_id", "embedding", dir,
        nLists = 8, iterations = 2)
      val fromIndex = Similarity.ivfTopKFromIndex(spark,
          e.filter(col("vec_id") < 5), "vec_id", "embedding", dir,
          k = 10, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      val inMemory = Similarity.ivfTopK(
          e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 10,
          nLists = 8, nProbe = 4, iterations = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
      assert(fromIndex == inMemory)
      assert(fromIndex.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("pinned τ=0.4 LSH equals the exact all-pairs scan (oracle compat)") {
    // moved here from the shipped q48 entry (round-8 verdict #3): the
    // τ=0.4 regime has NO selective LSH configuration (lshParamsFor
    // would need 19 planes × 58k tables), so the planes=2/tables=16
    // pin is super-quadratic by construction — correct, and the
    // equivalence is still worth guarding, but it must never be a
    // shipped query plan. Exact τ=0.4 search belongs to the q26 scan.
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val exact = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(e, "vec_id", "embedding",
        minCosine = 0.4, planes = 2, tables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("pinned planes=10/tables=32 τ=0.9 LSH equals the exact scan (retired q51 pin)") {
    // moved here from the shipped q51 entry (round-12 verdict #3): the
    // fixed cap keeps candidates a constant cartesian fraction
    // (~n²/64 — the 10× bench measured 99.6× growth for 10× data), so
    // like the τ=0.4 pin above it must never be a shipped query plan.
    // q51 now runs the scale-derived τ=0.95 regime; the pinned
    // config's recall on the flip fixture is still worth guarding.
    val aug = graft.operators.Curation.flippedNearDupCorpus(
      Tables.embeddings(spark, SparkTestSession.sf))
    val exact = Similarity.cosineNearDupPairs(aug, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(aug, "vec_id", "embedding",
        minCosine = 0.9, planes = 10, tables = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("derived near-dup params generate a sub-cartesian candidate set") {
    // the q48 cost contract: at the lshParamsFor-derived parameters
    // the bucketed candidate volume is a small fraction of n(n−1)/2,
    // yet still contains every true τ=0.9 pair on the near-dup fixture
    val aug = graft.operators.Curation.flippedNearDupCorpus(
      Tables.embeddings(spark, SparkTestSession.sf))
    val n = aug.count()
    val cartesian = n * (n - 1) / 2
    val (planes, tables) = Similarity.lshParamsFor(0.9)
    val cand = Similarity.lshCandidatePairs(
      aug, "vec_id", "embedding", planes, tables)
    val candCount = cand.count()
    assert(candCount < cartesian / 4,
      s"candidates $candCount not sub-cartesian (cartesian $cartesian)")
    val truePairs = Similarity.cosineNearDupPairs(
        aug, "vec_id", "embedding", 0.9)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty)
    assert(truePairs.subsetOf(candSet),
      s"candidates miss true pairs: ${(truePairs -- candSet).take(5)}")
  }

  test("lshParamsForScale: the 32-plane cap binds at huge n") {
    // past n ≈ 3M·candidatesPerVector no config clears the per-vector
    // collision cap inside the kernel's 32-bit key width — the
    // warn-and-degrade branch must return the TIGHTEST config (32
    // planes, max tables) rather than throw; this is the live path a
    // billion-vector corpus hits and the scaladoc's "shard the corpus"
    // advice applies
    val n = 4_000_000_000L
    val (planes, tables) = Similarity.lshParamsForScale(0.9, n,
      candidatesPerVector = 32.0)
    assert(planes == 32)
    // tables is still derived from the miss-rate bound at 32 planes
    val p = 1.0 - math.acos(0.9) / math.Pi
    val pSig = math.pow(p, 32)
    val expectTables = math.max(1,
      math.ceil(math.log(1e-4) / math.log1p(-pSig)).toInt)
    assert(tables == expectTables)
    // and the returned config indeed misses the cap — the degradation
    // is real, not a rounding accident
    assert(tables.toDouble / math.pow(2.0, 32) > 32.0 / n)
    // a modest n still clears the cap with room (the non-degenerate
    // contract the scale bench relies on)
    val (p2, t2) = Similarity.lshParamsForScale(0.9, 10000L,
      candidatesPerVector = 32.0)
    assert(p2 < 32 && t2.toDouble / math.pow(2.0, p2) <= 32.0 / 10000L)
  }

  test("corpusSizeHint derives the same params as the sampled count") {
    // q48's footer-count hint must land on the identical (planes,
    // tables) the sampled estimate would pick at the same true n —
    // the hint changes WHERE the size comes from, never the math
    val e = graft.operators.Curation.flippedNearDupCorpus(
      Tables.embeddings(spark, SparkTestSession.sf))
    val n = e.count()
    val viaHint = Similarity.lshParamsForScale(0.9, n,
      graft.operators.Curation.Q48CandidatesPerVector)
    val footerN = 2L * Tables.parquetRowCount(spark,
      s"${SparkTestSession.sf}/embeddings.parquet")
    assert(footerN == n, s"footer count $footerN != true count $n")
    val viaFooter = Similarity.lshParamsForScale(0.9, footerN,
      graft.operators.Curation.Q48CandidatesPerVector)
    assert(viaHint == viaFooter)
  }

  test("dot product is exact decimal (partition-order independent)") {
    val big = spark.range(0, 1000).select($"id".cast("long").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (i.cast("float") / 64.0f)).as("embedding"))
    val d = big.select(Similarity.dotExact($"embedding", $"embedding")
      .cast("string").as("d")).distinct().collect()
    assert(d.length == 1)  // same vector everywhere → one exact value
  }

  test("int8 quantization: hand-computed codes, zero-vector guard, " +
    "reconstruction flags hold on the harness corpus") {
    // scale = 3.25/127; codes floor(x/scale + 0.5): 1.0 -> 39,
    // -2.5 -> -98, 3.25 -> 127 (the max-abs lane always lands ±127)
    val small = Seq(
      (1L, Seq(1.0f, -2.5f, 3.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))) // zero vector: all-zero codes
      .toDF("vec_id", "embedding")
    val got = Similarity.int8QuantAudit(small, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getInt(6))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5s(s: String) = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    assert(got(1L) == ((md5s("39,-98,127"), 68L, -98, 127, 1, 1)))
    assert(got(2L) == ((md5s("0,0,0"), 0L, 0, 0, 1, 1)))
    // the full harness corpus: every reconstruction law holds and the
    // max-abs lane of every vector codes to ±127
    val corpus = Similarity.int8QuantAudit(
      Tables.embeddings(spark, SparkTestSession.sf), "vec_id", "embedding")
    assert(corpus.filter($"ok_err" =!= 1 || $"ok_cos" =!= 1).isEmpty)
    assert(corpus.filter(greatest($"q_max", -$"q_min") =!= 127).isEmpty)
  }

  test("quantized-domain KNN keeps high recall against the exact top-k") {
    // the number a deployment actually cares about: how much of the
    // float-exact neighborhood survives int8 scoring. The 0.999
    // reconstruction-cosine bound implies tiny score perturbation, so
    // recall@10 on the harness corpus must stay high (the boundary
    // neighbors at cos ≈ 0.4–0.55 can legitimately swap)
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val queries = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(
      queries, e, "vec_id", "embedding", k = 10))
    val quant = pairs(Similarity.quantizedTopK(
      queries, e, "vec_id", "embedding", k = 10))
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall@10 = $recall")
  }

  test("PQ-ADC top-k equals the exact top-k at the q130 operating point") {
    // stronger than the oracle's top-3 gate: the full top-10 must
    // match, because the exact rerank decides the boundary and the
    // 256-row window holds the true top-10 at ks=64 (the measured
    // operating point — ks=16 buried top-3 neighbors below rank 74
    // on this Gaussian corpus, PQ's worst-case geometry)
    val e = Tables.embeddings(spark, SparkTestSession.sf)
    val queries = e.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"cos", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val exact = rows(Similarity.bruteForceTopK(
      queries, e, "vec_id", "embedding", k = 10))
    val pq = rows(Similarity.pqTopK(
      queries, e, "vec_id", "embedding", k = 10, ks = 64,
      iterations = 1, rerank = 1024))
    assert(exact.nonEmpty)
    assert(pq == exact,
      s"PQ diverges: missing ${(exact -- pq).take(3)}, "
        + s"extra ${(pq -- exact).take(3)}")
  }

  test("streamed micro-batch appends serve identically to the one-batch append (q148 ≡ q133)") {
    // both entries end at the same served top-k; the stream variant
    // must be invisible — appends encode against FIXED centroids, so
    // the split into three single-file micro-batches cannot move a
    // single served row
    val batch = graft.operators.Curation
      .q133CdcIvfAppend(spark, SparkTestSession.sf).collect().toSeq
    val streamed = graft.operators.Curation
      .q148StreamIndexAppend(spark, SparkTestSession.sf).collect().toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed appends diverge from the batch append: " +
        s"${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  test("semantic decontamination catches the paraphrase fixture the " +
    "n-gram pass misses (round-19 verdict #5)") {
    // the planted scenario: an eval item whose TEXT shares not a
    // single 8-gram with its training source (a paraphrase /
    // translation) while its EMBEDDING is the source's — the q64
    // n-gram sweep must find nothing, the semantic sweep must flag
    // exactly the planted sources
    val trainDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the wide river bank today at dawn"),
      (1L, "spark clusters shuffle large tables across many executors while columnar scans prune early"),
      (2L, "completely unrelated filler text about cooking pasta with garlic olive oil and fresh basil"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (1000L, "a fast auburn vulpine leaps above an idle canine beside a broad waterway this morning"))
      .toDF("doc_id", "text")
    // n-gram pass: zero shared 8-grams
    assert(graft.operators.TextDedup.contaminationPairs(
      trainDocs, evalDocs, "doc_id", "text", n = 8).count() == 0,
      "the fixture must defeat the verbatim n-gram pass")
    // embeddings: 24 deterministic train vectors (ids 0..23, 16-dim);
    // the eval embedding is train vector 0's (the paraphrase sits at
    // quantized cos 1.0; natural integer-grid cross pairs stay well
    // under τ = 0.95)
    val trainVecs = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(16)(j =>
        (((i * 31 + j * 17) % 13) - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val evalVecs = trainVecs.filter($"vec_id" === 0L)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("semdecon").toString
    try {
      Similarity.buildIvfIndex(trainVecs, "vec_id", "embedding", dir,
        nLists = 4, assignments = 2)
      val flagged = Similarity.semanticContaminationFromIndex(spark,
          evalVecs, "vec_id", "embedding", dir, tau = 0.95, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flagged.contains((0L, 1000L)),
        s"the planted paraphrase must be flagged; got $flagged")
    } finally {
      graft.operators.Warehouse.deleteRec(new java.io.File(dir))
    }
  }
}
