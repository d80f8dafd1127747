package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nfc_normalize: UAX #15 laws — recomposition, idempotence, " +
    "already-clean fast path, SQL registration") {
    import graft.functions.TextNormExpressions.nfcNormalize
    val rows = Seq(
      "cafe\u0301",          // decomposed e + U+0301 -> U+00E9
      "a\u0300b",            // decomposed a + U+0300 mid-word
      "plain ascii text",    // fast path: already NFC, identity
      "\u00e9 already composed",
      "\ufffd survives")     // replacement char is NFC-stable
    val expect = Seq("caf\u00e9", "\u00e0b", "plain ascii text",
      "\u00e9 already composed", "\ufffd survives")
    val got = rows.toDF("t").select(nfcNormalize($"t").as("n"))
      .as[String].collect().toSeq
    assert(got == expect)
    // idempotence: nfc(nfc(x)) == nfc(x)
    val twice = rows.toDF("t")
      .select(nfcNormalize(nfcNormalize($"t")).as("n"))
      .as[String].collect().toSeq
    assert(twice == expect)
    // SQL registration (the GraftExtensions injection shape \u2014 the
    // shared test session predates the extension, so register the
    // temp twin exactly like VectorExpressionsSpec does)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => graft.functions.NfcNormalizeExpr(exprs.head),
      "built-in")
    val viaSql = spark.sql(
      "SELECT nfc_normalize('e\u0301') AS n").head().getString(0)
    assert(viaSql == "\u00e9")
  }

  test("occurrences counts non-overlapping literal matches") {
    val df = Seq(" the cat the dog the ").toDF("t")
    val n = df.select(TextAnalysis.occurrences($"t", " the ").as("n"))
      .head().getAs[Int]("n")
    assert(n == 3)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der Hund und die Katze und das Haus"),
      (3L, "le chat et le chien et les maisons"),
      (4L, "的 是 在 了")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "zh")
  }

  test("langId ties break to the earliest language code") {
    // "de la" scores 1 for es (" de ") and 1 for fr (" la "): the
    // argmax must keep 'es' (alphabetically earlier), matching the
    // oracle's first-lang-whose-score->=-all-later CASE chain
    val df = Seq((1L, "de la"), (2L, "nothing matches here!")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "es")
    assert(got(2L) == "de") // all-zero tie: first alphabetical
  }

  test("langId projection compiles under whole-stage codegen (no interpreted fallback)") {
    // the pre-round-10 fold shape doubled the expression tree per
    // language and janino refused to compile it — Spark fell back to
    // interpreted projection for EVERY language-ID scan. fallback=false
    // turns that silent degradation into a test failure.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, "the cat and the dog of a house"))
        .toDF("doc_id", "text")
      val rows = df.select($"doc_id",
        TextAnalysis.langId($"text").as("l"),
        TextAnalysis.qualityColumn($"text").as("q")).collect()
      assert(rows.head.getString(1) == "en")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("importanceWeights matches the hand-computed DSIR log-ratios") {
    // corpus: doc 1 (target) "a b", doc 2 (raw) "a c"
    // vocab: a(n=2,nt=1) b(1,1) c(1,0); tot_raw=4 tot_tgt=2 |V|=3
    // s(a)=log2((2/5)/(3/7))=log2(14/15)  s(b)=log2((2/5)/(2/7))=log2(7/5)
    // s(c)=log2((1/5)/(2/7))=log2(7/10)
    val df = Seq((1L, "a b", "tgt"), (2L, "a c", "other"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.importanceWeights(df, "doc_id", "text",
        $"source" === "tgt")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val sA = math.log(14.0 / 15) / math.log(2)
    val sB = math.log(7.0 / 5) / math.log(2)
    val sC = math.log(7.0 / 10) / math.log(2)
    assert(got(1L)._1 == 1 && got(2L)._1 == 0)
    assert(got(1L)._2 == 2 && got(2L)._2 == 2)
    assert(math.abs(got(1L)._3 - (sA + sB) / 2) < 1e-6)
    assert(math.abs(got(2L)._3 - (sA + sC) / 2) < 1e-6)
    // target-looking doc scores above the raw-looking one
    assert(got(1L)._3 > got(2L)._3)
  }

  test("quality metrics compute exact token statistics") {
    val df = Seq((1L, "aa bb aa cc")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df, "doc_id", "text").head()
    assert(m.getAs[Int]("n_tokens") == 4)
    assert(m.getAs[Int]("n_distinct") == 3)
    assert(m.getAs[Double]("distinct_ratio") == 0.75)
    assert(m.getAs[Double]("mean_token_len") == 2.0)
  }

  test("qualityColumn equals qualityScore's quality on the corpus") {
    // the per-row Column and the metrics-DataFrame formulations must
    // never drift (q70 samples on the former, q28/q67 gate the latter)
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val viaScore = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select($"doc_id", $"quality")
    val viaColumn = docs.select($"doc_id",
      TextAnalysis.qualityColumn($"text").as("quality"))
    assert(viaScore.exceptAll(viaColumn).isEmpty &&
      viaColumn.exceptAll(viaScore).isEmpty)
  }

  test("boilerplateStats scores template-heavy docs high") {
    // three docs share the template trigrams; one is all-fresh text
    val tpl = "terms of service apply here"
    val docs = Seq(
      (1L, s"$tpl alpha beta gamma"),
      (2L, s"$tpl delta epsilon zeta"),
      (3L, s"$tpl eta theta iota"),
      (4L, "completely novel words appearing nowhere else at all"))
      .toDF("doc_id", "text")
    // topK = 3: exactly the three trigrams inside the shared template
    // ("terms of service", "of service apply", "service apply here")
    // have df 3; everything else df 1 and loses the tie-break window
    val got = TextAnalysis.boilerplateStats(docs, "doc_id", "text",
        n = 3, topK = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got(1L)._2 == 3 && got(2L)._2 == 3 && got(3L)._2 == 3)
    assert(got(4L)._2 == 0 && got(4L)._3 == 0.0)
    // 8 tokens -> 6 trigrams, 3 of them boilerplate
    assert(got(1L)._1 == 6 && got(1L)._3 == 0.5)
  }

  test("fingerprint is invariant under token reordering") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("token frequencies count corpus-wide") {
    val df = Seq("a b, a! c", "b a").toDF("text")
    val f = TextAnalysis.tokenFrequencies(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("repetition metrics match hand-computed values") {
    val df = Seq(
      (1L, "a b a b a"),          // 5 words, 2 distinct, top 'a' ×3
      (2L, "x y z"),              // no repetition
      (3L, "w w w w")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L) == ((5L, 2L, 0.6, 0.6)))
    assert(m(2L) == ((3L, 3L, 0.0, round6(1.0 / 3))))
    assert(m(3L) == ((4L, 1L, 0.75, 1.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("token entropy matches hand-computed values") {
    val df = Seq(
      (1L, "a b a b a"),   // p = 3/5, 2/5
      (2L, "x y z"),       // uniform over 3
      (3L, "w w w w")).toDF("doc_id", "text")
    val h = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def ent(ps: Seq[Double]) =
      round6(ps.map(p => -p * math.log(p) / math.log(2)).sum)
    assert(h(1L) == ent(Seq(0.6, 0.4)))
    assert(h(2L) == ent(Seq(1.0 / 3, 1.0 / 3, 1.0 / 3)))
    assert(h(3L) == 0.0)
  }

  test("maxTokens caps the per-row repetition/entropy loop") {
    // the O(words × distinct) guard: capped metrics equal the metrics
    // of the truncated prefix (a semantic truncation, documented), and
    // docs at-or-under the cap are byte-identical to the uncapped path
    val longDoc = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, longDoc), (2L, "a b a b a")).toDF("doc_id", "text")
    val capped = TextAnalysis.repetitionMetrics(df, "doc_id", "text",
        maxTokens = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(capped(1L) == ((10L, 10L)))   // first 10 tokens only
    assert(capped(2L) == ((5L, 2L)))     // under the cap: unchanged
    val prefix = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val hCap = TextAnalysis.tokenEntropy(df, "doc_id", "text",
      maxTokens = 10).filter($"doc_id" === 1L).head().getDouble(1)
    val hPrefix = TextAnalysis.tokenEntropy(prefix, "doc_id", "text")
      .head().getDouble(1)
    assert(hCap == hPrefix)
  }

  test("gram novelty: first-seen by min doc_id; short docs get zero") {
    val df = Seq(
      (1L, "a b c d"),      // grams "a b c","b c d" — both first here
      (2L, "a b c x"),      // "a b c" seen in 1; "b c x" novel
      (3L, "hi")            // too short for a trigram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gramNovelty(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2, 2, 1.0)))
    assert(got(2L) == ((2, 1, 0.5)))
    assert(got(3L) == ((0, 0, 0.0)))
  }

  test("rolling hash differs when order differs") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("doc_id", "text")
    val h = df.select($"doc_id", TextAnalysis.rollingHash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) != h(2L))
  }

  test("bigram surprisal: multiset grams, corpus p, short docs drop") {
    // corpus bigrams: "a b"×2, "b a"×2, "c c"×1 → total 5
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "c c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gramSurprisal(df, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val s04 = BigDecimal(-math.log(0.4) / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s02 = BigDecimal(-math.log(0.2) / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3, s04)))   // grams: ab, ba, ab — all p = 2/5
    assert(got(2L) == ((1, s04)))
    assert(got(3L) == ((1, s02)))
    assert(!got.contains(4L))       // one token → no bigram → no row
  }

  test("heavy hitters: exact top-k counts, CMS never undercounts") {
    val df = Seq(
      (1L, "a a a a b b b c c d"),
      (2L, "a a b c e")).toDF("doc_id", "text")
    val r = TextAnalysis.heavyHittersChecked(df, "text", k = 3,
      eps = 0.01, confidence = 0.999, seed = 42).orderBy($"rank")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2),
        x.getInt(3)))
    assert(r.toSeq == Seq(("a", 6L, 1, 1), ("b", 4L, 2, 1),
      ("c", 3L, 3, 1)))
    // the no-undercount law holds for EVERY token, not just the
    // top-k the query emits — probe the sketch across the full vocab
    val toks = df.select(explode(split($"text", " ")).as("t"))
    val sk = toks.stat.countMinSketch("t", 0.01, 0.999, 42)
    val exact = toks.groupBy($"t").count().collect()
      .map(x => x.getString(0) -> x.getLong(1))
    exact.foreach { case (t, c) =>
      assert(sk.estimateCount(t) >= c, s"CMS undercounted '$t'") }
  }

  test("CMS artifact: merged sketch ≡ rebuilt byte for byte, counts additive, guards") {
    val a = Seq((1L, "a a a a b b b c c d"), (2L, "a a b c e"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "a b b f f f"), (4L, "c c c a"))
      .toDF("doc_id", "text")
    val union = a.unionByName(b)
    val dirA = java.nio.file.Files.createTempDirectory("cms_a").toString
    val dirU = java.nio.file.Files.createTempDirectory("cms_u").toString
    def bin(d: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(graft.operators.Warehouse
        .indexSnapshot(d).path("cms.bin")))
    try {
      TextAnalysis.buildCmsArtifact(a, "doc_id", "text", dirA,
        eps = 0.01, confidence = 0.999, seed = 42)
      TextAnalysis.appendToCmsArtifact(spark, b, "doc_id", "text", dirA)
      TextAnalysis.buildCmsArtifact(union, "doc_id", "text", dirU,
        eps = 0.01, confidence = 0.999, seed = 42)
      // merged ≡ rebuilt: identical geometry counter tables ADD, so
      // the serialized sketches are byte-identical
      assert(java.util.Arrays.equals(bin(dirA), bin(dirU)),
        "merged CMS bin diverges from the union rebuild")
      // segment-summed counts equal the union build's
      def counts(d: String) = graft.operators.Warehouse
        .indexSnapshot(d).read(spark, "counts.parquet")
        .groupBy($"t").agg(sum($"cnt").as("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts(dirA) == counts(dirU))
      // and the served top-k equals the in-plan checked pass
      val served = TextAnalysis.heavyHittersFromArtifact(spark, dirA, 3)
        .orderBy($"rank").collect().toSeq
      val inPlan = TextAnalysis.heavyHittersChecked(union, "text",
        k = 3, eps = 0.01, confidence = 0.999, seed = 42)
        .orderBy($"rank").collect().toSeq
      assert(served == inPlan)
      // re-ingest refused against the ledger; intra-batch dups refused
      val err = intercept[IllegalArgumentException] {
        TextAnalysis.appendToCmsArtifact(spark, b, "doc_id", "text",
          dirA)
      }
      assert(err.getMessage.contains("append-only"))
      val errDup = intercept[IllegalArgumentException] {
        TextAnalysis.appendToCmsArtifact(spark,
          Seq((9L, "x"), (9L, "y")).toDF("doc_id", "text"),
          "doc_id", "text", dirA)
      }
      assert(errDup.getMessage.contains("duplicated ids"))
      // empty batch: a no-op
      val before = bin(dirA).toSeq
      TextAnalysis.appendToCmsArtifact(spark,
        union.filter($"doc_id" < 0), "doc_id", "text", dirA)
      assert(bin(dirA).toSeq == before)
      // meta discipline
      new java.io.File(s"$dirA/_meta.json").delete()
      intercept[IllegalArgumentException] {
        TextAnalysis.heavyHittersFromArtifact(spark, dirA, 3)
      }
    } finally {
      graft.operators.Warehouse.deleteRec(new java.io.File(dirA))
      graft.operators.Warehouse.deleteRec(new java.io.File(dirU))
    }
  }

  test("heavy hitters: deterministic tie-break and corpus gate shape") {
    val out = graft.operators.Curation.q150TokenHeavyHitters(
      spark, SparkTestSession.sf).collect()
    assert(out.length == graft.operators.Curation.Q150TopK)
    assert(out.forall(_.getInt(3) == 1), "a CMS-law flag tripped")
    // ranks are 1..k and counts non-increasing with token tie-break
    val ranked = out.map(r => (r.getInt(2), r.getLong(1), r.getString(0)))
    assert(ranked.map(_._1).toSeq == (1 to out.length))
    ranked.sliding(2).foreach { case Array((_, c1, t1), (_, c2, t2)) =>
      assert(c1 > c2 || (c1 == c2 && t1 < t2))
    case _ => ()
    }
  }
}
