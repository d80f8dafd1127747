package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the report queries on the sf0.001 test tables
  * (exact value parity is covered by the DuckDB oracle gate; these
  * assert structural/accounting invariants à la SURVEY §5.6). */
class ReportsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  import graft.operators.Reports

  test("every query entry returns rows on the smoke scale factor") {
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).limit(1).count() == 1, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("q61 self-gate emits all-1 flags on the harness events") {
    // the oracle expects constant-1 pXX_ok columns; a sketch drift
    // outside the rank window would fail here before the driver sees it
    val rows = Reports.q61ValueStatsChecked(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq("p50_ok", "p95_ok", "p99_ok").foreach { c =>
      assert(rows.forall(_.getAs[Int](c) == 1),
        s"$c not 1 for ${rows.filter(_.getAs[Int](c) != 1).toSeq}")
    }
  }

  test("q89 gross tokens reconcile with q82; effective is a sane share") {
    import graft.operators.Curation
    // passages partition each doc's token list exactly (tail keeps its
    // remainder), so per-source gross tokens must equal the vocab
    // report's token volume — a cross-operator reconciliation
    val vocab = Curation.q82VocabStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
    val eff = Curation.q89EffectiveTokens(spark, sf).collect()
    assert(eff.map(_.getString(0)).toSet == vocab.keySet)
    eff.foreach { r =>
      val src = r.getString(0)
      val gross = r.getAs[Long]("gross_tokens")
      val kept = r.getAs[Long]("effective_tokens")
      assert(gross == vocab(src), s"$src gross $gross != vocab ${vocab(src)}")
      assert(kept > 0 && kept <= gross)
    }
  }

  test("q59 approx profile stays inside the sketch's rank-error bound") {
    // percentile_approx(accuracy=A) returns an actual SAMPLE whose
    // rank is within the sketch's error of the target — so the gate is
    // on RANK, not value: the exact CDF interval of the returned value
    // must intersect [q ± tol]. tol = 20/A (nominal 1/A error ×20
    // headroom for the per-partition Greenwald-Khanna summaries Spark
    // merges — the mergeability is what makes it 100 TB-viable) + 1/n
    // (a group of n samples cannot place any value closer than one
    // rank step).
    val acc = 10000
    val approx = Reports.q59ValueStatsApprox(spark, sf, accuracy = acc)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val valuesByType = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(approx.keySet == valuesByType.keySet)
    approx.foreach { case (et, a) =>
      val vals = valuesByType(et)
      val n = vals.length.toDouble
      val tol = 20.0 / acc + 1.0 / n
      Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99).foreach {
        case (name, q) =>
          val v = a.getAs[Double](name)
          // fin() rounds the emitted value to 6dp — rank with slack
          val rLo = vals.count(_ < v - 1e-5) / n
          val rHi = vals.count(_ <= v + 1e-5) / n
          assert(rLo <= q + tol && rHi >= q - tol,
            s"$et $name=$v has exact rank [$rLo,$rHi], " +
              s"outside [$q ± $tol] (n=${n.toInt})")
      }
    }
  }

  test("q83 sketch vocab estimates stay within 5·rsd of q82's exact counts") {
    import graft.operators.Curation
    val exact = Curation.q82VocabStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val approx = Curation.vocabStatsSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_est")).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (src, a) =>
      val e = exact(src).toDouble
      assert(math.abs(a - e) / e <= 5 * Curation.Q83Rsd,
        s"$src: approx=$a exact=$e exceeds 5·rsd")
    }
    // the self-gating q83 shape must agree: every source's flag is 1
    val flags = Curation.q83VocabStatsApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Int]("n_distinct_ok"))
    assert(flags.nonEmpty && flags.forall(_._2 == 1),
      s"q83 flags not all 1: ${flags.filter(_._2 != 1).mkString(",")}")
  }

  test("trial balance totals reconcile with raw order totals") {
    val tb = Reports.q02TrialBalance(spark, sf)
    // fulfilled/open_amt are edge-rounded doubles of exact 2-dp sums;
    // re-cast to DECIMAL so the reconciliation total is itself exact
    val lhs = tb.agg(sum((col("fulfilled") + col("open_amt"))
      .cast("decimal(18,6)"))).head().getDecimal(0)
    val rhs = graft.Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,6)"))).head().getDecimal(0)
    assert(lhs.compareTo(rhs) == 0)
  }

  test("gap-filled calendar has exactly one row per day") {
    val cal = Reports.q10DailyGapFill(spark, sf)
    assert(cal.count() == 365)
    assert(cal.select(col("d")).distinct().count() == 365)
  }

  test("top-1-per-group emits one row per customer with orders") {
    val t = Reports.q07TopOrderPerCustomer(spark, sf)
    val nCust = graft.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(t.count() == nCust)
  }

  test("cdc merge preserves source rows for overlapping keys") {
    val m = Reports.q17CdcMerge(spark, sf)
    // lower-cased statuses exist only in source → proves source-wins
    val statuses = m.collect().map(_.getString(0)).toSet
    assert(statuses.exists(s => s != s.toUpperCase))
  }

  test("oracle coverage: every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
