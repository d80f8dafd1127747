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
