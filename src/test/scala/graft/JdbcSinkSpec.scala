package graft

import graft.sources.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** Drives the JDBC load path (SURVEY §2.1 S8) against an embedded
  * Derby database — a real DB round trip, not just option plumbing. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("writeJdbc loads rows a plain JDBC read can see") {
    val df = Seq((1L, "Cash", -100.50), (2L, "Sales", 0.0))
      .toDF("id", "name", "balance")
    Sinks.writeJdbc(df, url, "mst_ledger", truncate = false)
    val back = spark.read.jdbc(url, "mst_ledger",
      new java.util.Properties())
    val rows = back.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(rows == Map(1L -> (("Cash", -100.5)), 2L -> (("Sales", 0.0))))
  }

  test("overwrite replaces prior content (the truncate-reload cycle)") {
    val v1 = Seq((1L, "old", 1.0)).toDF("id", "name", "balance")
    val v2 = Seq((9L, "new", 2.0)).toDF("id", "name", "balance")
    Sinks.writeJdbc(v1, url, "cycle_t", truncate = false)
    Sinks.writeJdbc(v2, url, "cycle_t", truncate = false)
    val back = spark.read.jdbc(url, "cycle_t", new java.util.Properties())
    assert(back.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }
}
