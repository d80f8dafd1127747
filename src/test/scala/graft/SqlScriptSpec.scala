package graft

import graft.sources.SqlScript
import graft.tally.TallyFixtures
import org.scalatest.funsuite.AnyFunSuite

class SqlScriptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("statement split honors literals and comments") {
    val script =
      """/* header; with ; semicolons */
        |insert into t values (';'); -- trailing; comment
        |select 'a''b;c' from t;
        |""".stripMargin
    assert(SqlScript.statements(script) ==
      Seq("insert into t values (';')", "select 'a''b;c' from t"))
    // a block comment abutting tokens must not glue them together
    assert(SqlScript.statements("select col/*doc*/from t;") ==
      Seq("select col from t"))
    // backslash escapes in string literals (Spark's default mode):
    // \' must not close the region, so the inner ; stays literal
    assert(SqlScript.statements("select 'it\\'s; done' from t; select 1;")
      == Seq("select 'it\\'s; done' from t", "select 1"))
    assert(SqlScript.statements("select \"a\\\"; b\" from t;")
      == Seq("select \"a\\\"; b\" from t"))
    // backticked identifiers keep doubled-char escape only — a
    // backslash inside one is an ordinary character
    assert(SqlScript.statements("select `a\\` from t;")
      == Seq("select `a\\` from t"))
  }

  test("mssql quoted-alias rewrites to AS form") {
    assert(SqlScript.mssqlCompat("select '00-01' 'guid', l.name from l")
      == "select '00-01' AS `guid`, l.name from l")
    // an already-ANSI statement passes through untouched
    val ansi = "select a as b, 'x' from t where c <> 0"
    assert(SqlScript.mssqlCompat(ansi) == ansi)
  }

  test("reference opening-transaction.sql runs verbatim on the warehouse") {
    val ref = new java.io.File(
      "/root/reference/post-import-scripts/opening-transaction.sql")
    assume(ref.exists(), "reference script not present")
    val src = scala.io.Source.fromFile(ref)
    val script = try src.mkString finally src.close()

    val dir = java.nio.file.Files.createTempDirectory("sqlscript").toString
    TallyFixtures.df(spark, "mst_ledger").write.parquet(s"$dir/mst_ledger")
    TallyFixtures.df(spark, "trn_voucher").write.parquet(s"$dir/trn_voucher")
    TallyFixtures.df(spark, "trn_accounting")
      .write.parquet(s"$dir/trn_accounting")
    val before = spark.read.parquet(s"$dir/trn_voucher").count()

    assert(SqlScript.runOnParquetDir(spark, dir, script) == 2)

    val openGuid = "00000000-0000-0000-0000-000000000000-00000001"
    val v = spark.read.parquet(s"$dir/trn_voucher")
      .filter(org.apache.spark.sql.functions.col("guid") === openGuid)
      .collect()
    assert(spark.read.parquet(s"$dir/trn_voucher").count() == before + 1)
    assert(v.length == 1)
    val row = v.head
    assert(row.getAs[String]("voucher_type") == "opening balance")
    assert(row.getAs[java.sql.Date]("date").toString == "1999-12-31")
    assert(row.getAs[Int]("is_accounting_voucher") == 1)

    // one accounting row per ledger with a non-zero opening balance,
    // amount = that balance (fixture: Cash -1000, Acme -500,
    // Beta +200, Stock Ledger -2000)
    val acc = spark.read.parquet(s"$dir/trn_accounting")
      .filter(org.apache.spark.sql.functions.col("guid") === openGuid)
      .collect().map(r => r.getAs[String]("ledger") ->
        r.getAs[java.math.BigDecimal]("amount").doubleValue()).toMap
    assert(acc == Map("Cash" -> -1000.0, "Acme Corp" -> -500.0,
      "Beta Traders" -> 200.0, "Stock Ledger" -> -2000.0))
  }
}
