package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flag parsing follows the --parent-child convention") {
    val cfg = Main.parseArgs(Array(
      "--tally-fromdate", "20191001", "--tally-todate", "20191231",
      "--tally-company", "Reliance Industries",
      "--database-schema", "client_reliance",
      "--tally-master", "false"))
    assert(cfg.fromDate == "20191001" && cfg.toDate == "20191231")
    assert(cfg.company.contains("Reliance Industries"))
    assert(cfg.schema == "client_reliance")
    assert(!cfg.syncMaster && cfg.syncTransaction)
  }

  test("replay-mode full sync: YAML spec → TSV replay → parquet warehouse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |      - name: name
        |        field: Name
        |        type: text
        |      - name: opening_balance
        |        field: OpeningBalance
        |        type: amount
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"),
      "guid\tname\topening_balance\r\n" +
        "g1\tCash\t-100.50\r\n" +
        "g2\tSales\t(-)20.00\r\n")
    Main.run(spark, Main.Config(
      technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir)))
    val out = spark.read.parquet(s"$dir/wh/mst_ledger")
    val rows = out.collect().map(r =>
      r.getString(1) -> r.getDecimal(2).doubleValue()).toMap
    assert(rows == Map("Cash" -> -100.5, "Sales" -> -20.0))
  }
}
