package graft

import graft.tally.{ParquetWarehouse, TallyReports, TallyTables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end slice: CLI replay sync (YAML spec → TSV extract →
  * normalize → parquet warehouse) followed by a report query over the
  * loaded warehouse — the full user path of the reference
  * (extract-load then reports), in one test. */
class FullSyncIntegrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("replay sync loads a warehouse that reports can query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val yaml =
      """master:
        |  - name: mst_group
        |    collection: Group
        |    nature: Primary
        |    fields:
        |      - {name: name, field: Name, type: text}
        |      - {name: parent, field: Parent, type: text}
        |      - {name: primary_group, field: _PrimaryGroup, type: text}
        |      - {name: is_revenue, field: IsRevenue, type: logical}
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - {name: name, field: Name, type: text}
        |      - {name: parent, field: Parent, type: text}
        |      - {name: opening_balance, field: OpeningBalance, type: amount}
        |      - {name: is_revenue, field: IsRevenue, type: logical}
        |transaction:
        |  - name: trn_voucher
        |    collection: Voucher
        |    fields:
        |      - {name: guid, field: Guid, type: text}
        |      - {name: date, field: Date, type: date}
        |      - {name: is_order_voucher, field: IsOrderVch, type: logical}
        |      - {name: is_inventory_voucher, field: IsInvVch, type: logical}
        |  - name: trn_accounting
        |    collection: Voucher.AllLedgerEntries
        |    nature: Derived
        |    fields:
        |      - {name: guid, field: Guid, type: text}
        |      - {name: ledger, field: LedgerName, type: text}
        |      - {name: amount, field: Amount, type: amount}
        |""".stripMargin
    def w(path: String, s: String): Unit = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path), s)
    w(s"$dir/spec.yaml", yaml)
    w(s"$dir/mst_group.data",
      "name\tparent\tprimary_group\tis_revenue\r\n" +
        "Cash-in-hand\t\tCash-in-hand\t0\r\n" +
        "Sales Accounts\t\tSales Accounts\t1\r\n")
    w(s"$dir/mst_ledger.data",
      "name\tparent\topening_balance\tis_revenue\r\n" +
        "Cash\tCash-in-hand\t-100.00\t0\r\n" +
        "Sales\tSales Accounts\t0.00\t1\r\n")
    w(s"$dir/trn_voucher.data",
      "guid\tdate\tis_order_voucher\tis_inventory_voucher\r\n" +
        "v1\t2020-04-10\t0\t0\r\n")
    w(s"$dir/trn_accounting.data",
      "guid\tledger\tamount\r\n" +
        "v1\tCash\t(-)250.00\r\n" +
        "v1\tSales\t250.00\r\n")

    Main.run(spark, Main.Config(
      technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir)))

    val wh = new ParquetWarehouse(spark, s"$dir/wh")
    val empty = spark.emptyDataFrame
    // logical columns load as boolean; the report layer follows the
    // reference DDL's tinyint 0/1 convention — cast at the boundary
    // (what the reference's DB load does, database-structure.sql)
    val t = TallyTables(
      mstGroup = wh.read("mst_group")
        .withColumn("is_revenue", col("is_revenue").cast("int")),
      mstLedger = wh.read("mst_ledger")
        .withColumn("is_revenue", col("is_revenue").cast("int")),
      mstVouchertype = empty, mstStockItem = empty,
      mstOpeningBatchAllocation = empty, trnClosingstockLedger = empty,
      trnVoucher = wh.read("trn_voucher")
        .withColumn("is_order_voucher",
          col("is_order_voucher").cast("int"))
        .withColumn("is_inventory_voucher",
          col("is_inventory_voucher").cast("int")),
      trnAccounting = wh.read("trn_accounting"),
      trnInventory = empty)

    val tb = TallyReports.trialBalance(t, "2020-04-01", "2021-03-31")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(4)))
      .toMap
    // Cash: opening -100, debit 250 → closing -350; Sales: credit 250
    assert(tb("Cash") == ((-100.0, -350.0)))
    assert(tb("Sales") == ((0.0, 250.0)))
  }
}
