package graft.tally

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tally-shaped fixture corpus (FIXTURES.md §A): one source of truth
  * rendered BOTH as Spark DataFrames and as DuckDB VALUES CTEs, so the
  * 15 reference reports run as DataFrame programs AND get hash-checked
  * against a SQL oracle over identical data.
  *
  * Scenario coverage (per FIXTURES.md):
  *  - every voucher class incl. an order voucher whose accounting rows
  *    correct reports must exclude
  *  - all three inventory workflow styles (blank tracking, strict
  *    note+invoice pair, note-only partial)
  *  - a 3-level group chain for tree traversals
  *  - multiple closing-stock snapshots for the row_number latest-pick
  *  - a contra voucher with both legs on the same ledger
  * Sign conventions follow the engine: debit < 0, inward > 0.
  */
object TallyFixtures {

  /** (column, sqlType) pairs per table + row literals. Types are
    * explicit so Spark and DuckDB infer identical schemas. */
  private type Tbl = (String, Seq[(String, String)], Seq[Seq[String]])

  private def s(v: String) = "'" + v.replace("'", "''") + "'"

  val tables: Seq[Tbl] = Seq(
    ("mst_group",
      Seq("name" -> "VARCHAR", "parent" -> "VARCHAR",
        "primary_group" -> "VARCHAR", "is_revenue" -> "INT",
        "is_deemedpositive" -> "INT", "affects_gross_profit" -> "INT"),
      Seq(
        Seq(s("Sales Accounts"), s(""), s("Sales Accounts"), "1", "0", "1"),
        Seq(s("Purchase Accounts"), s(""), s("Purchase Accounts"), "1", "1", "1"),
        Seq(s("Cash-in-hand"), s(""), s("Cash-in-hand"), "0", "1", "0"),
        Seq(s("Sundry Debtors"), s(""), s("Sundry Debtors"), "0", "1", "0"),
        Seq(s("Sundry Creditors"), s(""), s("Sundry Creditors"), "0", "0", "0"),
        Seq(s("Stock-in-hand"), s(""), s("Stock-in-hand"), "0", "1", "0"),
        Seq(s("Indirect Expenses"), s(""), s("Indirect Expenses"), "1", "1", "0"),
        Seq(s("Loans & Advances (Asset)"), s(""), s("Loans & Advances (Asset)"), "0", "1", "0"),
        Seq(s("Advances"), s("Loans & Advances (Asset)"), s("Loans & Advances (Asset)"), "0", "1", "0"),
        Seq(s("Staff Advances"), s("Advances"), s("Loans & Advances (Asset)"), "0", "1", "0"))),
    ("mst_ledger",
      Seq("guid" -> "VARCHAR", "name" -> "VARCHAR", "parent" -> "VARCHAR",
        "opening_balance" -> "DECIMAL(17,2)", "is_revenue" -> "INT",
        "gstn" -> "VARCHAR"),
      Seq(
        Seq(s("L001"), s("Cash"), s("Cash-in-hand"), dec2("-1000.00"), "0", s("")),
        Seq(s("L002"), s("Sales Local"), s("Sales Accounts"), dec2("0.00"), "1", s("")),
        Seq(s("L003"), s("Purchase Local"), s("Purchase Accounts"), dec2("0.00"), "1", s("")),
        Seq(s("L004"), s("Acme Corp"), s("Sundry Debtors"), dec2("-500.00"), "0", s("GSTN001")),
        Seq(s("L005"), s("Beta Traders"), s("Sundry Creditors"), dec2("200.00"), "0", s("GSTN002")),
        Seq(s("L006"), s("Stock Ledger"), s("Stock-in-hand"), dec2("-2000.00"), "0", s("")),
        Seq(s("L007"), s("Rent"), s("Indirect Expenses"), dec2("0.00"), "1", s("")))),
    ("mst_vouchertype",
      Seq("name" -> "VARCHAR", "parent" -> "VARCHAR",
        "numbering_method" -> "VARCHAR", "affects_stock" -> "INT"),
      Seq(
        Seq(s("Sales"), s("Sales"), s("Automatic"), "0"),
        Seq(s("Purchase"), s("Purchase"), s("Manual"), "0"),
        Seq(s("Receipt"), s("Receipt"), s("Manual"), "0"),
        Seq(s("Payment"), s("Payment"), s("Manual"), "0"),
        Seq(s("Contra"), s("Contra"), s("Manual"), "0"),
        Seq(s("Receipt Note"), s("Receipt Note"), s("Manual"), "1"),
        Seq(s("Delivery Note"), s("Delivery Note"), s("Manual"), "1"),
        Seq(s("Sales Order"), s("Sales Order"), s("Manual"), "0"))),
    ("mst_stock_item",
      Seq("name" -> "VARCHAR", "parent" -> "VARCHAR", "uom" -> "VARCHAR",
        "opening_balance" -> "DECIMAL(15,4)",
        "opening_value" -> "DECIMAL(17,2)"),
      Seq(
        Seq(s("Widget"), s("Components"), s("Nos"), dec4("10.0000"), dec2("-100.00")),
        Seq(s("Gadget"), s("Components"), s("Nos"), dec4("0.0000"), dec2("0.00")),
        Seq(s("Gizmo"), s("Finished"), s("Nos"), dec4("5.0000"), dec2("-50.00")))),
    ("mst_opening_batch_allocation",
      Seq("item" -> "VARCHAR", "opening_balance" -> "DECIMAL(15,4)",
        "opening_value" -> "DECIMAL(17,2)", "godown" -> "VARCHAR"),
      Seq(
        Seq(s("Widget"), dec4("10.0000"), dec2("-100.00"), s("Main")),
        Seq(s("Gizmo"), dec4("5.0000"), dec2("-50.00"), s("Main")))),
    ("trn_closingstock_ledger",
      Seq("ledger" -> "VARCHAR", "stock_date" -> "DATE",
        "stock_value" -> "DECIMAL(17,2)"),
      Seq(
        Seq(s("Stock Ledger"), dt("2020-12-31"), dec2("1800.00")),
        Seq(s("Stock Ledger"), dt("2021-03-31"), dec2("2500.00")))),
    ("trn_voucher",
      Seq("guid" -> "VARCHAR", "date" -> "DATE", "voucher_type" -> "VARCHAR",
        "voucher_number" -> "VARCHAR", "party_name" -> "VARCHAR",
        "narration" -> "VARCHAR", "is_invoice" -> "INT",
        "is_accounting_voucher" -> "INT", "is_inventory_voucher" -> "INT",
        "is_order_voucher" -> "INT"),
      Seq(
        Seq(s("v001"), dt("2020-04-05"), s("Sales"), s("SL-1"), s("Acme Corp"), s("April sale"), "1", "1", "0", "0"),
        Seq(s("v002"), dt("2020-04-08"), s("Receipt"), s("RC-1"), s("Acme Corp"), s("collection"), "0", "1", "0", "0"),
        Seq(s("v003"), dt("2020-05-10"), s("Purchase"), s("PU-1"), s("Beta Traders"), s("stock buy"), "1", "1", "0", "0"),
        Seq(s("v004"), dt("2020-05-12"), s("Payment"), s("PY-1"), s("Beta Traders"), s("supplier pay"), "0", "1", "0", "0"),
        Seq(s("v005"), dt("2020-06-01"), s("Contra"), s("CT-1"), s(""), s("cash shuffle"), "0", "1", "0", "0"),
        Seq(s("v006"), dt("2020-04-20"), s("Delivery Note"), s("DN-1"), s("Acme Corp"), s("goods out"), "0", "0", "1", "0"),
        Seq(s("v007"), dt("2020-04-25"), s("Sales"), s("SL-2"), s("Acme Corp"), s("invoice for DN-1"), "1", "1", "0", "0"),
        Seq(s("v008"), dt("2020-07-01"), s("Receipt Note"), s("RN-1"), s("Beta Traders"), s("goods in, no invoice yet"), "0", "0", "1", "0"),
        Seq(s("v009"), dt("2020-08-01"), s("Sales Order"), s("SO-1"), s("Acme Corp"), s("order only"), "0", "0", "0", "1"),
        Seq(s("v010"), dt("2021-01-15"), s("Sales"), s("SL-3"), s("Acme Corp"), s("direct sale"), "1", "1", "0", "0"))),
    // forex columns (P10, reference tally-export-config.yaml:466-470):
    // amount_forex carries the foreign-currency value with the SAME
    // debit-negative sign resolution as amount; currency is the
    // symbol. Base-currency rows: forex 0, currency ₹ (the $$Currency
    // of a base amount). v001 is a USD invoice; v003 a EUR purchase.
    ("trn_accounting",
      Seq("guid" -> "VARCHAR", "ledger" -> "VARCHAR",
        "amount" -> "DECIMAL(17,2)", "amount_forex" -> "DECIMAL(17,2)",
        "currency" -> "VARCHAR"),
      Seq(
        Seq(s("v001"), s("Acme Corp"), dec2("-1000.00"), dec2("-12.50"), s("$")),
        Seq(s("v001"), s("Sales Local"), dec2("1000.00"), dec2("12.50"), s("$")),
        Seq(s("v002"), s("Cash"), dec2("-600.00"), dec2("0.00"), s("₹")),
        Seq(s("v002"), s("Acme Corp"), dec2("600.00"), dec2("0.00"), s("₹")),
        Seq(s("v003"), s("Purchase Local"), dec2("-400.00"), dec2("-4.40"), s("€")),
        Seq(s("v003"), s("Beta Traders"), dec2("400.00"), dec2("4.40"), s("€")),
        Seq(s("v004"), s("Beta Traders"), dec2("-250.00"), dec2("0.00"), s("₹")),
        Seq(s("v004"), s("Cash"), dec2("250.00"), dec2("0.00"), s("₹")),
        Seq(s("v005"), s("Cash"), dec2("-100.00"), dec2("0.00"), s("₹")),
        Seq(s("v005"), s("Cash"), dec2("100.00"), dec2("0.00"), s("₹")),
        Seq(s("v007"), s("Acme Corp"), dec2("-500.00"), dec2("0.00"), s("₹")),
        Seq(s("v007"), s("Sales Local"), dec2("500.00"), dec2("0.00"), s("₹")),
        Seq(s("v009"), s("Acme Corp"), dec2("-999.00"), dec2("0.00"), s("₹")),
        Seq(s("v009"), s("Sales Local"), dec2("999.00"), dec2("0.00"), s("₹")),
        Seq(s("v010"), s("Acme Corp"), dec2("-300.00"), dec2("0.00"), s("₹")),
        Seq(s("v010"), s("Sales Local"), dec2("300.00"), dec2("0.00"), s("₹")))),
    ("trn_inventory",
      Seq("guid" -> "VARCHAR", "item" -> "VARCHAR",
        "quantity" -> "DECIMAL(15,4)", "rate" -> "DECIMAL(15,4)",
        "amount" -> "DECIMAL(17,2)", "godown" -> "VARCHAR",
        "tracking_number" -> "VARCHAR"),
      Seq(
        Seq(s("v006"), s("Widget"), dec4("-3.0000"), dec4("100.0000"), dec2("300.00"), s("Main"), s("T1")),
        Seq(s("v007"), s("Widget"), dec4("-3.0000"), dec4("100.0000"), dec2("300.00"), s("Main"), s("T1")),
        Seq(s("v008"), s("Gadget"), dec4("7.0000"), dec4("50.0000"), dec2("-350.00"), s("Main"), s("T2")),
        Seq(s("v009"), s("Widget"), dec4("-9.0000"), dec4("100.0000"), dec2("900.00"), s("Main"), s("")),
        Seq(s("v010"), s("Widget"), dec4("-2.0000"), dec4("110.0000"), dec2("220.00"), s("Main"), s("")))))

  private def dec2(v: String) = s"CAST($v AS DECIMAL(17,2))"
  private def dec4(v: String) = s"CAST($v AS DECIMAL(15,4))"
  private def dt(v: String) = s"DATE '$v'"

  private def valuesSql(t: Tbl): String = {
    val (_, cols, rows) = t
    val body = rows.map(_.mkString("(", ", ", ")")).mkString(",\n    ")
    s"(VALUES\n    $body) AS t(${cols.map(_._1).mkString(", ")})"
  }

  // ---- bulk corpus (round-11 verdict #4) --------------------------
  //
  // The handcrafted rows above pin every EDGE CASE (contra legs,
  // order-voucher exclusion, tracking pairs) but give the report
  // oracle little discriminating power for join/agg mistakes — 1–18
  // row results pass too easily. The bulk corpus unions a GENERATIVE
  // LAW on top: ~10k vouchers / 20k accounting legs / 40 party
  // ledgers / a 5-level group chain, written as arithmetic over a
  // row index so BOTH engines derive identical data from a few-line
  // definition (the SynthWav pattern applied to ledgers — no
  // megabyte VALUES strings). Spark renders it over spark.range,
  // DuckDB over range(); every literal is an integral decimal or a
  // quarter (exact in both engines' DECIMAL parsing).
  //
  // Law (voucher i of BulkVouchers):
  //   date   = 2020-04-01 + (i·31 mod 365) days  (31 ⊥ 365 → full FY)
  //   type   = [Sales, Purchase, Receipt, Payment][i mod 4]
  //   party  = 'Party ' || (i mod BulkParties)
  //   amount = 100 + (i·37 mod 900) + [.00 .25 .50 .75][i mod 4]
  //   legs   = Sales: (party −, Sales Local +); Purchase:
  //            (Purchase Local −, party +); Receipt: (Cash −,
  //            party +); Payment: (party −, Cash +)
  // Party j: parent alternates Sundry Debtors/Creditors, opening
  // (j·13 mod 500) − 250.
  //
  // Bulk is OPT-IN (`load(spark, bulk = true)`): the ScalaTest suite
  // pins the handcrafted semantics on the small corpus; the oracle
  // queries (q32–q46) run with bulk so every report is hash-checked
  // at ~20k-row size on both engines.

  val BulkVouchers = 10000
  val BulkParties = 40

  /** Deep generative group FOREST for the tree traversals (round-12
    * verdict #7 — the old bulk law scaled vouchers but left the tree
    * at 5 trivial levels): [[BulkGroupChains]] parallel chains of
    * ⌈BulkGroups / BulkGroupChains⌉ levels each hang off
    * 'Staff Advances' — itself at depth 3 under
    * 'Loans & Advances (Asset)' — so the R13 closure loop runs to
    * depth ~10 over hundreds of nodes before its frontier empties
    * (reference semantics: group-tree-parent-child.sql:4-9, capped at
    * `maxrecursion 500`). Node g sits on chain g mod chains at level
    * g div chains; parent = g − chains (level 0 → Staff Advances). */
  val BulkGroups = 280
  val BulkGroupChains = 40 // => 7 BG levels, closure depth 9

  private def bulkGroupCols(i: String): Seq[String] = Seq(
    s"'BG ' || CAST($i AS STRING) AS name",
    s"CASE WHEN $i < $BulkGroupChains THEN 'Staff Advances' " +
      s"ELSE 'BG ' || CAST($i - $BulkGroupChains AS STRING) END AS parent",
    "'Loans & Advances (Asset)' AS primary_group",
    "CAST(0 AS INT) AS is_revenue",
    "CAST(1 AS INT) AS is_deemedpositive",
    "CAST(0 AS INT) AS affects_gross_profit")

  /** 5-level chain for the tree traversals: Loans & Advances (Asset)
    * → Advances → Staff Advances → Field Advances → Temp Advances. */
  private val bulkGroupTbl: Tbl = ("mst_group_bulk",
    tables.head._2,
    Seq(
      Seq(s("Field Advances"), s("Staff Advances"),
        s("Loans & Advances (Asset)"), "0", "1", "0"),
      Seq(s("Temp Advances"), s("Field Advances"),
        s("Loans & Advances (Asset)"), "0", "1", "0")))

  private val amountLaw =
    "CAST(100 + (i * 37) % 900 AS DECIMAL(17,2)) + " +
      "CAST(CASE CAST(i % 4 AS INT) WHEN 0 THEN '0.00' WHEN 1 THEN " +
      "'0.25' WHEN 2 THEN '0.50' ELSE '0.75' END AS DECIMAL(17,2))"

  private val partyLaw = s"'Party ' || CAST(i % $BulkParties AS STRING)"

  private def bulkLedgerCols(i: String): Seq[String] = Seq(
    s"'GP' || CAST($i AS STRING) AS guid",
    s"'Party ' || CAST($i AS STRING) AS name",
    s"CASE WHEN $i % 2 = 0 THEN 'Sundry Debtors' ELSE 'Sundry Creditors' END AS parent",
    s"CAST(($i * 13) % 500 - 250 AS DECIMAL(17,2)) AS opening_balance",
    "CAST(0 AS INT) AS is_revenue",
    "'' AS gstn")

  private def bulkVoucherCols(i: String): Seq[String] = Seq(
    s"'g' || CAST($i AS STRING) AS guid",
    s"DATE '2020-04-01' + CAST(($i * 31) % 365 AS INT) AS date",
    s"CASE CAST($i % 4 AS INT) WHEN 0 THEN 'Sales' WHEN 1 THEN 'Purchase' WHEN 2 THEN 'Receipt' ELSE 'Payment' END AS voucher_type",
    s"'B-' || CAST($i AS STRING) AS voucher_number",
    s"'Party ' || CAST($i % $BulkParties AS STRING) AS party_name",
    s"'bulk ' || CAST($i AS STRING) AS narration",
    s"CAST(CASE WHEN $i % 4 <= 1 THEN 1 ELSE 0 END AS INT) AS is_invoice",
    "CAST(1 AS INT) AS is_accounting_voucher",
    "CAST(0 AS INT) AS is_inventory_voucher",
    "CAST(0 AS INT) AS is_order_voucher")

  /** Accounting legs from the flattened (voucher i, leg) index. */
  private val bulkAccountingCols: Seq[String] = Seq(
    "'g' || CAST(i AS STRING) AS guid",
    s"""CASE CAST(i % 4 AS INT)
       | WHEN 0 THEN CASE WHEN leg = 0 THEN $partyLaw ELSE 'Sales Local' END
       | WHEN 1 THEN CASE WHEN leg = 0 THEN 'Purchase Local' ELSE $partyLaw END
       | WHEN 2 THEN CASE WHEN leg = 0 THEN 'Cash' ELSE $partyLaw END
       | ELSE CASE WHEN leg = 0 THEN $partyLaw ELSE 'Cash' END
       |END AS ledger""".stripMargin,
    s"CAST(CASE WHEN leg = 0 THEN -($amountLaw) ELSE ($amountLaw) END AS DECIMAL(17,2)) AS amount",
    "CAST('0.00' AS DECIMAL(17,2)) AS amount_forex",
    "'₹' AS currency")

  private def bulkDf(spark: SparkSession, name: String): DataFrame =
    name match {
      case "mst_group" =>
        spark.sql(s"SELECT * FROM ${valuesSql(bulkGroupTbl)}")
          .unionByName(spark.range(BulkGroups).selectExpr("id AS i")
            .selectExpr(bulkGroupCols("i"): _*))
      case "mst_ledger" =>
        spark.range(BulkParties).selectExpr("id AS i")
          .selectExpr(bulkLedgerCols("i"): _*)
      case "trn_voucher" =>
        spark.range(BulkVouchers).selectExpr("id AS i")
          .selectExpr(bulkVoucherCols("i"): _*)
      case "trn_accounting" =>
        spark.range(BulkVouchers * 2L)
          .selectExpr("id div 2 AS i", "CAST(id % 2 AS INT) AS leg")
          .selectExpr(bulkAccountingCols: _*)
      case _ => throw new IllegalArgumentException(s"no bulk for $name")
    }

  /** DuckDB rendering of the same bulk laws (range() instead of
    * spark.range; expressions shared verbatim via the *Cols/ *Law
    * strings — one law, two engines). */
  private def bulkSql(name: String): String = name match {
    case "mst_group" =>
      s"SELECT * FROM ${valuesSql(bulkGroupTbl)}\n  UNION ALL\n  " +
        s"SELECT ${bulkGroupCols("i").mkString(", ")} " +
        s"FROM range($BulkGroups) AS r(i)"
    case "mst_ledger" =>
      s"SELECT ${bulkLedgerCols("i").mkString(", ")} FROM range($BulkParties) AS r(i)"
    case "trn_voucher" =>
      s"SELECT ${bulkVoucherCols("i").mkString(", ")} FROM range($BulkVouchers) AS r(i)"
    case "trn_accounting" =>
      s"SELECT ${bulkAccountingCols.mkString(", ")} FROM " +
        s"(SELECT i0 // 2 AS i, CAST(i0 % 2 AS INT) AS leg " +
        s"FROM range(${BulkVouchers * 2L}) AS r(i0)) x"
    case _ => ""
  }

  private val bulkTables =
    Set("mst_group", "mst_ledger", "trn_voucher", "trn_accounting")

  /** DuckDB oracle prefix: every fixture table as a CTE — handcrafted
    * VALUES, plus the generated bulk corpus when `bulk`. */
  def cteSql(bulk: Boolean = false): String =
    tables.map { t =>
      val base = s"SELECT * FROM ${valuesSql(t)}"
      val body = if (bulk && bulkTables(t._1))
        s"$base\n  UNION ALL\n  ${bulkSql(t._1)}" else base
      s"${t._1} AS ($body)"
    }.mkString("WITH ", ",\n", "")

  def cteSql: String = cteSql(bulk = false)

  /** Spark DataFrame for one fixture table (identical literals, plus
    * the generated bulk corpus when `bulk`). */
  def df(spark: SparkSession, name: String, bulk: Boolean = false): DataFrame = {
    val t = tables.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(name))
    val base = spark.sql(s"SELECT * FROM ${valuesSql(t)}")
    if (bulk && bulkTables(name)) base.unionByName(bulkDf(spark, name))
    else base
  }

  /** The full bundle for [[TallyReports]]. */
  def load(spark: SparkSession, bulk: Boolean = false): TallyTables = TallyTables(
    mstGroup = df(spark, "mst_group", bulk),
    mstLedger = df(spark, "mst_ledger", bulk),
    mstVouchertype = df(spark, "mst_vouchertype"),
    mstStockItem = df(spark, "mst_stock_item"),
    mstOpeningBatchAllocation = df(spark, "mst_opening_batch_allocation"),
    trnClosingstockLedger = df(spark, "trn_closingstock_ledger"),
    trnVoucher = df(spark, "trn_voucher", bulk),
    trnAccounting = df(spark, "trn_accounting", bulk),
    trnInventory = df(spark, "trn_inventory"))
}
