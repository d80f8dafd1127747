package graft.tally

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract entries for the 15 reference reports: each runs the
  * DataFrame program in [[TallyReports]] over the shared fixture
  * corpus, and its oracle is a DuckDB-dialect port of the reference
  * SQL over IDENTICAL data — so the reference's own query surface is
  * hash-verified end to end. (The harness sfDir is unused: the Tally
  * schema is not part of the synthetic star schema.)
  *
  * All entries load the fixtures WITH the generated bulk corpus
  * (~10k vouchers, 20k accounting legs, 40 party ledgers, and a
  * 280-node depth-10 group forest — [[TallyFixtures]] bulk law): the
  * handcrafted rows
  * still pin every edge case, and the oracle now hash-checks each
  * report at a size where a join or sign mistake cannot slip
  * through a 1–18 row result (round-11 verdict #4). */
object TallyReportQueries {

  private val FY = ("2020-04-01", "2021-03-31")

  private def load(s: SparkSession): TallyTables =
    TallyFixtures.load(s, bulk = true)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_tally_trial_balance" -> ((s, _) =>
      TallyReports.trialBalance(load(s), FY._1, FY._2)),
    "q33_tally_account_ledger" -> ((s, _) =>
      TallyReports.accountLedger(load(s), "Cash", FY._1, FY._2)),
    "q34_tally_accounting_voucher_view" -> ((s, _) =>
      TallyReports.accountingVoucherView(load(s))),
    "q35_tally_daily_cash_movement" -> ((s, _) =>
      TallyReports.dailyCashMovement(load(s), FY._1, FY._2)),
    "q36_tally_group_tree_parent_child" -> ((s, _) =>
      TallyReports.groupTreeParentChild(load(s),
        "Loans & Advances (Asset)")),
    // ascend from the DEEPEST bulk-forest node so the upward closure
    // exercises depth ~10, not the 3 trivial handcrafted levels
    "q37_tally_group_tree_children_parent" -> ((s, _) =>
      TallyReports.groupTreeChildrenParent(load(s),
        s"BG ${TallyFixtures.BulkGroups - 1}")),
    // FULL transitive closure of the deep group forest (R13 at depth
    // AND volume): every (ancestor, descendant, depth) pair — ~1,690
    // rows to depth 9 — so the iterative fixpoint loop is gated by a
    // recursive SQL oracle over non-trivial structure, not a
    // single-root walk (q36/q37 gate the two reference traversals)
    "q114_tally_group_closure" -> ((s, _) =>
      graft.operators.Hierarchy.closure(
          load(s).mstGroup.select(
            org.apache.spark.sql.functions.col("parent"),
            org.apache.spark.sql.functions.col("name").as("child"))
          .filter(org.apache.spark.sql.functions.col("parent") =!= ""))
        .orderBy("ancestor", "descendant", "depth")),
    "q38_tally_profit_loss" -> ((s, _) =>
      TallyReports.profitLoss(load(s))),
    "q39_tally_sales_daily" -> ((s, _) =>
      TallyReports.salesDaily(load(s), FY._1, FY._2)),
    "q40_tally_sales_monthly" -> ((s, _) =>
      TallyReports.salesMonthly(load(s), FY._1, FY._2)),
    "q41_tally_purchase_daily" -> ((s, _) =>
      TallyReports.purchaseDaily(load(s), FY._1, FY._2)),
    "q42_tally_purchase_monthly" -> ((s, _) =>
      TallyReports.purchaseMonthly(load(s), FY._1, FY._2)),
    "q43_tally_sales_register" -> ((s, _) =>
      TallyReports.salesRegister(load(s))),
    "q44_tally_purchase_register" -> ((s, _) =>
      TallyReports.purchaseRegister(load(s))),
    "q45_tally_stock_summary" -> ((s, _) =>
      TallyReports.stockSummary(load(s))),
    "q46_tally_stock_voucher_view" -> ((s, _) =>
      TallyReports.stockVoucherView(load(s))),
    "q49_tally_forex_register" -> ((s, _) =>
      TallyReports.forexRegister(load(s))),
    "q50_tally_fk_register" -> ((s, _) => {
      val t = load(s)
      // the fixture extract carries no _ledger — the engine resolves
      // it (P15), then the report consumes it through guid = _ledger
      val enriched = graft.operators.SurrogateFk.enrich(
        t.trnAccounting, accountingFkSpec,
        { case "mst_ledger" => Some(t.mstLedger); case _ => None })
      TallyReports.fkRegister(t, enriched)
    }),
  )

  /** Reference-shaped spec for trn_accounting with the incremental
    * YAML's surrogate-FK field
    * (tally-export-config-incremental.yaml:298). */
  private val accountingFkSpec: graft.sources.TableSpec = {
    import graft.functions.TallyTypes._
    import graft.sources.{FieldSpec, TableSpec}
    TableSpec("trn_accounting", "Voucher.AllLedgerEntries", "Derived", Seq(
      FieldSpec("guid", "Guid", TText),
      FieldSpec("ledger", "LedgerName", TText),
      FieldSpec("amount", "Amount", TAmount),
      FieldSpec("_ledger", "$Guid:Ledger:$LedgerName", TCustom)))
  }

  private def fx(body: String): String =
    TallyFixtures.cteSql(bulk = true)
      .replaceFirst("^WITH ", "WITH RECURSIVE ") + ",\n" + body

  def oracleSql: Map[String, String] = Map(
    "q32_tally_trial_balance" -> fx(
      """eff AS (SELECT a.ledger, a.amount, v.date FROM trn_accounting a
        |  JOIN trn_voucher v ON v.guid = a.guid
        |  WHERE v.is_order_voucher = 0 AND v.is_inventory_voucher = 0),
        |op AS (SELECT ledger, sum(amount) AS amount FROM eff
        |  WHERE date < DATE '2020-04-01' GROUP BY 1),
        |curr AS (SELECT ledger,
        |  sum(CASE WHEN amount < 0 THEN abs(amount) ELSE CAST(0 AS DECIMAL(17,2)) END) AS debit,
        |  sum(CASE WHEN amount > 0 THEN amount ELSE CAST(0 AS DECIMAL(17,2)) END) AS credit
        | FROM eff WHERE date BETWEEN DATE '2020-04-01' AND DATE '2021-03-31' GROUP BY 1)
        |SELECT l.name,
        | round(CAST(CASE WHEN l.is_revenue = 0 THEN l.opening_balance + coalesce(op.amount, 0) ELSE 0 END AS DOUBLE), 6) AS opening,
        | round(CAST(coalesce(curr.debit, 0) AS DOUBLE), 6) AS debit,
        | round(CAST(coalesce(curr.credit, 0) AS DOUBLE), 6) AS credit,
        | round(CAST(CASE WHEN l.is_revenue = 0
        |   THEN l.opening_balance + coalesce(op.amount, 0) + coalesce(curr.credit, 0) - coalesce(curr.debit, 0)
        |   ELSE coalesce(curr.credit, 0) - coalesce(curr.debit, 0) END AS DOUBLE), 6) AS closing
        |FROM mst_ledger l
        | LEFT JOIN op ON op.ledger = l.name
        | LEFT JOIN curr ON curr.ledger = l.name
        |ORDER BY 1""".stripMargin),
    "q33_tally_account_ledger" -> fx(
      """led AS (SELECT v.guid, v.date, v.voucher_number, v.voucher_type, v.narration,
        |  CASE WHEN a.amount < 0 THEN -a.amount ELSE CAST(0 AS DECIMAL(17,2)) END AS debit,
        |  CASE WHEN a.amount > 0 THEN a.amount ELSE CAST(0 AS DECIMAL(17,2)) END AS credit
        | FROM trn_accounting a JOIN trn_voucher v ON v.guid = a.guid
        | WHERE a.ledger = 'Cash' AND v.is_accounting_voucher = 1
        |  AND v.date BETWEEN DATE '2020-04-01' AND DATE '2021-03-31'),
        |ent AS (SELECT v.guid, string_agg(a.ledger, ',' ORDER BY a.ledger) AS ledgers
        | FROM trn_voucher v JOIN trn_accounting a ON a.guid = v.guid AND a.ledger <> 'Cash'
        | WHERE v.guid IN (SELECT DISTINCT guid FROM led)
        |  AND v.is_order_voucher = 0 AND v.is_inventory_voucher = 0
        | GROUP BY 1)
        |SELECT l.date, l.voucher_number, l.voucher_type, e.ledgers,
        | round(CAST(l.debit AS DOUBLE), 6) AS debit,
        | round(CAST(l.credit AS DOUBLE), 6) AS credit, l.narration
        |FROM led l JOIN ent e ON e.guid = l.guid
        |ORDER BY l.date, l.voucher_number, debit""".stripMargin),
    "q34_tally_accounting_voucher_view" -> fx(
      """openrows AS (SELECT DATE '2000-01-01' AS date, 'Opening Balance' AS voucher_type,
        |  '' AS voucher_number, l.name AS ledger,
        |  round(CAST(l.opening_balance AS DOUBLE), 6) AS amount, '' AS party_name,
        |  g.primary_group, 'Opening Balance' AS voucher_category
        | FROM mst_ledger l JOIN mst_group g ON l.parent = g.name
        | WHERE l.opening_balance <> 0),
        |txn AS (SELECT CAST(v.date AS DATE) AS date, v.voucher_type, v.voucher_number,
        |  a.ledger, round(CAST(a.amount AS DOUBLE), 6) AS amount, v.party_name,
        |  g.primary_group, t.parent AS voucher_category
        | FROM trn_accounting a JOIN trn_voucher v ON a.guid = v.guid
        |  JOIN mst_vouchertype t ON v.voucher_type = t.name
        |  JOIN mst_ledger l ON a.ledger = l.name
        |  JOIN mst_group g ON l.parent = g.name
        | WHERE v.is_order_voucher = 0 AND v.is_inventory_voucher = 0)
        |SELECT * FROM (SELECT * FROM openrows UNION ALL SELECT * FROM txn) u
        |ORDER BY date, ledger, amount, voucher_number""".stripMargin),
    "q35_tally_daily_cash_movement" -> fx(
      """cal AS (SELECT CAST(unnest(generate_series(DATE '2020-04-01', DATE '2021-03-31', INTERVAL 1 DAY)) AS DATE) AS date),
        |mov AS (SELECT v.date AS mdate,
        |  sum(CASE WHEN a.amount < 0 THEN -a.amount ELSE CAST(0 AS DECIMAL(17,2)) END) AS receipt,
        |  sum(CASE WHEN a.amount > 0 THEN a.amount ELSE CAST(0 AS DECIMAL(17,2)) END) AS payment
        | FROM trn_accounting a JOIN trn_voucher v ON v.guid = a.guid
        |  JOIN mst_ledger l ON a.ledger = l.name
        |  JOIN mst_group g ON l.parent = g.name
        |  JOIN mst_vouchertype t ON v.voucher_type = t.name
        | WHERE lower(g.primary_group) = 'cash-in-hand'
        |  AND lower(t.parent) IN ('receipt', 'payment', 'contra')
        | GROUP BY 1)
        |SELECT cal.date, round(CAST(coalesce(receipt, 0) AS DOUBLE), 6) AS receipt,
        | round(CAST(coalesce(payment, 0) AS DOUBLE), 6) AS payment
        |FROM cal LEFT JOIN mov ON cal.date = mov.mdate ORDER BY 1""".stripMargin),
    "q36_tally_group_tree_parent_child" -> fx(
      """tree AS (SELECT name, parent FROM mst_group WHERE name = 'Loans & Advances (Asset)'
        | UNION ALL
        | SELECT e.name, e.parent FROM mst_group e JOIN tree ON tree.name = e.parent)
        |SELECT name, parent FROM tree ORDER BY 1""".stripMargin),
    "q37_tally_group_tree_children_parent" -> fx(
      s"""tree AS (SELECT name, parent FROM mst_group WHERE name = 'BG ${TallyFixtures.BulkGroups - 1}'
        | UNION ALL
        | SELECT e.name, e.parent FROM mst_group e JOIN tree ON tree.parent = e.name)
        |SELECT name, parent FROM tree ORDER BY 1""".stripMargin),
    "q114_tally_group_closure" -> fx(
      """clo AS (SELECT parent AS ancestor, name AS descendant, 1 AS depth
        |  FROM mst_group WHERE parent <> ''
        | UNION ALL
        | SELECT c.ancestor, e.name, c.depth + 1
        | FROM mst_group e JOIN clo c ON c.descendant = e.parent)
        |SELECT ancestor, descendant, CAST(depth AS INT) AS depth
        |FROM clo ORDER BY 1, 2, 3""".stripMargin),
    "q38_tally_profit_loss" -> fx(
      """gb AS (SELECT g.primary_group AS "group", l.name AS ledger,
        |  CASE WHEN max(g.is_deemedpositive) = 1 THEN 'expense' ELSE 'income' END AS nature,
        |  CASE WHEN max(g.affects_gross_profit) = 1 THEN 'Y' ELSE 'N' END AS affects_gross_profit,
        |  round(CAST(sum(a.amount) AS DOUBLE), 6) AS balance
        | FROM trn_accounting a JOIN trn_voucher v ON v.guid = a.guid
        |  JOIN mst_vouchertype t ON v.voucher_type = t.name
        |  JOIN mst_ledger l ON a.ledger = l.name
        |  JOIN mst_group g ON g.name = l.parent
        | WHERE g.is_revenue = 1 AND v.is_order_voucher = 0
        |  AND v.is_inventory_voucher = 0 AND t.affects_stock = 0
        | GROUP BY 1, 2),
        |os AS (SELECT 'Opening Stock' AS "group", 'Opening Stock' AS ledger,
        |  'expense' AS nature, 'Y' AS affects_gross_profit,
        |  round(CAST(sum(l.opening_balance) AS DOUBLE), 6) AS balance
        | FROM mst_ledger l JOIN mst_group g ON g.name = l.parent
        | WHERE g.primary_group = 'Stock-in-hand'),
        |cs AS (SELECT 'Closing Stock' AS "group", 'Closing Stock' AS ledger,
        |  'income' AS nature, 'Y' AS affects_gross_profit,
        |  round(CAST(-sum(stock_value) AS DOUBLE), 6) AS balance
        | FROM (SELECT stock_value,
        |   row_number() OVER (PARTITION BY ledger ORDER BY stock_date DESC) AS ctr
        |  FROM trn_closingstock_ledger) t WHERE ctr = 1)
        |SELECT * FROM (SELECT * FROM gb UNION ALL SELECT * FROM os UNION ALL SELECT * FROM cs) u
        |ORDER BY "group", ledger""".stripMargin),
    "q39_tally_sales_daily" -> dailySql("Sales Accounts",
      negate = false, excludeNonAccounting = false),
    "q40_tally_sales_monthly" -> monthlySql("Sales Accounts",
      negate = false, excludeNonAccounting = false),
    "q41_tally_purchase_daily" -> dailySql("Purchase Accounts",
      negate = true, excludeNonAccounting = true),
    "q42_tally_purchase_monthly" -> monthlySql("Purchase Accounts",
      negate = true, excludeNonAccounting = true),
    "q43_tally_sales_register" -> registerSql("Sales", negate = false),
    "q44_tally_purchase_register" -> registerSql("Purchase", negate = true),
    "q45_tally_stock_summary" -> fx(
      """inv AS (SELECT i.*, v.is_order_voucher, t.parent AS vtparent
        | FROM trn_inventory i JOIN trn_voucher v ON i.guid = v.guid
        |  JOIN mst_vouchertype t ON v.voucher_type = t.name),
        |reco AS (SELECT item AS ritem, tracking_number AS rtrack,
        |  sum(CASE WHEN vtparent IN ('Receipt Note', 'Delivery Note') THEN abs(quantity) ELSE CAST(0 AS DECIMAL(15,4)) END) AS note,
        |  sum(CASE WHEN vtparent NOT IN ('Receipt Note', 'Delivery Note') THEN abs(quantity) ELSE CAST(0 AS DECIMAL(15,4)) END) AS invoice
        | FROM inv WHERE tracking_number IS NOT NULL AND tracking_number <> ''
        | GROUP BY 1, 2),
        |eff AS (SELECT item AS eitem,
        |  sum(CASE WHEN quantity > 0 THEN quantity ELSE CAST(0 AS DECIMAL(15,4)) END) AS in_qty,
        |  sum(CASE WHEN quantity < 0 THEN -quantity ELSE CAST(0 AS DECIMAL(15,4)) END) AS out_qty
        | FROM inv LEFT JOIN reco ON inv.item = reco.ritem AND inv.tracking_number = reco.rtrack
        | WHERE is_order_voucher = 0 AND (tracking_number IS NULL OR tracking_number = ''
        |  OR (vtparent NOT IN ('Receipt Note', 'Delivery Note') AND note = invoice)
        |  OR (vtparent IN ('Receipt Note', 'Delivery Note') AND note > invoice))
        | GROUP BY 1)
        |SELECT s.name, s.parent, s.uom,
        | round(CAST(s.opening_balance AS DOUBLE), 6) AS op_qty,
        | round(CAST(coalesce(in_qty, 0) AS DOUBLE), 6) AS in_qty,
        | round(CAST(coalesce(out_qty, 0) AS DOUBLE), 6) AS out_qty,
        | round(CAST(s.opening_balance + coalesce(in_qty, 0) - coalesce(out_qty, 0) AS DOUBLE), 6) AS clo_bal
        |FROM mst_stock_item s LEFT JOIN eff ON s.name = eff.eitem
        |ORDER BY 1""".stripMargin),
    "q46_tally_stock_voucher_view" -> fx(
      """op AS (SELECT DATE '2000-01-01' AS date, '' AS voucher_number,
        |  'Opening Balance' AS voucher_type, item,
        |  round(CAST(opening_balance AS DOUBLE), 6) AS quantity,
        |  round(CAST(opening_value AS DOUBLE), 6) AS amount, godown
        | FROM mst_opening_batch_allocation),
        |txn AS (SELECT date, voucher_number, voucher_type, item,
        |  round(CAST(quantity AS DOUBLE), 6) AS quantity,
        |  round(CAST(amount AS DOUBLE), 6) AS amount, godown
        | FROM (SELECT CAST(v.date AS DATE) AS date, v.voucher_number,
        |   v.voucher_type, i.item, i.quantity, i.amount, i.godown,
        |   CASE WHEN i.tracking_number IS NULL OR i.tracking_number = '' THEN 1
        |    ELSE row_number() OVER (PARTITION BY i.tracking_number, i.item ORDER BY v.date, v.guid) END AS repetition
        |  FROM trn_inventory i JOIN trn_voucher v ON v.guid = i.guid
        |  WHERE v.is_order_voucher = 0) t WHERE repetition = 1)
        |SELECT * FROM (SELECT * FROM op UNION ALL SELECT * FROM txn) u
        |ORDER BY date, item, voucher_number""".stripMargin),
    "q49_tally_forex_register" -> fx(
      """forex AS (SELECT CAST(v.date AS DATE) AS date, v.voucher_number,
        |  v.voucher_type, a.ledger,
        |  round(CAST(a.amount AS DOUBLE), 6) AS amount,
        |  round(CAST(a.amount_forex AS DOUBLE), 6) AS amount_forex,
        |  a.currency,
        |  round(CAST(a.amount AS DOUBLE) / CAST(a.amount_forex AS DOUBLE), 6) AS exchange_rate
        | FROM trn_accounting a JOIN trn_voucher v ON a.guid = v.guid
        | WHERE a.amount_forex <> 0)
        |SELECT * FROM forex ORDER BY date, voucher_number, ledger""".stripMargin),
    "q50_tally_fk_register" -> fx(
      """fkacc AS (SELECT a.guid, a.ledger, a.amount,
        |  coalesce(l.guid, '') AS _ledger
        | FROM trn_accounting a LEFT JOIN mst_ledger l ON l.name = a.ledger)
        |SELECT z.parent AS ledger_group,
        | round(CAST(sum(CASE WHEN a.amount < 0 THEN -a.amount ELSE CAST(0 AS DECIMAL(17,2)) END) AS DOUBLE), 6) AS debit,
        | round(CAST(sum(CASE WHEN a.amount > 0 THEN a.amount ELSE CAST(0 AS DECIMAL(17,2)) END) AS DOUBLE), 6) AS credit,
        | count(*) AS n_lines
        |FROM fkacc a JOIN trn_voucher v ON v.guid = a.guid
        | JOIN mst_ledger z ON a._ledger = z.guid
        |WHERE v.is_order_voucher = 0 AND v.is_inventory_voucher = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin),
  )

  private def dailyBodySql(group: String, negate: Boolean,
      excludeNonAccounting: Boolean): String = {
    val extra = if (excludeNonAccounting)
      " AND v.is_order_voucher = 0 AND v.is_inventory_voucher = 0" else ""
    val amt = if (negate) "-d.amount" else "d.amount"
    s"""cal AS (SELECT CAST(unnest(generate_series(DATE '2020-04-01', DATE '2021-03-31', INTERVAL 1 DAY)) AS DATE) AS date),
       |d AS (SELECT v.date AS mdate, sum(a.amount) AS amount
       | FROM trn_accounting a JOIN trn_voucher v ON v.guid = a.guid
       |  JOIN mst_ledger l ON a.ledger = l.name
       |  JOIN mst_group g ON l.parent = g.name
       | WHERE g.primary_group = '$group'
       |  AND v.date >= DATE '2020-04-01' AND v.date <= DATE '2021-03-31'$extra
       | GROUP BY 1),
       |series AS (SELECT cal.date, round(CAST(coalesce($amt, 0) AS DOUBLE), 6) AS amount
       | FROM cal LEFT JOIN d ON cal.date = d.mdate)""".stripMargin
  }

  private def dailySql(group: String, negate: Boolean,
      excludeNonAccounting: Boolean): String =
    fx(dailyBodySql(group, negate, excludeNonAccounting) +
      "\nSELECT date, amount FROM series ORDER BY 1")

  private def monthlySql(group: String, negate: Boolean,
      excludeNonAccounting: Boolean): String =
    fx(dailyBodySql(group, negate, excludeNonAccounting) +
      """
        |SELECT CAST(year(date) AS INT) AS year, CAST(month(date) AS INT) AS month,
        | round(CAST(sum(CAST(amount AS DECIMAL(18,6))) AS DOUBLE), 6) AS amount
        |FROM series GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  private def registerSql(parent: String, negate: Boolean): String = {
    val amt = if (negate) "-a.amount" else "a.amount"
    fx(s"""reg AS (SELECT CAST(v.date AS DATE) AS date, v.voucher_number,
          |  v.voucher_type, v.party_name, z.gstn, a.ledger,
          |  round(CAST($amt AS DOUBLE), 6) AS amount
          | FROM trn_accounting a JOIN trn_voucher v ON v.guid = a.guid
          |  JOIN mst_vouchertype t ON v.voucher_type = t.name
          |  JOIN mst_ledger l ON a.ledger = l.name
          |  JOIN mst_ledger z ON v.party_name = z.name
          | WHERE t.parent = '$parent' AND a.ledger <> v.party_name)
          |SELECT * FROM reg
          |ORDER BY date, voucher_number, ledger, amount""".stripMargin)
  }
}
