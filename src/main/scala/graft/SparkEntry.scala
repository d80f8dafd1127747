package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator family from SURVEY §2; the
  * matching `oracleSql` is the ANSI-SQL equivalent the driver runs in
  * DuckDB over the same parquet tables. Aggregated measures are cast to
  * DECIMAL before summing on BOTH sides so results are exact,
  * order-independent, and hash-identical (see Reports scaladoc).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reports.q03SalesRegister(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> (Reports.q01PricingSummary _),
    "q02_trial_balance"    -> (Reports.q02TrialBalance _),
    "q03_sales_register"   -> (Reports.q03SalesRegister _),
    "q04_cross_nation"     -> (Reports.q04CrossNation _),
    "q05_semi_join"        -> (Reports.q05SemiJoin _),
    "q06_anti_join"        -> (Reports.q06AntiJoin _),
    "q07_top1_per_group"   -> (Reports.q07TopOrderPerCustomer _),
    "q08_string_agg"       -> (Reports.q08StringAgg _),
    "q09_ledger_view"      -> (Reports.q09LedgerView _),
    "q10_daily_gapfill"    -> (Reports.q10DailyGapFill _),
    "q11_monthly"          -> (Reports.q11Monthly _),
    "q12_hierarchy_closure" -> (Reports.q12HierarchyClosure _),
    "q13_subtree_members"  -> (Reports.q13SubtreeMembers _),
    "q14_case_over_max"    -> (Reports.q14CaseOverMax _),
    "q15_first_wins_dedup" -> (Reports.q15FirstWins _),
    "q16_cdc_changelog"    -> (Reports.q16CdcChangeLog _),
    "q17_cdc_merge"        -> (Reports.q17CdcMerge _),
    "q18_events_hourly"    -> (Reports.q18EventsHourly _),
    "q19_events_json"      -> (Reports.q19EventsJson _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_disc_price,
        | CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS returned_value,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_trial_balance" ->
      """SELECT c.c_custkey,
        | CAST(CAST(c.c_acctbal AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS opening,
        | CAST(coalesce(s.fulfilled, CAST(0 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS fulfilled,
        | CAST(coalesce(s.open_amt, CAST(0 AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS open_amt,
        | coalesce(s.n_orders, 0) AS n_orders
        |FROM customer c LEFT JOIN (
        | SELECT o_custkey,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS fulfilled,
        |  sum(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS open_amt,
        |  count(*) AS n_orders
        | FROM orders GROUP BY 1) s ON s.o_custkey = c.c_custkey
        |ORDER BY 1""".stripMargin,
    "q03_sales_register" ->
      """SELECT l.l_orderkey, l.l_linenumber, CAST(o.o_orderdate AS DATE) AS order_date,
        | c.c_name, n.n_name, r.r_name,
        | CAST(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS net_amount
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
        |ORDER BY 1,2""".stripMargin,
    "q04_cross_nation" ->
      """SELECT n.n_name AS cust_nation,
        | CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS import_value,
        | count(*) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE s.s_nationkey <> c.c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS total
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |ORDER BY 1""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        | AND o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1995-07-01')
        |ORDER BY 1""".stripMargin,
    "q07_top1_per_group" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS top_total
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) t
        |WHERE rn = 1 ORDER BY 1""".stripMargin,
    "q08_string_agg" ->
      """SELECT l.l_orderkey,
        | array_to_string(list_sort(list_distinct(list(p.p_brand))), ',') AS brands,
        | count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_orderkey < 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_ledger_view" ->
      """SELECT custkey, entry_date, entry_type, amount FROM (
        | SELECT c_custkey AS custkey, DATE '1994-12-31' AS entry_date, 'OPENING' AS entry_type,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS amount
        | FROM customer WHERE c_custkey <= 100
        | UNION ALL
        | SELECT o_custkey, CAST(o_orderdate AS DATE), 'ORDER',
        |  CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6))
        | FROM orders WHERE o_custkey <= 100) u
        |ORDER BY 1,2,3,4""".stripMargin,
    "q10_daily_gapfill" ->
      """WITH cal AS (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
        | daily AS (SELECT CAST(o_orderdate AS DATE) AS od,
        |   sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev, count(*) AS n
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1)
        |SELECT d, CAST(coalesce(rev, 0) AS DECIMAL(38,6)) AS revenue, coalesce(n, 0) AS n_orders
        |FROM cal LEFT JOIN daily ON cal.d = daily.od ORDER BY 1""".stripMargin,
    "q11_monthly" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mth,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue,
        | count(*) AS n_orders
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_hierarchy_closure" ->
      """WITH RECURSIVE edges AS (
        |  SELECT r.r_name AS parent, n.n_name AS child FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |  UNION ALL
        |  SELECT n.n_name, c.c_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |), closure AS (
        |  SELECT parent AS ancestor, child AS descendant, 1 AS depth FROM edges
        |  UNION ALL
        |  SELECT cl.ancestor, e.child, cl.depth + 1 FROM closure cl JOIN edges e ON e.parent = cl.descendant
        |)
        |SELECT ancestor, descendant, CAST(depth AS INT) AS depth FROM closure ORDER BY 1,2,3""".stripMargin,
    "q13_subtree_members" ->
      """SELECT c.c_custkey, c.c_name,
        | CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue_1995,
        | count(*) AS n_orders
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE r.r_name = 'ASIA'
        | AND o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1,2 ORDER BY 1""".stripMargin,
    "q14_case_over_max" ->
      """SELECT n.n_name,
        | CASE WHEN max(CAST(c.c_acctbal AS DECIMAL(18,6))) > 9000 THEN 'high' ELSE 'low' END AS tier,
        | CAST(max(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS max_bal,
        | count(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_first_wins_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY 1,2""".stripMargin,
    "q16_cdc_changelog" ->
      """WITH target AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,6)) AS val FROM orders),
        | source AS (SELECT o_orderkey,
        |   CASE WHEN o_orderkey % 5 = 0 THEN CAST(o_totalprice + 10.0 AS DECIMAL(18,6))
        |        ELSE CAST(o_totalprice AS DECIMAL(18,6)) END AS val
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT 'D' AS op, t.o_orderkey FROM target t
        | WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |UNION ALL
        |SELECT 'U' AS op, t.o_orderkey FROM target t JOIN source s ON s.o_orderkey = t.o_orderkey
        | WHERE t.val <> s.val
        |ORDER BY 1,2""".stripMargin,
    "q17_cdc_merge" ->
      """WITH target AS (SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)) AS val
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-07-01'),
        | source AS (SELECT o_orderkey, lower(o_orderstatus) AS o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)) AS val
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01'),
        | merged AS (
        |  SELECT t.* FROM target t WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
        |  UNION ALL SELECT * FROM source)
        |SELECT o_orderstatus, count(*) AS n, CAST(sum(val) AS DECIMAL(38,6)) AS total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q19_events_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_k,
        | count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
