package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report-query library: every relational operator of the reference's
  * report surface (SURVEY §2.4 R1–R22) and its incremental-CDC algebra
  * (§2.3 L1–L12), re-expressed as idiomatic DataFrame programs over the
  * harness star schema.
  *
  * Reference queries these derive from (semantics, not code): the
  * `reports/mssql` SQL files in TheCoderFish/tally-database-loader — e.g.
  * trial-balance.sql (conditional debit/credit aggregation),
  * sales-register.sql (multi-way dim join), daily-cash-movement.sql
  * (calendar gap-fill), profit-loss.sql (window top-1 + CASE-over-MAX),
  * account-ledger.sql (semi-join + string_agg), group-tree-*.sql
  * (recursive hierarchy).
  *
  * Numeric discipline: every aggregated measure is cast to
  * DECIMAL(18,6) *before* aggregation so sums are exact and
  * order-independent (double sums would vary with partition merge
  * order and never hash-match a single-threaded oracle), and final
  * aggregates are emitted as `round(CAST(... AS DOUBLE), 6)` so the
  * output representation is engine-independent (DECIMAL render scale
  * is not). Every query ends with a total ORDER BY.
  *
  * Scale notes (100 TB design): dimension tables (region, nation,
  * supplier, customer, part) are broadcast — no shuffle of the fact
  * table for dim joins; fact-fact operations shuffle once on the join
  * key; aggregations are partial (map-side) by construction.
  */
object Reports {

  /** Exact pre-aggregation cast: double → DECIMAL(18,6). */
  private def dec(c: Column): Column = c.cast("decimal(18,6)")
  /** Engine-independent output representation: the exact DECIMAL result
    * rounded to a 6-dp DOUBLE at the very edge. DECIMAL stays internal
    * (sums remain exact / order-independent); the emitted column is a
    * double because different engines render the same DECIMAL value
    * differently (`1863.84` vs `1863.840000`) while a rounded double is
    * representation-stable.
    *
    * MAGNITUDE BOUND: the cast is only representation-stable while the
    * exact DECIMAL sum fits a double losslessly at 6 dp (|x| ≲ 9e9 —
    * 2^53/10^6). Beyond that the cast loses ulps and engines can round
    * near-tie values differently; for larger-magnitude measures compare
    * with a tolerance instead of a hash. */
  private def fin(c: Column): Column = round(c.cast("double"), 6)
  private val dec0: Column = lit(0).cast("decimal(18,6)")

  // ── R5/R6/R15/R16: hash aggregation + conditional aggregation ──────
  /** Pricing summary à la trial-balance.sql:6-21 — grouped sums with a
    * conditional debit/credit-style split on the return flag. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fin(sum(dec(col("l_quantity")))).as("sum_qty"),
        fin(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        fin(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
          .as("sum_disc_price"),
        fin(sum(when(col("l_returnflag") === "R",
          dec(col("l_extendedprice"))).otherwise(dec0))).as("returned_value"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ── R2/R5/R6/R16: left join + conditional agg + coalesce gap fill ──
  /** Trial-balance shape (trial-balance.sql:6-29): every customer kept
    * via left join; opening balance + per-status order totals with
    * zero gap-fill. */
  def q02TrialBalance(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val sums = o.groupBy(col("o_custkey")).agg(
      sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
        .otherwise(dec0)).as("fulfilled"),
      sum(when(col("o_orderstatus") =!= "F", dec(col("o_totalprice")))
        .otherwise(dec0)).as("open_amt"),
      count(lit(1)).as("n_orders"))
    c.join(sums, c("c_custkey") === sums("o_custkey"), "left")
      .select(
        col("c_custkey"),
        fin(dec(col("c_acctbal"))).as("opening"),
        fin(coalesce(col("fulfilled"), dec0)).as("fulfilled"),
        fin(coalesce(col("open_amt"), dec0)).as("open_amt"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  // ── R1/R18: multi-way inner equi-join (fact → 4 broadcast dims) ────
  /** Sales-register shape (sales-register.sql:11-17): line-grain fact
    * enriched through orders → customer → nation → region. The three
    * dimension joins are broadcast (no fact shuffle). */
  def q03SalesRegister(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1998-01-01"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        to_date(col("o_orderdate")).as("order_date"),
        col("c_name"), col("n_name"), col("r_name"),
        fin(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("net_amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // ── R3: theta-ish join (inequality predicate inside join pipeline) ─
  /** Register self/theta-join shape (sales-register.sql:14-16 joins a
    * second ledger alias with `<>`): cross-nation trade — supplier and
    * customer nations differ. */
  def q04CrossNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val sp = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sp), li("l_suppkey") === sp("s_suppkey"))
      .filter(sp("s_nationkey") =!= c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("cust_nation"))
      .agg(
        fin(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
          .as("import_value"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("cust_nation"))
  }

  // ── R4/R22: semi-join via IN (subquery) ────────────────────────────
  /** Account-ledger voucher selection shape (account-ledger.sql:20):
    * orders having at least one returned line. */
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"),
        fin(dec(col("o_totalprice"))).as("total"))
      .orderBy(col("o_orderkey"))
  }

  // ── L4: anti-join (delete detection) ───────────────────────────────
  /** CDC delete-detection shape (src/tally.mts:172 `NOT IN`):
    * customers with no order in 1995 H1. */
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") < lit("1995-07-01"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ── R8/R9: window row_number + top-1-per-group ─────────────────────
  /** Latest-closing-stock shape (profit-loss.sql:32-35): each
    * customer's single largest order, deterministic tie-break. */
  def q07TopOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        fin(dec(col("o_totalprice"))).as("top_total"))
      .orderBy(col("o_custkey"))
  }

  // ── R10: deterministic string aggregation ──────────────────────────
  /** Contra-ledger list shape (account-ledger.sql:17 string_agg):
    * sorted distinct part brands per order. */
  def q08StringAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .filter(col("l_orderkey") < 1000)
      .groupBy(col("l_orderkey"))
      .agg(array_join(array_sort(collect_set(col("p_brand"))), ",")
        .as("brands"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))
  }

  // ── R11/R20: UNION ALL with synthetic opening rows ─────────────────
  /** Accounting-voucher-view shape (accounting-voucher-view.sql:1-13 +
    * post-import opening-transaction.sql): synthetic opening row per
    * customer stitched onto the order stream. */
  def q09LedgerView(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_custkey") <= 100)
    val o = Tables.orders(s, dir).filter(col("o_custkey") <= 100)
    val opening = c.select(
      col("c_custkey").as("custkey"),
      to_date(lit("1994-12-31")).as("entry_date"),
      lit("OPENING").as("entry_type"),
      fin(dec(col("c_acctbal"))).as("amount"))
    val txns = o.select(
      col("o_custkey").as("custkey"),
      to_date(col("o_orderdate")).as("entry_date"),
      lit("ORDER").as("entry_type"),
      fin(dec(col("o_totalprice"))).as("amount"))
    opening.unionByName(txns)
      .orderBy(col("custkey"), col("entry_date"), col("entry_type"),
        col("amount"))
  }

  // ── R12/R2/R16: calendar generation + gap-filled time series ───────
  /** Daily-cash-movement shape (daily-cash-movement.sql:8-30): the
    * recursive date CTE becomes `sequence()` + explode; gaps filled
    * with zero via left join + coalesce. */
  def q10DailyGapFill(s: SparkSession, dir: String): DataFrame = {
    val cal = s.range(1).select(explode(sequence(
      to_date(lit("1995-01-01")), to_date(lit("1995-12-31")))).as("d"))
    val daily = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") < lit("1996-01-01"))
      .groupBy(to_date(col("o_orderdate")).as("od"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"),
        count(lit(1)).as("n"))
    cal.join(daily, cal("d") === daily("od"), "left")
      .select(col("d"),
        fin(coalesce(col("rev"), dec0)).as("revenue"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy(col("d"))
  }

  // ── R15/R5: date-part grouping (monthly roll-up) ───────────────────
  /** Sales-monthly shape (sales-monthly.sql:12-26). */
  def q11Monthly(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .agg(fin(sum(dec(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("yr"), col("mth"))
  }

  // ── R13: recursive hierarchy closure (iterative self-join) ─────────
  /** Group-tree shape (group-tree-parent-child.sql:4-9): transitive
    * closure of the region→nation→customer tree via [[Hierarchy]]. */
  def q12HierarchyClosure(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val c = Tables.customer(s, dir)
    val e1 = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("parent"), n("n_name").as("child"))
    val e2 = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("parent"), c("c_name").as("child"))
    Hierarchy.closure(e1.unionByName(e2), maxDepth = 16)
      .orderBy(col("ancestor"), col("descendant"), col("depth"))
  }

  // ── R14: group-subtree membership semi-join ────────────────────────
  /** `$$IsLedOfGrp` shape (tally-export-config.yaml:357): members of
    * the ASIA subtree (computed via closure, then semi-joined) with
    * their 1995 revenue. */
  def q13SubtreeMembers(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val c = Tables.customer(s, dir)
    val e1 = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(r("r_name").as("parent"), n("n_name").as("child"))
    val e2 = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("parent"), c("c_name").as("child"))
    val members = Hierarchy.closure(e1.unionByName(e2), maxDepth = 16)
      .filter(col("ancestor") === "ASIA")
      .select(col("descendant"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") < lit("1996-01-01"))
    c.join(broadcast(members), c("c_name") === members("descendant"),
        "left_semi")
      .join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(fin(sum(dec(col("o_totalprice")))).as("revenue_1995"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  // ── R7/R21: CASE over MAX (post-aggregation classification) ────────
  /** P&L nature-classification shape (profit-loss.sql:42-43). */
  def q14CaseOverMax(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        when(max(dec(col("c_acctbal"))) > lit(9000), lit("high"))
          .otherwise(lit("low")).as("tier"),
        fin(max(dec(col("c_acctbal")))).as("max_bal"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  // ── L12: first-wins dedup by key (deterministic) ───────────────────
  /** utility.mts:331-345 dedup-by-field, made deterministic: first
    * event per (user, type) by time. */
  def q15FirstWins(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  // ── L3/L4/L5: CDC change detection (diff snapshot algebra) ─────────
  /** Incremental-sync diff shape (src/tally.mts:144-187): a simulated
    * source snapshot (1/7 of keys deleted, keys ≡0 mod 5 updated)
    * diffed against the target — emits the D/U change log. */
  def q16CdcChangeLog(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.orders(s, dir)
      .select(col("o_orderkey"), dec(col("o_totalprice")).as("val"))
    val source = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, dec(col("o_totalprice") + 10.0))
          .otherwise(dec(col("o_totalprice"))).as("val"))
    Cdc.changeLog(target, source, "o_orderkey", "val")
      .orderBy(col("op"), col("o_orderkey"))
  }

  // ── L8/L11: incremental merge (upsert = delete ∪ changed + append) ─
  /** Incremental-sync merge shape (src/tally.mts:190-223): two
    * overlapping snapshots merged source-wins; aggregated validation
    * totals per status. */
  def q17CdcMerge(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val target = o.filter(col("o_orderdate") < lit("1999-07-01"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        dec(col("o_totalprice")).as("val"))
    val source = o.filter(col("o_orderdate") >= lit("1998-07-01"))
      .select(col("o_orderkey"),
        lower(col("o_orderstatus")).as("o_orderstatus"),
        dec(col("o_totalprice")).as("val"))
    Cdc.merge(target, source, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), fin(sum(col("val"))).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  // ── L9: cascade update (denormalized name refresh) ─────────────────
  /** Cascade update under the oracle (q119) — the last SQL-expressible
    * CDC primitive still gated only by scenario specs: the reference
    * refreshes denormalized master names on child rows after a master
    * change (src/tally.mts:228-245). Scenario from the harness star
    * schema, the q16/q17 recipe: every order carries a deterministic
    * STALE name; the master side drops every third customer, so the
    * cascade must refresh exactly the matched rows and
    * coalesce-preserve the stale value where the master is gone —
    * both branches of [[graft.operators.Cdc.cascadeUpdate]] exercised
    * row by row. The master is broadcast (a dim); the child is never
    * shuffled except by the gate's ORDER BY. */
  def q119CdcCascadeUpdate(s: SparkSession, dir: String): DataFrame = {
    val child = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        concat(lit("stale-"), col("o_custkey")).as("cust_name"))
    val master = Tables.customer(s, dir)
      .filter(col("c_custkey") % 3 =!= 0)
    graft.operators.Cdc.cascadeUpdate(child, master,
        "o_custkey", "c_custkey", "c_name", "cust_name")
      .select(col("o_orderkey"), col("cust_name"))
      .orderBy(col("o_orderkey"))
  }

  // ── L10: voucher renumbering ───────────────────────────────────────
  /** Voucher renumbering under the oracle (q120) — the LAST CDC
    * primitive gated only in sbt (round-13 verdict #3), promoted by
    * the q119 recipe: the harness star schema plays the voucher
    * store. Every order carries a deterministic stored number
    * "V-<key>"; the re-pull covers the AUTO-numbered type (keys
    * ≡ 0 mod 3) whose numbers all shifted by an insertion at the head
    * ("V-<key+1>"), so [[graft.operators.Cdc.renumber]] must
    * join-replace exactly the re-pulled rows and coalesce-keep the
    * manual-type rows it never saw — both branches row by row.
    * `changed` recomputes the MergeJob null-safe shift-detection
    * predicate on the renumbered output (the set a partition-capable
    * warehouse would rewrite); the oracle writes all three columns
    * down in closed form. The re-pull is broadcast (dim-sized — it
    * scales with one sync window); the voucher side never shuffles
    * except by the gate's ORDER BY. */
  def q120CdcVoucherRenumber(s: SparkSession, dir: String): DataFrame = {
    val stored = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        concat(lit("V-"), col("o_orderkey")).as("voucher_number"))
      .withColumn("__stored", col("voucher_number"))
    val repull = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        concat(lit("V-"), col("o_orderkey") + 1).as("voucher_number"))
    graft.operators.Cdc.renumber(stored, repull,
        "o_orderkey", "voucher_number")
      .select(col("o_orderkey"), col("voucher_number"),
        (!(col("voucher_number") <=> col("__stored")))
          .cast("int").as("changed"))
      .orderBy(col("o_orderkey"))
  }

  // ── R15 + streaming analog: hourly event roll-up ───────────────────
  /** Batch twin of the Structured-Streaming windowed aggregation in
    * [[graft.streaming.EventStream]]. */
  def q18EventsHourly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), fin(sum(dec(col("value")))).as("total"))
      .orderBy(col("hr"), col("event_type"))
  }

  // ── JSON extraction (props column) ─────────────────────────────────
  /** Typed extraction from a JSON attribute column — the kind of
    * semi-structured pull a training pipeline needs at the edge. */
  def q19EventsJson(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(fin(sum(dec(col("k")))).as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))
  }

  // ── Temporal as-of join ────────────────────────────────────────────
  /** Last view before each click, per user ([[AsOf.asOfJoin]]) —
    * ordered by the exact nanosecond column (`ts_ns`) so Spark's
    * micros-truncated timestamps can't disagree with the oracle's
    * nanosecond comparisons. */
  def q55AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_ns"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts_ns"), fin(col("value")).as("view_value"))
    AsOf.asOfJoin(clicks, views, "user_id", "ts_ns",
        Seq("view_id", "view_value"), tieBreakCols = Seq("view_id"))
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("view_value"))
      .orderBy(col("click_id"))
  }

  // ── Bucketed range join ────────────────────────────────────────────
  /** Clicks inside the hour after each error, per user
    * ([[RangeJoin.containmentJoin]], bucket = the interval length →
    * ≤2 bucket rows per interval) — aggregated per error event with
    * zero-match errors kept by a final left join, all on exact
    * nanoseconds. The oracle is the naive BETWEEN join. */
  def q56RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val e = Tables.events(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts_ns").as("start_ns"),
        (col("ts_ns") + lit(hourNs)).as("end_ns"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns"), dec(col("value")).as("v"))
    val matched = RangeJoin.containmentJoin(clicks, errors,
        "user_id", "ts_ns", "start_ns", "end_ns", bucketWidth = hourNs)
      .groupBy(col("error_id"))
      .agg(count(lit(1)).as("n_clicks"), sum(col("v")).as("cv"))
    errors.join(matched, Seq("error_id"), "left")
      .select(col("error_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        fin(coalesce(col("cv"), dec(lit(0)))).as("click_value"))
      .orderBy(col("error_id"))
  }

  // ── Batch sessionization ───────────────────────────────────────────
  /** Gap-based sessionization as pure windows (lag → session-start
    * flag → running sum = session id → per-session aggregate) — the
    * batch twin of [[graft.streaming.EventStream.sessionize]], and the
    * exact-oracle gate those semantics otherwise lack (the streaming
    * spec can only check plausibility). One shuffle on user_id; both
    * windows share the same partitioning so Catalyst plans a single
    * exchange. 30-minute gap in MICROsecond arithmetic on both sides:
    * DuckDB truncates the parquet nanos timestamps to micros on read,
    * so nanosecond gaps would disagree at exact-boundary edges and
    * raw-ns output columns can never hash-match. */
  def q60SessionsBatch(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs
          or lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        fin(sum(dec(col("value")))).as("total_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  // ── Distribution profiling ─────────────────────────────────────────
  /** Per-type value-distribution profile: moments + EXACT interpolated
    * percentiles — the corpus-profiling pass (length/quality/score
    * distributions) a curation pipeline runs before choosing filter
    * thresholds. `percentile` here is Spark's exact implementation;
    * at 100 TB swap `percentile_approx` (t-digest, bounded memory) —
    * exact is used because the oracle gate needs bit-stable numbers
    * (DuckDB's quantile_cont interpolates identically). */
  def q59ValueStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        fin(avg(dec(col("value")))).as("mean"),
        fin(expr("percentile(value, 0.5)")).as("p50"),
        fin(expr("percentile(value, 0.95)")).as("p95"),
        fin(expr("percentile(value, 0.99)")).as("p99"),
        fin(max(dec(col("value")))).as("vmax"))
      .orderBy(col("event_type"))
  }

  /** The 100 TB twin of [[q59ValueStats]]: `percentile_approx`
    * (Greenwald-Khanna sketch, bounded memory, mergeable partials — no
    * per-group full sort/spill the exact `percentile` needs). Same
    * shape/columns as q59 so it drops into the same downstream. Not
    * hash-gated (sketch values are engine-specific); ReportsSpec gates
    * it against the exact profile within the sketch's published rank
    * error of 1/accuracy: approx(q) must land between the exact values
    * at ranks q ± 1/accuracy. */
  def q59ValueStatsApprox(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        fin(avg(dec(col("value")))).as("mean"),
        fin(expr(s"percentile_approx(value, 0.5,  $accuracy)")).as("p50"),
        fin(expr(s"percentile_approx(value, 0.95, $accuracy)")).as("p95"),
        fin(expr(s"percentile_approx(value, 0.99, $accuracy)")).as("p99"),
        fin(max(dec(col("value")))).as("vmax"))
      .orderBy(col("event_type"))
  }

  /** Self-gating twin of [[q59ValueStatsApprox]] (q61): runs the GK
    * sketch, then verifies each approx value's exact RANK — emitting
    * `pXX_ok` = 1 iff #(values ≤ approx) ≥ n·(q − 1/accuracy) − 1 and
    * #(values < approx) ≤ n·(q + 1/accuracy) + 1 — the sketch's
    * published rank-error contract made SQL-expressible, exactly the
    * q83 pattern (raw sketch values are engine-specific and can never
    * hash-match an oracle; the tolerance flags can, so the DuckDB
    * oracle asserts constant-1 flags next to the exact n/mean/vmax).
    * The check is on RANKS, not an exact-percentile value window: the
    * sketch returns a data point, and at small n the interpolated
    * window at q ± 1/accuracy is narrower than the gap between
    * adjacent points — a zero-rank-error answer would fail a value
    * window (measured at sf0.001); the ±1-row slack covers the
    * boundary. Verification re-scans the group once against the
    * broadcast sketch row; a production profile runs
    * [[q59ValueStatsApprox]] alone. Deterministic — percentile_approx
    * is seedless. */
  def q61ValueStatsChecked(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"), col("value"))
    val eps = 1.0 / accuracy
    val qs = Seq(0.5 -> "50", 0.95 -> "95", 0.99 -> "99")
    val skAggs = Seq(
      fin(avg(dec(col("value")))).as("mean"),
      fin(max(dec(col("value")))).as("vmax")) ++
      qs.map { case (q, tag) =>
        expr(f"percentile_approx(value, $q%.6f, $accuracy)").as(s"a$tag") }
    val sk = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), skAggs: _*)
    val rankAggs = qs.flatMap { case (_, tag) => Seq(
      sum(when(col("value") <= col(s"a$tag"), 1L).otherwise(0L))
        .as(s"le$tag"),
      sum(when(col("value") < col(s"a$tag"), 1L).otherwise(0L))
        .as(s"lt$tag")) } ++
      Seq(max(col("n")).as("n"), max(col("mean")).as("mean"),
        max(col("vmax")).as("vmax"))
    val checked = e.join(broadcast(sk), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(rankAggs.head, rankAggs.tail: _*)
    val flags = qs.map { case (q, tag) =>
      (col(s"le$tag") >= col("n") * (q - eps) - 1.0 &&
        col(s"lt$tag") <= col("n") * (q + eps) + 1.0).cast("int")
        .as(s"p${tag}_ok")
    }
    checked
      .select(Seq(col("event_type"), col("n"), col("mean")) ++ flags :+
        col("vmax"): _*)
      .orderBy(col("event_type"))
  }

  // ── Salted skew join ───────────────────────────────────────────────
  /** Orders⋈lineitem through [[Skew.saltedJoin]] (salt 8, scattered by
    * the part key), aggregated per order status — row-identical to
    * the plain join, so the oracle is the UNSALTED SQL join: the gate
    * proves the skew mitigation is semantics-free. */
  def q54SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
      col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Skew.saltedJoin(li, ord, "l_orderkey", salt = 8,
        scatterCols = Seq("l_partkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        fin(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
          .as("revenue"))
      .orderBy(col("o_orderstatus"))
  }
}
