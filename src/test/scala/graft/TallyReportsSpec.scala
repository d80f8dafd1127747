package graft

import graft.tally.{TallyFixtures, TallyReports}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-value tests for the 15-report surface over the fixture
  * corpus (hand-computed from the fixture vouchers; the DuckDB oracle
  * gate cross-checks the same numbers independently). */
class TallyReportsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val t = TallyFixtures.load(spark)
  private val FY = ("2020-04-01", "2021-03-31")

  private def d(v: Any): Double = v match {
    case b: java.math.BigDecimal => b.doubleValue()
    case x: java.lang.Number     => x.doubleValue()
  }

  test("trial balance: hand-computed Cash and Acme rows; vouchers balance") {
    val tb = TallyReports.trialBalance(t, FY._1, FY._2)
      .collect().map(r => r.getString(0) ->
        (d(r.get(1)), d(r.get(2)), d(r.get(3)), d(r.get(4)))).toMap
    // Cash: opening -1000; debit 600+100 (contra leg) = 700; credit 250+100
    assert(tb("Cash") == ((-1000.0, 700.0, 350.0, -1350.0)))
    // Acme: opening -500; debits 1000+500+300 (order voucher excluded)
    assert(tb("Acme Corp") == ((-500.0, 1800.0, 600.0, -1700.0)))
    // revenue ledger: opening forced 0, closing = credit - debit
    assert(tb("Sales Local") == ((0.0, 0.0, 1800.0, 1800.0)))
    // the accounting equation: every voucher balances → Σ(curr credit) = Σ(curr debit)
    val sums = TallyReports.trialBalance(t, FY._1, FY._2)
      .agg(sum(col("debit")), sum(col("credit"))).head()
    assert(d(sums.get(0)) == d(sums.get(1)))
  }

  test("profit & loss: natures, stock lines, latest closing snapshot") {
    val pl = TallyReports.profitLoss(t).collect()
      .map(r => r.getString(1) -> (r.getString(2), d(r.get(4)))).toMap
    assert(pl("Sales Local") == (("income", 1800.0)))
    assert(pl("Purchase Local") == (("expense", -400.0)))
    assert(pl("Opening Stock") == (("expense", -2000.0)))
    assert(pl("Closing Stock") == (("income", -2500.0))) // latest snapshot 2500
  }

  test("stock summary reconciles all three workflow styles") {
    val ss = TallyReports.stockSummary(t).collect()
      .map(r => r.getString(0) ->
        (d(r.get(3)), d(r.get(4)), d(r.get(5)), d(r.get(6)))).toMap
    // Widget: strict pair counts invoice leg (3), blank tracking counts (2)
    assert(ss("Widget") == ((10.0, 0.0, 5.0, 5.0)))
    // Gadget: unmatched GRN counts the note leg
    assert(ss("Gadget") == ((0.0, 7.0, 0.0, 7.0)))
    // Gizmo: untouched
    assert(ss("Gizmo") == ((5.0, 0.0, 0.0, 5.0)))
  }

  test("account ledger: contra-only voucher drops; sorted contra list") {
    val al = TallyReports.accountLedger(t, "Cash", FY._1, FY._2).collect()
    assert(al.length == 2) // v005 (both legs Cash) drops out
    val byNum = al.map(r => r.getString(1) -> r.getString(3)).toMap
    assert(byNum("RC-1") == "Acme Corp")
    assert(byNum("PY-1") == "Beta Traders")
  }

  test("daily cash movement: gap-filled with contra on both sides") {
    val dc = TallyReports.dailyCashMovement(t, FY._1, FY._2)
    assert(dc.count() == 365)
    val june1 = dc.filter(col("date") === "2020-06-01").head()
    assert(d(june1.get(1)) == 100.0 && d(june1.get(2)) == 100.0)
  }

  test("sales daily keeps order vouchers; purchase daily excludes them") {
    val sd = TallyReports.salesDaily(t, FY._1, FY._2)
    val aug1 = sd.filter(col("date") === "2020-08-01").head()
    assert(d(aug1.get(1)) == 999.0) // reference quirk preserved
    val pm = TallyReports.purchaseMonthly(t, FY._1, FY._2)
      .agg(sum(col("amount"))).head()
    assert(d(pm.get(0)) == 400.0) // sign flipped, order rows excluded
  }

  test("registers exclude the party leg and join its gstn") {
    val sr = TallyReports.salesRegister(t).collect()
    assert(sr.map(_.getString(5)).toSet == Set("Sales Local"))
    assert(sr.map(_.getString(4)).toSet == Set("GSTN001"))
    assert(sr.map(r => d(r.get(6))).sum == 1800.0)
    val pr = TallyReports.purchaseRegister(t).collect()
    assert(pr.length == 1 && d(pr.head.get(6)) == 400.0)
  }

  test("stock voucher view dedups tracked rows, keeps blank tracking") {
    val sv = TallyReports.stockVoucherView(t).collect()
    val nums = sv.map(_.getString(1)).toSeq
    assert(nums.count(_ == "DN-1") == 1) // first of the T1 pair
    assert(!nums.contains("SL-2"))       // repeat of T1 dropped
    assert(nums.contains("SL-3"))        // blank tracking passes
    assert(nums.count(_ == "") == 2)     // two opening rows
  }

  test("group trees walk both directions across 3 levels") {
    val down = TallyReports.groupTreeParentChild(t, "Loans & Advances (Asset)")
      .collect().map(_.getString(0)).toSet
    assert(down == Set("Loans & Advances (Asset)", "Advances", "Staff Advances"))
    val up = TallyReports.groupTreeChildrenParent(t, "Staff Advances")
      .collect().map(_.getString(0)).toSet
    assert(up == Set("Staff Advances", "Advances", "Loans & Advances (Asset)"))
  }

  test("accounting voucher view: opening rows + filtered txns") {
    val av = TallyReports.accountingVoucherView(t)
    val cats = av.select(col("voucher_category")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(cats.contains("Opening Balance"))
    assert(!cats.contains("Sales Order")) // order vouchers excluded
    // opening rows: ledgers with nonzero opening balance
    assert(av.filter(col("voucher_type") === "Opening Balance").count() == 4)
  }
}
