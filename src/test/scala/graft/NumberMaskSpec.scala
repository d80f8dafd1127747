package graft

import graft.functions.NumberMask
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[NumberMask.format]] to the reference algorithm
  * (`src/utility.mts:60-156`) on hand-traced cases: Indian grouping,
  * sign sections, prefix/suffix, fixed-zero padding, the TDL naming
  * masks, and the two documented quirks (empty-string zero strip,
  * dropped fraction carry). */
class NumberMaskSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fmt(value: Double, mask: String): String = {
    import spark.implicits._
    Seq(value).toDF("v")
      .select(NumberMask.format(col("v"), mask).as("s"))
      .head().getString(0)
  }

  test("Indian grouping #,##,##0.00") {
    assert(fmt(1234567.89, "#,##,##0.00") == "12,34,567.89")
    assert(fmt(10000000, "#,##,##0") == "100,00,000")
    assert(fmt(999, "#,##,##0") == "999")
    assert(fmt(1000, "#,##,##0") == "1,000")
  }

  test("western grouping and fixed zeros") {
    assert(fmt(1234.5, "#,##0.00") == "1,234.50")
    assert(fmt(5, "#,##0") == "5")
    assert(fmt(7, "00000") == "00007")
    assert(fmt(12345678, "#,##0") == "12345,678")
  }

  test("sign sections and prefix/suffix") {
    assert(fmt(-1234.5, "₹ #,##0.00;₹ -#,##0.00") == "₹ -1,234.50")
    assert(fmt(1234.5, "₹ #,##0.00;₹ -#,##0.00") == "₹ 1,234.50")
    assert(fmt(0.0, "#,##0.00;-#,##0.00;0.00") == "0.00")
    assert(fmt(42, "#,##0 units") == "42 units")
    // single-section masks drop the sign — the reference formats
    // Math.abs(value) and only sections reintroduce a sign
    assert(fmt(-3, "#,##0.00") == "3.00")
  }

  test("TDL naming masks (the reference's live call sites)") {
    assert(fmt(1, "MyPart00") == "MyPart01")
    assert(fmt(5, "MyLine00") == "MyLine05")
    assert(fmt(12, "Fld00") == "Fld12")
    assert(fmt(123, "Fld00") == "Fld123")
  }

  test("reference quirks: zero strip to empty, dropped fraction carry") {
    assert(fmt(0, "#") == "")
    assert(fmt(0, "#,##0") == "0")
    // numFraction.toFixed(2).substr(2): the rounded-up carry never
    // reaches the integer part
    assert(fmt(1.999, "0.00") == "1.00")
    assert(fmt(1.994, "0.00") == "1.99")
    // mask overflow joins extra digits into the leftmost group
    assert(fmt(1234567890d, "#,##,##0") == "12345,67,890")
  }
}
