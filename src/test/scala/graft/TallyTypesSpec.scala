package graft

import graft.functions.TallyTypes
import graft.functions.TallyTypes._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TallyTypesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).head()

  test("amount sign convention: debit negative, credit positive") {
    for (v <- Seq(0L, 1L, 123L, 999999L, 500L)) {
      val deb = one(amountSigned(lit(v), lit(true))).getDecimal(0)
      val cred = one(amountSigned(lit(v), lit(false))).getDecimal(0)
      assert(deb.signum() <= 0 && cred.signum() >= 0)
      assert(deb.abs() == cred.abs())
    }
  }

  test("quantity sign convention: inward positive, outward negative") {
    val in = one(quantitySigned(lit(5.5), lit(true))).getDecimal(0)
    val out = one(quantitySigned(lit(5.5), lit(false))).getDecimal(0)
    assert(in.doubleValue() == 5.5 && out.doubleValue() == -5.5)
  }

  test("(-) textual fixup") {
    val r = one(fixNegative(lit("(-)123.45"))).getString(0)
    assert(r == "-123.45")
  }

  test("date parse: sentinel and empty → null, else yyyy-MM-dd") {
    val df = Seq("2024-03-31", NullDateSentinel, "").toDF("raw")
      .select(parseValue($"raw", TDate).as("d"))
    val vals = df.collect().map(r => Option(r.getDate(0)))
    assert(vals(0).contains(java.sql.Date.valueOf("2024-03-31")))
    assert(vals(1).isEmpty && vals(2).isEmpty)
  }

  test("date emit round-trips the sentinel") {
    val df = Seq("2024-03-31", NullDateSentinel).toDF("raw")
      .select(parseValue($"raw", TDate).as("d"))
      .select(emitValue($"d", TDate).as("s"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("2024-03-31", NullDateSentinel))
  }

  test("number/rate: empty → 0; rate strips unit suffix") {
    assert(one(parseValue(lit(""), TNumber)).getDecimal(0).doubleValue() == 0.0)
    assert(one(parseValue(lit("42"), TNumber)).getDecimal(0)
      .doubleValue() == 42.0)
    // number is decimal-capable (tax_rate-style values)
    assert(one(parseValue(lit("18.5"), TNumber)).getDecimal(0)
      .doubleValue() == 18.5)
    assert(one(parseValue(lit(""), TRate)).getDecimal(0).doubleValue() == 0.0)
    assert(one(parseValue(lit("12.50/Nos"), TRate)).getDecimal(0)
      .doubleValue() == 12.5)
  }

  test("logical parses 1/0") {
    assert(one(parseValue(lit("1"), TLogical)).getBoolean(0))
    assert(!one(parseValue(lit("0"), TLogical)).getBoolean(0))
  }

  test("tallyRound reproduces the reference's >0.5 quirk") {
    // fraction must EXCEED .5: 2.5 → 2 (not 3); 2.51 → 3; -2.7 → -2
    val r = Seq(2.5, 2.51, 2.4999, -2.7, -2.5).toDF("v")
      .select(tallyRound($"v", 0).as("r")).collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(2.0, 3.0, 2.0, -2.0, -2.0))
  }

  test("decimal precisions match the reference DDL") {
    assert(TAmount.sparkType.toString.contains("17,2"))
    assert(TQuantity.sparkType.toString.contains("15,4"))
    assert(TRate.sparkType.toString.contains("15,4"))
  }

  test("fullList flattens child collections; indexedChild picks First/Last") {
    import spark.implicits._
    val df = Seq(Seq("12 Main St", "Floor 2", "Metro City")).toDF("addr")
    assert(df.select(fullList($"addr").as("s")).head().getString(0) ==
      "12 Main St Floor 2 Metro City")
    assert(df.select(indexedChild($"addr", 1)).head().getString(0) ==
      "12 Main St")   // [First]
    assert(df.select(indexedChild($"addr", -1)).head().getString(0) ==
      "Metro City")   // [Last]
  }

  test("yyyymmdd composes the P11 integer date") {
    val r = Seq("2024-03-31").toDF("s")
      .select(yyyymmdd(to_date($"s")).as("i")).head().getInt(0)
    assert(r == 20240331)
  }
}
