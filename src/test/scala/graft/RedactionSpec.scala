package graft

import graft.operators.Redaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction gates on SYNTHETIC strings — the harness corpus
  * contains no digits or '@' (verified), so the email/phone/IP
  * patterns are exercised here; q74's oracle covers the blocklist
  * path on real rows. */
class RedactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(text: String): (String, Int, Int, Int) = {
    val df = Seq(text).toDF("text")
    val counts = Redaction.hitCounts(col("text"))
    val r = df.select(
      Redaction.redact(col("text")).as("red") +:
        counts.map { case (l, c) => c.as(l) }: _*).head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("email, phone, ip are redacted with typed tokens and counted") {
    val (red, e, p, i) = redactOne(
      "contact john.doe+spam@sub.example.co.uk or 555-123-4567, " +
        "backup +1 555.987.6543, host at 192.168.0.1 end")
    assert(red == "contact [EMAIL] or [PHONE], backup [PHONE], " +
      "host at [IP] end")
    assert((e, p, i) == (1, 2, 1))
  }

  test("email wins over phone inside a local part; plain text untouched") {
    val (red, e, p, i) = redactOne("x 555-123-4567@example.com plain words")
    assert(red == "x [EMAIL] plain words")
    assert((e, p, i) == (1, 0, 0))
  }

  test("ipv4 requires four octets; shorter dotted runs survive") {
    val (red, _, _, i) = redactOne("v1.2.3 stays, 10.0.0.1 goes")
    assert(red == "v1.2.3 stays, [IP] goes")
    assert(i == 1)
  }

  test("blocklistPattern rejects non-word terms and empty lists") {
    intercept[IllegalArgumentException](Redaction.blocklistPattern(Nil))
    intercept[IllegalArgumentException](
      Redaction.blocklistPattern(Seq("a|b")))
    val pat = Redaction.blocklistPattern(Seq("customer", "window"))
    val got = Seq("the customer window customers")
      .toDF("t")
      .select(regexp_replace(col("t"), pat, "[TERM]"),
        regexp_count(col("t"), lit(pat)).cast("int"))
      .head()
    // word boundaries: 'customers' is NOT a hit
    assert(got.getString(0) == "the [TERM] [TERM] customers")
    assert(got.getInt(1) == 2)
  }
}
