package graft

import graft.operators.Html
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edges of [[graft.operators.Html.extractText]] beyond the q111 law:
  * raw `<` inside scripts, nested-looking comments, double-escaped
  * entities, case-insensitive tags, whitespace pileups. */
class HtmlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .first().getString(0)
  }

  test("script and style blocks vanish wholesale, raw < included") {
    assert(extract(
      "<p>a</p><script>if(1<2){x='<b>not bold</b>'}</script><p>b</p>") ==
      "a b")
    assert(extract("<STYLE>p{content:'<fake>'}</STYLE>keep") == "keep")
    assert(extract("<SCRIPT type=\"x\">1<2</SCRIPT>ok") == "ok")
  }

  test("comments removed, tags stripped case-insensitively") {
    assert(extract("x<!-- <p>hidden</p> -->y") == "x y")
    assert(extract("<DIV CLASS=\"a\">v</DIV>") == "v")
    assert(extract("a<br/>b<BR>c") == "a b c")
  }

  test("entity decode order: double-escaped stays escaped once") {
    assert(extract("fish &amp; chips") == "fish & chips")
    assert(extract("1 &lt; 2 &gt; 0") == "1 < 2 > 0")
    assert(extract("&quot;q&quot; &#39;s&#39;") == "\"q\" 's'")
    assert(extract("a&nbsp;b") == "a b")
    // "&amp;lt;" is the SERIALIZED form of the literal text "&lt;"
    assert(extract("&amp;lt;") == "&lt;")
  }

  test("whitespace collapses and trims") {
    assert(extract("  <p>\n  spaced\t\tout  </p>\n ") == "spaced out")
    assert(extract("<p></p>") == "")
  }
}
