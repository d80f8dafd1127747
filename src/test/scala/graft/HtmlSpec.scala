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

  // ── native tokenizer ([[graft.functions.HtmlTokenizer]]) ──────────

  private def extractN(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractTextNative(col("h")).as("t"))
      .first().getString(0)
  }

  test("native agrees with the regex twin on every shared-scope fixture") {
    for (h <- Seq(
      "<p>a</p><script>if(1<2){x='<b>not bold</b>'}</script><p>b</p>",
      "<STYLE>p{content:'<fake>'}</STYLE>keep",
      "<SCRIPT type=\"x\">1<2</SCRIPT>ok",
      "x<!-- <p>hidden</p> -->y",
      "<DIV CLASS=\"a\">v</DIV>", "a<br/>b<BR>c",
      "fish &amp; chips", "1 &lt; 2 &gt; 0",
      "&quot;q&quot; &#39;s&#39;", "a&nbsp;b", "&amp;lt;",
      "  <p>\n  spaced\t\tout  </p>\n ", "<p></p>"))
      assert(extractN(h) == extract(h), s"diverged on: $h")
  }

  test("native handles quoted attribute values containing raw '>'") {
    // the documented regex-scope exclusion (round-12 missing #5):
    // the regex twin truncates the tag at the inner '>' and leaks
    assert(extractN("<a title=\"a>b\">link</a>") == "link")
    assert(extractN("<p data-x='1>0' class=\"y>z\">t</p>") == "t")
    assert(extract("<a title=\"a>b\">link</a>") != "link")
  }

  test("native keeps bare '<' in prose (HTML5 tokenizer rule)") {
    assert(extractN("i < 5 and j > 2") == "i < 5 and j > 2")
    // the regex twin eats "< 5 and j >" as a pseudo-tag
    assert(extract("i < 5 and j > 2") != "i < 5 and j > 2")
  }

  test("native decodes numeric entities, leaves unknown ones literal") {
    assert(extractN("&#65;&#x42;c") == "ABc")
    assert(extractN("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(extractN("&bogus; &#zz; &") == "&bogus; &#zz; &")
    // HTML5 numeric-reference rule: surrogates, zero and out-of-range
    // yield U+FFFD (never a lone surrogate for UTF-8 to mangle);
    // signs are not digits, so Integer.parseInt's '+' never sneaks in
    assert(extractN("&#xD800;") == "�")
    assert(extractN("&#55296;") == "�")
    assert(extractN("&#0;") == "�")
    assert(extractN("&#x110000;") == "�")
    // beyond the bounded 10-char entity window: literal, not decoded
    assert(extractN("&#99999999999;") == "&#99999999999;")
    assert(extractN("&#+65;") == "&#+65;")
  }

  test("native raw-text close-tag boundary and truncated-markup tails") {
    // </scriptx> must NOT close a script block; </script > must
    assert(extractN("<script>a</scriptx>b</script>c") == "c")
    assert(extractN("<script>a</script >c") == "c")
    // unclosed constructs at EOF drop the tail, never leak markup
    assert(extractN("keep<script>tail with no close") == "keep")
    assert(extractN("keep<!-- unterminated") == "keep")
    assert(extractN("keep<p unterminated") == "keep")
    // the trailing '/' of a start tag is IGNORED on non-void elements
    // (HTML5 tree construction), so <script src=x/> STILL enters
    // script-data state: the body is raw text up to the real close
    // tag, and with no close tag the tail drops like any unclosed
    // script (round-13 advice — honoring the slash leaked script
    // bodies of real crawl HTML into extracted prose)
    assert(extractN("<script src=\"x\"/>var y=1;</script>after") == "after")
    assert(extractN("<script src=\"x\"/>after") == "")
  }

  test("property: native ≡ regex twin across generated shared-scope documents") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the shared scope: complete tags, no quoted '>' in attribute
    // values, no bare '<' in prose, named entities only (numeric refs
    // are deliberately native-only) — within it the two extractors
    // must agree on ANY document a generator can compose
    val word = Gen.oneOf("alpha", "beta", "x1", "fish", "chips",
      "ñ", "a>b", " ", "\n", "\t",
      "&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&#39;", "&amp;lt;",
      "&bogus;")
    val tag = for {
      n <- Gen.oneOf("p", "div", "SPAN", "h1", "em")
      a <- Gen.oneOf("", " class=\"a b\"", " id='x'", " data-k=\"v1\"")
    } yield s"<$n$a>"
    val piece = Gen.frequency(
      6 -> word,
      3 -> tag,
      2 -> Gen.oneOf("</p>", "</div>", "</span>", "</H1>", "<br/>"),
      1 -> Gen.oneOf("<!-- hidden <p>x</p> -->", "<!---->"),
      1 -> Gen.oneOf("<script>if(1<2){x='<b>'}</script>",
        "<STYLE>p{content:'<fake>'}</STYLE>",
        "<script type=\"t\">var s='&amp;';</script>"))
    val doc = Gen.listOf(piece).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(doc) { d => extractN(d) == extract(d) })
    assert(res.passed, s"diverged: ${res.status}")
  }

  test("native extraction recovers the q111 law closed form with the quoted '>'") {
    import spark.implicits._
    val df = Seq((3L, "hello world"), (7L, "x y z")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Html.extractTextNative(
        Html.synthHtml(col("doc_id"), col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(3L) == "T3 Doc 3 hello world")
    assert(got(7L) == "T7 Doc 7 x y z")
  }
}
