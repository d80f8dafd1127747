package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edges of [[graft.operators.Urls.canonicalize]] the q110 law never
  * produces: malformed inputs, non-default ports, the bare root
  * slash, empty queries, all-utm queries, uppercase scheme-only. */
class UrlsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("normalization rules, one by one") {
    assert(canon("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&z=1&a=2#frag") ==
      Seq(Some("http://ex.com/A/b?a=2&z=1")))
    // path case preserved; host case folded
    assert(canon("https://EX.com/CaseSensitive") ==
      Seq(Some("https://ex.com/CaseSensitive")))
    // non-default port survives; default for the OTHER scheme too
    assert(canon("http://ex.com:8080/x", "http://ex.com:443/x",
        "https://ex.com:443/x") ==
      Seq(Some("http://ex.com:8080/x"), Some("http://ex.com:443/x"),
        Some("https://ex.com/x")))
    // bare host -> root slash; root slash never stripped
    assert(canon("https://ex.com", "https://ex.com/") ==
      Seq(Some("https://ex.com/"), Some("https://ex.com/")))
    // all params tracking -> no query at all
    assert(canon("https://ex.com/p?utm_source=a&utm_medium=b") ==
      Seq(Some("https://ex.com/p")))
    // empty query string -> no trailing '?'
    assert(canon("https://ex.com/p?") == Seq(Some("https://ex.com/p")))
  }

  test("malformed inputs canonicalize to NULL, never to a guess") {
    assert(canon("not a url", "", "www.ex.com/no-scheme", "http://") ==
      Seq(None, None, None, None))
  }

  test("dup groups collapse the law's noise axes") {
    import spark.implicits._
    // two messy spellings of one page + one genuinely different page
    val docs = Seq(
      (1L, "HTTP://WWW.Ex.COM:80/a?b=2&utm_source=x&a=1"),
      (2L, "http://ex.com/a/?a=1&b=2#frag"),
      (3L, "http://ex.com/other")).toDF("doc_id", "url")
    val got = Urls.dupGroups(docs, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("http://ex.com/a?a=1&b=2", 2L, 1L),
      ("http://ex.com/other", 1L, 3L)))
  }
}
