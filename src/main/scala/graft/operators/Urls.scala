package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the web-corpus curation step that
  * precedes content dedup in CommonCrawl-style pipelines (the same
  * page crawled as `HTTP://WWW.Site.COM:80/a/?utm_source=x#frag` and
  * `http://site.com/a` must collapse BEFORE text processing spends
  * anything on it). Everything is built-in `functions._` column
  * algebra — regexp parse, array filter/sort for the query string —
  * codegen-friendly, per-row, zero shuffle until the final group-by
  * on the (short) canonical key.
  *
  * Canonical form: lowercase scheme and host, strip a leading
  * `www.`, strip the scheme's default port (`:80` http / `:443`
  * https), strip one trailing slash from the path (never the root
  * slash itself — `/` alone stays), drop `utm_*` tracking params,
  * sort the surviving query params bytewise, drop the fragment.
  * Path CASE is preserved (paths are case-significant per RFC 3986;
  * only scheme/host are case-insensitive).
  */
object Urls {

  /** Canonicalize a URL column per the rules above. Malformed rows
    * (no scheme://host) canonicalize to NULL rather than a guess. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val host0 = lower(regexp_extract(hostPort, "^([^:]+)", 1))
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "" , lit("/"))
      .otherwise(when(path0 =!= "/" ,
        regexp_replace(path0, "/$", "")).otherwise(path0))
    // strip the fragment BEFORE query extraction: a '?' inside the
    // fragment (http://h/p#a?b=1) must not leak into the canonical
    // query — the query regex may only match before '#'
    val query0 = regexp_extract(regexp_replace(url, "#.*", ""),
      "\\?([^#]*)", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val query = array_join(array_sort(params), "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(size(params) > 0, concat(lit("?"), query)).otherwise(lit(""))))
  }

  /** Deterministic MESSY-url law for the q110 corpus: every noise
    * axis the canonicalizer must survive, each keyed off doc_id —
    * scheme/host case, `www.` prefixes, default ports, trailing
    * slashes, `utm_*` params, param ORDER, fragments. The canonical
    * form collapses to a closed form the SQL oracle writes down
    * directly, so a hash-green gate proves parse + every
    * normalization rule at once. */
  def synthUrl(docId: Column): Column = {
    val scheme = when(docId % 2 === 0,
        when(docId % 4 === 0, "HTTP").otherwise("http"))
      .otherwise(when(docId % 4 === 1, "HTTPS").otherwise("https"))
    val www = when(docId % 6 < 3, "WWW.").otherwise("")
    val host = when(docId % 4 < 2,
        concat(lit("EXAMPLE"), docId % 3, lit(".COM")))
      .otherwise(concat(lit("Example"), docId % 3, lit(".com")))
    val port = when(docId % 8 < 4,
        when(docId % 2 === 0, ":80").otherwise(":443"))
      .otherwise(lit(""))
    val path = concat(lit("/Path/"), docId % 5, lit("/item"),
      when(docId % 7 < 3, "/").otherwise(""))
    val utm = concat(lit("utm_source=feed"), docId % 4)
    val a = concat(lit("a="), docId % 2)
    val b = concat(lit("b="), docId % 3)
    val query = when(docId % 2 === 0,
        concat(b, lit("&"), utm, lit("&"), a))
      .otherwise(concat(utm, lit("&"), a, lit("&"), b))
    val frag = when(docId % 3 === 0, concat(lit("#s"), docId % 5))
      .otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, lit("?"), query, frag)
  }

  /** URL-dedup groups over canonicalized URLs: (canonical key, group
    * size, kept id). Only the short canonical string shuffles. */
  def dupGroups(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        canonicalize(col(urlCol)).as("url_canonical"))
      .filter(col("url_canonical").isNotNull)
      .groupBy(col("url_canonical"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keeper"))
}
