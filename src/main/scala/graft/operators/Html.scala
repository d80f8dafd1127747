package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — step zero of every web-corpus pipeline
  * (CCNet/RefinedWeb-style): strip markup, drop script/style blocks
  * and comments wholesale, decode the common entities, collapse
  * whitespace. Pure `regexp_replace` column algebra — per-row,
  * codegen-adjacent, zero shuffle — over the PORTABLE regex subset
  * (the [[Redaction]] convention): no backtracking pathologies, DOTALL
  * via `(?s)` only on the block removals.
  *
  * Two implementations share the contract:
  *  - [[extractText]] — the SQL-PORTABLE regex pipeline (every rule
  *    expressible in any engine's regexp_replace). Honest regex
  *    scope: quoted attribute values must not contain a raw `>`, and
  *    a bare `<` in prose eats text to the next `>`.
  *  - [[extractTextNative]] — the DEFAULT (q111): a native Catalyst
  *    expression running a real character-level tokenizer
  *    ([[graft.functions.HtmlTokenizer]]) that handles exactly the
  *    crawl-HTML cases the regex scope excludes (quoted `>` in
  *    attributes, bare `<` in prose, numeric entities, truncated
  *    markup at EOF) — closing the round-12 "real crawl HTML will
  *    hit this" gap with a tokenizing parser, not a wider regex.
  * Script/style blocks MAY contain `<` freely in both — the
  * non-greedy `(?s)<script.*?</script>` removal is exercised by the
  * q111 law's embedded `if(x<5)`.
  */
object Html {

  /** Tokenizer-grade extraction (the default; see scaladoc above). */
  def extractTextNative(html: Column): Column =
    graft.functions.HtmlExpressions.htmlToText(html)

  /** Extract visible text: script/style blocks out, comments out,
    * tags out, entities decoded, whitespace collapsed + trimmed —
    * the SQL-portable regex twin (see scaladoc above for scope). */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    // entity decode AFTER tag strip, &amp; LAST so "&amp;lt;" decodes
    // to the literal "&lt;" (double-escaped stays escaped once), the
    // order every HTML serializer round-trips under
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** Deterministic MESSY-html law for q111: wraps the corpus text in
    * a full document carrying every noise axis the extractor must
    * survive — head/title, a style block, a script block with raw `<`
    * and entities inside it, comments, attributes (including a quoted
    * value containing a RAW `>` — the case that forces the tokenizer;
    * the regex twin leaks `0\">` here), entity-encoded spaces in the
    * body. Extraction recovers a CLOSED-FORM string
    * ("T{id} Doc {id} " + text), so the oracle can demand the md5 of
    * the EXACT original text — one leaked tag fragment or missed
    * entity breaks the hash. */
  def synthHtml(docId: Column, text: Column): Column =
    concat(
      lit("<!DOCTYPE html><html><head><title>T"), docId,
      lit("</title><style>.c{color:#ff0000;}</style>"),
      lit("<script>var x="), docId,
      lit(";if(x<5){s='&amp;&lt;';}</script></head>"),
      lit("<body class=\"b\" data-id=\""), docId, lit("\">"),
      lit("<!-- synthetic doc "), docId, lit(" --><h1>Doc "), docId,
      lit("</h1><p id=\"t\" data-cmp=\""), docId, lit(">0\">"),
      regexp_replace(text, " ", "&nbsp;"),
      lit("</p></body></html>"))
}
