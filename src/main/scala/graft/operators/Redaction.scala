package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / blocklist redaction — the compliance pass a training-data
  * pipeline runs before anything ships: emails, phone numbers, bare
  * IPv4s, and operator-supplied blocklist terms replaced with typed
  * placeholder tokens, plus per-category hit counts for audit reports.
  *
  * Everything here is a per-row Column program over `regexp_replace` /
  * `regexp_count` — native codegen'd expressions, zero UDFs, zero
  * shuffle: at 100 TB the redaction pass is a pure map over the
  * corpus scan and pipelines into whatever filter/dedup stage follows.
  *
  * The patterns deliberately use the portable regex subset (character
  * classes, bounded repetition, alternation, `\b` word boundaries — no
  * lookaround, no backreferences) so the same pattern string runs
  * identically on java.util.regex (Spark) and RE2-family engines
  * (the DuckDB oracle): the q74 gate depends on that equivalence.
  */
object Redaction {

  /** Email addresses (pragmatic RFC-lite shape). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers: 555-123-4567 / 555.123.4567 /
    * 555 123 4567, optional +1 country prefix. */
  val PhonePattern = "(\\+1[-. ])?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Dotted-quad IPv4 (permissive octets — redaction favors recall). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The default PII pass, applied in order. Email runs before phone
    * so digits inside a local-part are claimed by the email token. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> EmailPattern,
    "PHONE" -> PhonePattern,
    "IP"    -> Ipv4Pattern)

  /** Word-boundary alternation over literal `terms`. Terms are
    * restricted to word characters so no regex metacharacter can leak
    * in (java's `Pattern.quote` emits `\Q…\E`, which RE2 does not
    * understand — restriction beats quoting for portability). */
  def blocklistPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "blocklist must not be empty")
    terms.foreach(t => require(t.matches("[A-Za-z0-9_]+"),
      s"blocklist term must be word characters only: '$t'"))
    "\\b(" + terms.mkString("|") + ")\\b"
  }

  /** `textCol` with every `(label, pattern)` rewritten to `[label]`,
    * applied left to right (order matters when patterns overlap). */
  def redact(textCol: Column,
      patterns: Seq[(String, String)] = piiPatterns): Column =
    patterns.foldLeft(textCol) { case (c, (label, p)) =>
      regexp_replace(c, p, s"[$label]")
    }

  /** Per-category hit counts as (label, count Column) pairs — the
    * audit metrics next to [[redact]]'s rewrite. Each pattern is
    * counted against the text with all EARLIER patterns already
    * applied, so the counts are exactly the number of `[label]`
    * tokens the sequential [[redact]] inserts (a phone-shaped run
    * inside an email local-part is an email, not an email AND a
    * phone). */
  def hitCounts(textCol: Column,
      patterns: Seq[(String, String)] = piiPatterns): Seq[(String, Column)] =
    patterns.zipWithIndex.map { case ((label, p), i) =>
      label -> regexp_count(redact(textCol, patterns.take(i)), lit(p))
        .cast("int")
    }
}
