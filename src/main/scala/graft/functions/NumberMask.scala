package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's number-masking kit (`src/utility.mts:60-156`,
  * `utility.Number.format`) as Column functions — spreadsheet-style
  * masks with positive;negative;zero sections, prefix/suffix text,
  * fixed-zero padding, and mask-driven digit grouping (the comma
  * layout comes from the mask, so Indian grouping `#,##,##0.00`
  * works exactly like the reference renders ledger amounts, and the
  * TDL naming masks `MyPart00`/`Fld00` of `src/tally.mts:633-681`
  * work too).
  *
  * The MASK is configuration, not data, so it is parsed ONCE on the
  * driver and compiled into a pure built-in-function Column tree —
  * per-row work is all codegen'd string/arithmetic primitives, no
  * UDF. Two reference quirks are mirrored faithfully (pinned in
  * NumberMaskSpec):
  *  - a value whose integer digits all fall on `#` positions and are
  *    zero strips to the EMPTY string (`format(0, "#")` = ""), and
  *    leading commas strip with them;
  *  - the fraction rounds independently of the integer part and a
  *    carry is DROPPED, not propagated (`format(1.999, "0.00")` =
  *    "1.00" — `numFraction.toFixed(2).substr(2)` in the reference).
  *
  * Grouping under mask overflow also mirrors the reference: extra
  * digits beyond the mask's widest group join the LEFTMOST group
  * uncommaed (`format(1234567890, "#,##,##0")` = "12345,67,890") —
  * the mask owns the comma layout, overflow does not invent groups.
  */
object NumberMask {

  private final case class Section(prefix: String, intMask: String,
      fracDigits: Int, suffix: String)

  /** Split `positive;negative;zero` sections, then extract
    * prefix / digit-mask / suffix per the reference's
    * `/([#,0\.]+)/` scan. */
  private def parseSections(mask: String): (Section, Section, Section) = {
    val parts = mask.split(";", -1)
    val pos = parts(0)
    val neg = if (parts.length >= 2) parts(1) else parts(0)
    val zero = if (parts.length >= 3) parts(2) else parts(0)
    (parseOne(pos), parseOne(neg), parseOne(zero))
  }

  private def parseOne(section: String): Section = {
    val m = java.util.regex.Pattern.compile("([#,0\\.]+)")
      .matcher(section)
    if (!m.find()) return Section(section, "", 0, "")
    val prefix = section.substring(0, m.start())
    val suffix = section.substring(m.end())
    val core = m.group(1)
    val dot = core.indexOf('.')
    val intMask = if (dot == -1) core else core.substring(0, dot)
    val fracDigits = if (dot == -1) 0 else core.length - dot - 1
    Section(prefix, intMask, fracDigits, suffix)
  }

  /** Compile one section's integer-part formatting for `absValue`
    * (a non-negative integral Column of the truncated value). */
  private def intPart(absInt: Column, intMask: String): Column = {
    val totalCount = intMask.count(_ != ',')
    val commaIdx = intMask.zipWithIndex.filter(_._1 == ',').map(_._2)
    val firstZero = intMask.indexOf('0')
    val digits = absInt.cast("string")
    val digitCount = length(digits)
    // zero-pad when the number is shorter than the mask's digit count
    val padded =
      if (totalCount == 0) digits
      else when(digitCount < totalCount, lpad(digits, totalCount, "0"))
        .otherwise(digits)
    val padShift = greatest(digitCount - lit(totalCount), lit(0))
    // comma k at mask index c_k lands after digit (c_k − k + padShift)
    // of the padded digit string (mask indices count earlier commas
    // exactly like the reference's growing-string insertAt loop)
    val grouped =
      if (commaIdx.isEmpty) padded
      else {
        val digitPos = commaIdx.zipWithIndex.map { case (c, k) =>
          lit(c - k) + padShift
        }
        // substring splits: [0, p1), [p1, p2), …, [pk, end)
        val pieces = (lit(0) +: digitPos).zip(digitPos :+ length(padded))
          .map { case (from, to) =>
            substring(padded, one(from), (to - from).cast("int"))
          }
        concat_ws(",", pieces: _*)
      }
    // strip the leading run of padded zeros (and their commas) down
    // to the mask's fixed-'0' region — the reference's char-by-char
    // strip loop reduces to min(leading [0,]* run, first-'0' index
    // in the padded mask)
    val leadRun = length(regexp_extract(grouped, "^[0,]*", 0))
    val limit =
      if (firstZero == -1) length(grouped)
      else lit(firstZero) + padShift
    val strip = least(leadRun, limit).cast("int")
    substring(grouped, (strip + 1).cast("int"), length(grouped))
  }

  /** substring() is 1-based; positions computed 0-based. */
  private def one(c: Column): Column = (c + 1).cast("int")

  private def fracPart(absValue: Column, fracDigits: Int): Column =
    if (fracDigits == 0) lit("")
    else {
      val scale = math.pow(10, fracDigits).toLong
      val frac = absValue - floor(absValue)
      // ES toFixed: nearest, ties away from zero — floor(x·10^f + .5);
      // the % drops the carry exactly like the reference's substr(2)
      val n = (floor(frac * scale + lit(0.5)) % scale).cast("long")
      concat(lit("."), lpad(n.cast("string"), fracDigits, "0"))
    }

  private def renderSection(value: Column, s: Section): Column = {
    val av = abs(value)
    concat(lit(s.prefix), intPart(floor(av).cast("long"), s.intMask),
      fracPart(av, s.fracDigits), lit(s.suffix))
  }

  /** `utility.Number.format` as a Column: format `value` under
    * `mask`, section chosen by the value's sign. */
  def format(value: Column, mask: String): Column = {
    val (pos, neg, zero) = parseSections(mask)
    when(value > 0, renderSection(value, pos))
      .when(value < 0, renderSection(value, neg))
      .otherwise(renderSection(value, zero))
  }
}
