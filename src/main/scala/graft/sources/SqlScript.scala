package graft.sources

import org.apache.spark.sql.SparkSession

/** Multi-statement SQL passthrough (SURVEY §2.1 S16).
  *
  * The reference runs user-supplied post-import SQL scripts against the
  * target database after a sync — `executeNonQuery` accepts one or many
  * statements (reference src/database.mts:215-237) and the shipped
  * example is post-import-scripts/opening-transaction.sql, which turns
  * ledger opening balances into a synthetic opening voucher. Here the
  * same scripts run verbatim against `spark.sql`, with warehouse
  * parquet tables registered as INSERT-able external catalog tables.
  *
  * Script splitting is dialect-safe: `;` inside string literals and
  * comments does not terminate a statement, and both `--` line and
  * `/* */` block comments are stripped (Spark's parser accepts them,
  * but a `;` inside one must not split).
  */
object SqlScript {

  /** Split a script into trimmed, non-empty statements, honoring
    * quoted regions and SQL comments. All three quote characters Spark
    * parses are tracked — `'…'` string literals, `"…"` string literals
    * (Spark's default, non-ANSI double-quote mode), and `` `…` ``
    * quoted identifiers — each with its doubled-char escape, so a `;`
    * inside any of them does not terminate the statement. */
  def statements(script: String): Seq[String] = {
    val sb = new StringBuilder
    val out = Seq.newBuilder[String]
    var i = 0
    // quote = the delimiter we're inside, or 0 when outside
    var quote: Char = 0; var inLine = false; var inBlock = false
    while (i < script.length) {
      val c = script.charAt(i)
      val next = if (i + 1 < script.length) script.charAt(i + 1) else ' '
      if (inLine) {
        if (c == '\n') { inLine = false; sb.append(c) }
        i += 1
      } else if (inBlock) {
        // close of a block comment leaves one space so tokens abutting
        // the comment (`col/*x*/from`) don't glue together
        if (c == '*' && next == '/') {
          inBlock = false; sb.append(' '); i += 2
        } else i += 1
      } else if (quote != 0) {
        sb.append(c)
        // backslash escapes apply inside string literals ('…'/"…") in
        // Spark's default (non-ANSI escapedStringLiterals) mode — \' or
        // \" must not close the region; backticks take doubled-char only
        if (c == '\\' && quote != '`' && i + 1 < script.length) {
          sb.append(next); i += 2
        } else if (c == quote) {
          if (next == quote) { sb.append(next); i += 2 }
          else { quote = 0; i += 1 }
        } else i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; sb.append(c); i += 1
        case '-' if next == '-' => inLine = true; i += 2
        case '/' if next == '*' => inBlock = true; i += 2
        case ';' => out += sb.toString; sb.clear(); i += 1
        case _ => sb.append(c); i += 1
      }
    }
    out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val QuotedAlias =
    """('(?:[^']|'')*')\s+'([A-Za-z_][A-Za-z0-9_]*)'""".r

  /** T-SQL compat shim: the reference's scripts use a QUOTED column
    * alias after a literal (`'…' 'guid'`, opening-transaction.sql:7),
    * which T-SQL reads as an alias but ANSI SQL reads as literal
    * juxtaposition. Rewritten to the `AS` form Spark parses. */
  def mssqlCompat(stmt: String): String =
    QuotedAlias.replaceAllIn(stmt, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} AS `${m.group(2)}`"))

  private val InsertRe =
    """(?is)^\s*insert\s+into\s+([`"\w.]+)\s*\(([^)]*)\)\s*((?:values|select).*)$""".r

  /** Implicit-cast shim: every reference target database casts
    * `'1999-12-31'` to DATE on insert; Spark's ANSI store-assignment
    * refuses the string→date write. Rewrites a column-listed INSERT so
    * each inserted expression is explicitly CAST to the catalog type
    * of its target column — same semantics the reference databases
    * apply, made explicit. Statements that aren't column-listed
    * inserts (or whose table/columns can't be resolved) pass through. */
  def typedInsert(spark: SparkSession, stmt: String): String = stmt match {
    case InsertRe(table, colList, rest) =>
      val cols = colList.split(',').map(_.trim.stripPrefix("`")
        .stripSuffix("`").stripPrefix("\"").stripSuffix("\""))
      val schema =
        try spark.table(table.replace("\"", "`")).schema
        catch { case _: Exception => return stmt }
      val types = cols.map(c =>
        schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType.sql))
      if (types.exists(_.isEmpty)) stmt
      else {
        val casts = cols.zip(types).map { case (c, t) =>
          s"CAST(`$c` AS ${t.get}) AS `$c`" }.mkString(", ")
        val aliasCols = cols.map(c => s"`$c`").mkString(", ")
        s"INSERT INTO $table (${cols.mkString(", ")}) " +
          s"SELECT $casts FROM ( $rest ) AS __ins($aliasCols)"
      }
    case _ => stmt
  }

  /** Execute every statement in order; returns how many ran. */
  def run(spark: SparkSession, script: String,
      compat: Boolean = true): Int = {
    val sts = statements(script)
    sts.foreach { s =>
      val ansi = if (compat) mssqlCompat(s) else s
      spark.sql(if (compat) typedInsert(spark, ansi) else ansi)
    }
    sts.size
  }

  /** Register every table directory under `dir` (a [[graft.tally.ParquetWarehouse]]
    * layout: one parquet directory per table) as an external catalog
    * table, then run the script. External tables make INSERT INTO a
    * parquet append at the table's own location, so post-import
    * scripts mutate the warehouse exactly like the reference's
    * database-side scripts — distributed writes, no driver data path. */
  def runOnParquetDir(spark: SparkSession, dir: String, script: String,
      compat: Boolean = true): Int = {
    val base = new java.io.File(dir)
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith(".") &&
        !f.getName.endsWith(".tmp") && !f.getName.endsWith(".old"))
      .foreach { f =>
        val name = f.getName
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        spark.sql(
          s"CREATE TABLE `$name` USING parquet LOCATION '${f.getAbsolutePath}'")
      }
    run(spark, script, compat)
  }
}
