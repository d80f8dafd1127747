package graft.sources

import graft.functions.TallyTypes
import graft.functions.TallyTypes._
import org.apache.spark.sql.DataFrame

/** Remaining load targets of the reference (SURVEY §2.1 S5, S8–S13):
  * the JDBC insert path with its batch bounds, the raw `.data` TSV
  * artifact, and the Azure-CDM `model.json` metadata generator. The
  * live database/cloud endpoints don't exist in this environment;
  * what's here is the Spark-side contract (options, batching, typed
  * rendering) — exactly the part a deployment reuses.
  */
object Sinks {

  /** Batch bounds of the reference's multi-row INSERT loader
    * (src/database.mts:12,140): ≤1000 rows per statement and a
    * ~50k-char statement budget. */
  val MaxBatchRows = 1000
  val MaxQueryChars = 50000

  /** JDBC writer with the reference's `loadmethod: insert` semantics:
    * truncate-and-append (preserves target DDL) and the row-batch
    * bound mapped to the JDBC driver's `batchsize`. Dialect
    * quoting/escaping is the driver's job — the engine no longer
    * hand-assembles INSERT statements. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      truncate: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("truncate", truncate.toString)
      .option("batchsize", MaxBatchRows.toString)
      .jdbc(url, table, props)

  /** Render the reference's `./csv/<table>.data` artifact (S5,
    * src/tally.mts:541-560): header line + TSV rows with the
    * ñ-sentinel/1-0 text forms. Distributed row rendering, driver-side
    * final assembly (one file per table is the contract). */
  def dataFileContent(df: DataFrame, types: Seq[FieldType],
      maxRows: Long = Emitters.MaxSingleFileRows): String = {
    import org.apache.spark.sql.functions._
    Emitters.guardSingleFile(df, "dataFileContent", maxRows)
    val cols = df.columns.zip(types).map { case (name, t) =>
      TallyTypes.emitValue(col(name), t)
    }
    val header = df.columns.mkString("\t")
    val rows = df.select(concat_ws("\t", cols.toIndexedSeq: _*).as("line"))
      .collect().map(_.getString(0))
    (header +: rows).mkString("\r\n")
  }

  /** CDM `model.json` for an Azure-Data-Lake layout (S13,
    * src/database.mts:307-397): entity/attribute/partition metadata
    * with the reference's type mapping (text→string,
    * number/logical→Int64, amount→decimal, date→date, else text). */
  def cdmModelJson(schemaName: String, domain: String,
      tables: Seq[TableSpec]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def cdmType(t: FieldType): String = t match {
      case TText => "string"
      case TNumber | TLogical => "Int64"
      case TAmount => "decimal"
      case TDate => "date"
      case _ => "text"
    }
    val entities = tables.map { t =>
      val attrs = t.fields.map(f =>
        s"""{"name":"${esc(f.name)}","dataType":"${cdmType(f.ftype)}"}""")
        .mkString(",")
      s"""{"$$type":"LocalEntity","name":"${esc(t.name)}",""" +
        s""""attributes":[$attrs],"partitions":[{"name":"${esc(t.name)}",""" +
        s""""location":"https://${esc(domain)}.dfs.core.windows.net/tally/""" +
        s"""${esc(schemaName)}/${esc(t.name)}.csv",""" +
        """"fileFormatSettings":{"$type":"CsvFormatSettings",""" +
        """"columnHeaders":true}}]}"""
    }.mkString(",")
    s"""{"name":"${esc(schemaName)}","version":"1.0.0","entities":[$entities]}"""
  }

  /** Dialect-faithful multi-row INSERT statements from a `.data` TSV
    * artifact (S8 insert loadmethod; reference src/database.mts:127-170):
    * text quote-doubles `'`, MySQL additionally doubles backslashes,
    * MSSQL prefixes `N` when a value holds any non-ASCII char, the ñ
    * date sentinel renders NULL, and statements batch at ≤ 1000 rows
    * AND the ~50k-char query budget (whichever trips first — the
    * budget is checked against the RAW line like the reference does). */
  def insertStatements(table: String, tsvContent: String,
      types: Seq[FieldType], dialect: String): Seq[String] = {
    val lines = scala.collection.mutable.Queue(
      tsvContent.split("\r\n").toIndexedSeq: _*)
    if (lines.isEmpty) return Nil
    val fieldList = lines.dequeue().replace("\t", ",")
    val out = Seq.newBuilder[String]
    while (lines.nonEmpty) {
      val sb = new StringBuilder(s"insert into $table ($fieldList) values")
      var batch = 0
      // `batch == 0` forces one row even past the char budget: a
      // single oversize row must emit an oversize statement, not spin
      while (lines.nonEmpty &&
          (batch == 0 ||
            sb.length + lines.head.length + 3 < MaxQueryChars) &&
          { batch += 1; batch <= MaxBatchRows }) {
        val values = lines.dequeue().split("\t", -1).zipWithIndex.map {
          case (v, i) => types.lift(i) match {
            case Some(TText) =>
              val unicode = v.exists(_ > '\u007f')
              var t = v.replace("'", "''")
              if (dialect == "mysql") t = t.replace("\\", "\\\\")
              val quoted = s"'$t'"
              if (unicode && dialect == "mssql") "N" + quoted else quoted
            case Some(TDate) => if (v == NullDateSentinel) "NULL" else s"'$v'"
            case _ => v // numeric/logical render bare
          }
        }
        sb ++= values.mkString("(", ",", "),")
      }
      out += sb.dropRight(1).append(';').toString
    }
    out.result()
  }

  /** Staged-file load invocations per dialect (S9–S12 file
    * loadmethod). MySQL and Postgres are the exact SQL the reference
    * issues (src/database.mts:629, 589); MSSQL's bulk API and
    * BigQuery's load job take no SQL, so those render as the
    * equivalent operational descriptor. */
  def loadCommand(dialect: String, table: String, path: String): String =
    dialect match {
      case "mysql" =>
        s"load data local infile '$path' into table $table fields " +
          "terminated by ',' enclosed by '\"' escaped by '' lines " +
          "terminated by '\\r\\n' ignore 1 lines ;"
      case "postgres" => s"copy $table from stdin csv header;"
      case "mssql" => s"bulk insert $table from '$path' (bulk API; " +
        "format csv, first row = header)"
      case "bigquery" => s"load $table from '$path' " +
        "(sourceFormat=CSV, skipLeadingRows=1, writeDisposition=WRITE_APPEND)"
      case other =>
        throw new IllegalArgumentException(s"unknown dialect: $other")
    }
}
