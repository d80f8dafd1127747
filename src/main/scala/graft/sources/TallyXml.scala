package graft.sources

import graft.functions.TallyTypes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Tally extraction layer re-built Spark-first (SURVEY §2.1
  * S1–S4): a [[TableSpec]] compiles to a TDL XML report request; the
  * pseudo-XML response rewrites to TSV; TSV parses into a typed
  * DataFrame via the [[TallyTypes]] normalizers.
  *
  * Design: TDL generation and the XML→TSV rewrite are driver-side
  * string work (the Tally HTTP response is inherently one stream,
  * reference src/tally.mts:448-490); everything after — per-field
  * typed parsing — is a distributed DataFrame program. The filters
  * and field list in the spec ARE the pushdown: they are compiled
  * into the TDL `<FILTER>`/`<FETCH>` so the source never exports
  * filtered rows or unused columns (the reference's only "optimizer"
  * tactic, and the analog of SupportsPushDownFilters on a V2 source).
  *
  * Behavior derives from reference src/tally.mts:614-718 (TDL
  * generation), 514-539 (XML→TSV rewrites), 492-512 (parameter
  * substitution). No code is copied — the TDL grammar is fixed by
  * Tally's protocol.
  */
object TallyXml {

  /** Compile a spec into the TDL XML export request (S2): one
    * PART/LINE per collection-path level with EXPLODE descent, one
    * FIELD per column with the type's SET template, COLLECTION with
    * FETCH pruning and FILTER formulae. */
  def generateTdl(spec: TableSpec, company: Option[String] = None): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"utf-8\"?><ENVELOPE><HEADER>" +
      "<VERSION>1</VERSION><TALLYREQUEST>Export</TALLYREQUEST>" +
      "<TYPE>Data</TYPE><ID>GraftReport</ID></HEADER><BODY><DESC>" +
      "<STATICVARIABLES><SVEXPORTFORMAT>XML (Data Interchange)" +
      "</SVEXPORTFORMAT><SVFROMDATE>{fromDate}</SVFROMDATE>" +
      "<SVTODATE>{toDate}</SVTODATE>"
    company.foreach(c => sb ++= s"<SVCURRENTCOMPANY>" +
      s"${TallyTypes.escapeXml(c)}</SVCURRENTCOMPANY>")
    sb ++= "</STATICVARIABLES><TDL><TDLMESSAGE>" +
      "<REPORT NAME=\"GraftReport\"><FORMS>MyForm</FORMS></REPORT>" +
      "<FORM NAME=\"MyForm\"><PARTS>MyPart01</PARTS></FORM>"

    val routes = "MyCollection" +: spec.collectionPath.tail
    routes.indices.foreach { i =>
      val part = f"MyPart${i + 1}%02d"; val line = f"MyLine${i + 1}%02d"
      sb ++= s"""<PART NAME="$part"><LINES>$line</LINES>""" +
        s"""<REPEAT>$line : ${routes(i)}</REPEAT>""" +
        "<SCROLLED>Vertical</SCROLLED></PART>"
    }
    (0 until routes.length - 1).foreach { i =>
      val line = f"MyLine${i + 1}%02d"; val part = f"MyPart${i + 2}%02d"
      sb ++= s"""<LINE NAME="$line"><FIELDS>FldBlank</FIELDS>""" +
        s"<EXPLODE>$part</EXPLODE></LINE>"
    }
    // last line carries the data fields
    sb ++= s"""<LINE NAME="${f"MyLine${routes.length}%02d"}">"""
    sb ++= "<FIELDS>" +
      spec.fields.indices.map(i => f"Fld${i + 1}%02d").mkString(",") +
      "</FIELDS></LINE>"

    spec.fields.zipWithIndex.foreach { case (f, i) =>
      sb ++= s"""<FIELD NAME="${f"Fld${i + 1}%02d"}"><SET>""" +
        fieldSetExpr(f) + s"</SET><XMLTAG>${f"F${i + 1}%02d"}</XMLTAG></FIELD>"
    }
    sb ++= "<FIELD NAME=\"FldBlank\"><SET>\"\"</SET></FIELD>"

    sb ++= s"""<COLLECTION NAME="MyCollection"><TYPE>""" +
      spec.collectionPath.head + "</TYPE>"
    if (spec.fetch.nonEmpty)
      sb ++= s"<FETCH>${spec.fetch.mkString(",")}</FETCH>"
    if (spec.filters.nonEmpty)
      sb ++= "<FILTER>" +
        spec.filters.indices.map(j => f"Fltr${j + 1}%02d").mkString(",") +
        "</FILTER>"
    sb ++= "</COLLECTION>"
    spec.filters.zipWithIndex.foreach { case (fl, j) =>
      sb ++= s"""<SYSTEM TYPE="Formulae" NAME="${f"Fltr${j + 1}%02d"}">""" +
        fl + "</SYSTEM>"
    }
    sb ++= "</TDLMESSAGE></TDL></DESC></BODY></ENVELOPE>"
    sb.toString
  }

  /** The per-type TDL SET expression template (the reference's scalar
    * function surface, src/tally.mts:660-676). */
  private[sources] def fieldSetExpr(f: FieldSpec): String = {
    import TallyTypes._
    val simple = f.field.matches("^(\\.\\.)?[a-zA-Z0-9_]+$")
    if (!simple) f.field
    else f.ftype match {
      case TText => s"$$${f.field}"
      case TLogical => s"if $$${f.field} then 1 else 0"
      case TDate => s"if $$$$IsEmpty:$$${f.field} then $$$$StrByCharCode:241" +
        s" else $$$$PyrlYYYYMMDDFormat:$$${f.field}:\"-\""
      case TNumber =>
        s"if $$$$IsEmpty:$$${f.field} then \"0\" else $$$$String:$$${f.field}"
      case TAmount => s"$$$$StringFindAndReplace:(if $$$$IsDebit:$$${f.field}" +
        s" then -$$$$NumValue:$$${f.field} else $$$$NumValue:$$${f.field})" +
        ":\"(-)\":\"-\""
      case TQuantity => s"$$$$StringFindAndReplace:(if $$$$IsInwards:" +
        s"$$${f.field} then $$$$Number:$$$$String:$$${f.field}:\"TailUnits\"" +
        s" else -$$$$Number:$$$$String:$$${f.field}:\"TailUnits\")" +
        ":\"(-)\":\"-\""
      case TRate =>
        s"if $$$$IsEmpty:$$${f.field} then 0 else $$$$Number:$$${f.field}"
      case TCustom => f.field
    }
  }

  /** Bind report parameters into the TDL (S3,
    * src/tally.mts:492-512). */
  def substituteParams(tdl: String, fromDate: String, toDate: String,
      company: Option[String] = None): String = {
    val withDates = tdl
      .replace("{fromDate}", fromDate)
      .replace("{toDate}", toDate)
    company.fold(withDates)(c =>
      withDates.replace("{targetCompany}", TallyTypes.escapeXml(c)))
  }

  /** The 14 sequential rewrites turning Tally's pseudo-XML response
    * into TSV rows (S4, src/tally.mts:514-539): strip envelope and
    * blank tags, collapse line breaks, `<F01>` opens a row, `<Fnn>`
    * becomes a tab, XML entities unescape. */
  def xmlToTsv(xml: String): String = {
    var r = xml
    r = r.replaceFirst("<ENVELOPE>", "")
    r = r.replaceFirst("</ENVELOPE>", "")
    r = r.replaceAll("<FLDBLANK></FLDBLANK>", "")
    r = r.replaceAll("\\s+\r\n", "")
    r = r.replaceAll("\r\n", "")
    r = r.replaceAll("\t", " ")
    r = r.replaceAll("\\s+<F", "<F")
    r = r.replaceAll("</F\\d+>", "")
    r = r.replaceAll("<F01>", "\r\n")
    r = r.replaceAll("<F\\d+>", "\t")
    r = r.replaceAll("&amp;", "&")
    r = r.replaceAll("&lt;", "<")
    r = r.replaceAll("&gt;", ">")
    r = r.replaceAll("&quot;", "\"")
    r = r.replaceAll("&apos;", "'")
    r = r.replaceAll("&tab;", "")
    r = r.replaceAll("&#\\d+;", "")
    r
  }

  /** Parse TSV rows (no header) into a typed DataFrame per the spec —
    * distributed: each line splits on tab and every field runs its
    * [[TallyTypes.parseValue]] normalizer inside codegen. */
  def tsvToDataFrame(spark: SparkSession, tsv: String,
      spec: TableSpec): DataFrame = {
    import spark.implicits._
    val lines = tsv.split("\r\n").toIndexedSeq.filter(_.nonEmpty)
    val raw = spark.createDataset(lines).toDF("line")
      .select(split(col("line"), "\t").as("f"))
    // try_element_at: short rows (Tally omits trailing blanks) yield
    // null → '' instead of throwing under ANSI mode
    raw.select(spec.fields.zipWithIndex.map { case (f, i) =>
      TallyTypes.parseValue(
        coalesce(try_element_at(col("f"), lit(i + 1)), lit("")), f.ftype)
        .as(f.name)
    }: _*)
  }

  /** The active-company AlterId watermark probe (S18,
    * src/tally.mts:406-446): a fixed comma-delimited report returning
    * `$AltMstId,$AltVchId`. Returns (masterAlterId, transactionAlterId)
    * or None when no company is open (empty response). */
  def alterIdProbeTdl(company: Option[String]): String = {
    val base = "<?xml version=\"1.0\" encoding=\"utf-8\"?><ENVELOPE>" +
      "<HEADER><VERSION>1</VERSION><TALLYREQUEST>Export</TALLYREQUEST>" +
      "<TYPE>Data</TYPE><ID>AlterIdProbe</ID></HEADER><BODY><DESC>" +
      "<STATICVARIABLES><SVEXPORTFORMAT>ASCII (Comma Delimited)" +
      "</SVEXPORTFORMAT></STATICVARIABLES><TDL><TDLMESSAGE>" +
      "<REPORT NAME=\"AlterIdProbe\"><FORMS>MyForm</FORMS></REPORT>" +
      "<FORM NAME=\"MyForm\"><PARTS>MyPart</PARTS></FORM>" +
      "<PART NAME=\"MyPart\"><LINES>MyLine</LINES>" +
      "<REPEAT>MyLine : MyCollection</REPEAT>" +
      "<SCROLLED>Vertical</SCROLLED></PART>" +
      "<LINE NAME=\"MyLine\"><FIELDS>FldM,FldT</FIELDS></LINE>" +
      "<FIELD NAME=\"FldM\"><SET>$AltMstId</SET></FIELD>" +
      "<FIELD NAME=\"FldT\"><SET>$AltVchId</SET></FIELD>" +
      "<COLLECTION NAME=\"MyCollection\"><TYPE>Company</TYPE>" +
      "<FILTER>FilterActiveCompany</FILTER></COLLECTION>" +
      "<SYSTEM TYPE=\"Formulae\" NAME=\"FilterActiveCompany\">" +
      "$$IsEqual:##SVCurrentCompany:$Name</SYSTEM>" +
      "</TDLMESSAGE></TDL></DESC></BODY></ENVELOPE>"
    company.fold(base)(c => base.replace("##SVCurrentCompany",
      "\"" + TallyTypes.escapeXml(c) + "\""))
  }

  def parseAlterIds(response: String): Option[(Long, Long)] = {
    val cleaned = response.replace("\"", "").trim
    if (cleaned.isEmpty) None
    else cleaned.split(",").toSeq match {
      case m +: t +: _ =>
        def num(s: String) = s.trim.toLongOption.getOrElse(0L)
        Some((num(m), num(t)))
      case _ => Some((0L, 0L))
    }
  }

  /** The company-info probe (S17, src/tally.mts:562-612): guid, name,
    * books-from and last-voucher-date (yyyymmdd ints), EOL marker †.
    * Yields the reference's key-value `config` table rows. */
  final case class CompanyInfo(guid: String, name: String,
      booksFrom: String, lastVoucherDate: String)

  def parseCompanyInfo(response: String): Option[CompanyInfo] = {
    val eol = "\",\"†\",\r\n"
    if (!response.endsWith(eol)) None
    else {
      val body = response.dropRight(eol.length).drop(1)
      body.split("\",\"").toSeq match {
        case guid +: name +: from +: to +: _ =>
          Some(CompanyInfo(guid, name, from, to))
        case _ => None
      }
    }
  }

  /** Config-table rows from a company probe (the reference's
    * `config(name, value)` key-value table, src/tally.mts:582-583). */
  def configRows(info: CompanyInfo, timestamp: String): Seq[(String, String)] =
    Seq(
      "Update Timestamp" -> timestamp,
      "Company Name" -> info.name,
      "Period From" -> info.booksFrom,
      "Period To" -> info.lastVoucherDate)

  /** Full extract for canned/test transports: TDL request → transport
    * → XML→TSV → typed DataFrame. `transport` posts the request body
    * and returns the response body (the HTTP/utf-16le mechanics live
    * behind this function — injectable for tests, SURVEY §7.1). */
  def extract(spark: SparkSession, spec: TableSpec,
      transport: String => String,
      fromDate: String = "20230401", toDate: String = "20240331",
      company: Option[String] = None): DataFrame = {
    val tdl = substituteParams(generateTdl(spec, company),
      fromDate, toDate, company)
    tsvToDataFrame(spark, xmlToTsv(transport(tdl)), spec)
  }
}
