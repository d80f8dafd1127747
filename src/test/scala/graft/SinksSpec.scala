package graft

import graft.functions.TallyTypes._
import graft.sources.{FieldSpec, Sinks, TableSpec, TallyXml}
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test(".data artifact: header + TSV with sentinel/boolean text forms") {
    val df = Seq(("g1", true, null.asInstanceOf[java.sql.Date]))
      .toDF("guid", "is_revenue", "d")
    val content = Sinks.dataFileContent(df, Seq(TText, TLogical, TDate))
    assert(content == "guid\tis_revenue\td\r\ng1\t1\tñ")
  }

  test("insert statements: dialect quoting, date sentinel, batching") {
    val tsv = "guid\tname\tamount\td\r\n" +
      "g1\tO'Brien \\ Co\t10.50\t20200401\r\n" +
      "g2\tCafé\t-3.00\tñ"
    val types = Seq(TText, TText, TAmount, TDate)

    val my = Sinks.insertStatements("mst_ledger", tsv, types, "mysql")
    assert(my == Seq("insert into mst_ledger (guid,name,amount,d) values" +
      "('g1','O''Brien \\\\ Co',10.50,'20200401')," +
      "('g2','Café',-3.00,NULL);"))

    val ms = Sinks.insertStatements("mst_ledger", tsv, types, "mssql")
    // unicode text gets the N prefix; backslash stays single
    assert(ms.head.contains("'O''Brien \\ Co'"))
    assert(ms.head.contains("N'Café'"))

    // 2500 rows split at the 1000-row bound
    val many = ("guid" +: (1 to 2500).map(i => s"g$i")).mkString("\r\n")
    val batches = Sinks.insertStatements("t", many, Seq(TText), "postgres")
    assert(batches.size == 3)
    assert(batches.forall(s => s.startsWith("insert into t (guid) values(") &&
      s.endsWith(");")))
    assert(batches.map(_.count(_ == '(')).sum == 2503) // 2500 rows + 3 headers

    // the ~50k-char budget splits before the row bound
    val fat = ("name" +: (1 to 200).map(i => "x" * 400 + i)).mkString("\r\n")
    val fatBatches = Sinks.insertStatements("t", fat, Seq(TText), "postgres")
    assert(fatBatches.size > 1)
    assert(fatBatches.forall(_.length <= Sinks.MaxQueryChars + 410))
  }

  test("load commands match the reference's file-load invocations") {
    assert(Sinks.loadCommand("mysql", "mst_ledger", "./csv/mst_ledger.data") ==
      "load data local infile './csv/mst_ledger.data' into table " +
        "mst_ledger fields terminated by ',' enclosed by '\"' escaped " +
        "by '' lines terminated by '\\r\\n' ignore 1 lines ;")
    assert(Sinks.loadCommand("postgres", "trn_voucher", "x") ==
      "copy trn_voucher from stdin csv header;")
    assert(Sinks.loadCommand("mssql", "t", "p").contains("bulk"))
    assert(Sinks.loadCommand("bigquery", "t", "p").contains("skipLeadingRows=1"))
    intercept[IllegalArgumentException](Sinks.loadCommand("oracle", "t", "p"))
  }

  // ---- loader-grammar round trips (round-11 verdict #7) -----------
  //
  // The sandbox has no MySQL/Postgres (and no H2 jar in the offline
  // cache), so the statement/file paths cannot execute against a live
  // engine. What CAN execute is the other half of the contract: the
  // documented parse grammar each loader applies to our bytes. These
  // strict readers implement exactly the grammar the emitted load
  // command declares (MySQL LOAD DATA `enclosed by '"' escaped by ''
  // lines terminated by '\r\n' ignore 1 lines`; Postgres COPY csv
  // header; the dialects' string-literal rules for the INSERT path)
  // and must decode our emitted artifacts back to the source values —
  // a quoting/escaping bug on either side fails the round trip.

  /** MySQL LOAD DATA reader for the exact options loadCommand emits:
    * ',' separators, '"' enclosure (doubled enclosure char = literal),
    * NO escape character, '\r\n' record terminators (literal inside an
    * enclosed field), first line skipped. */
  private def parseMysqlLoadData(content: String): Seq[Seq[String]] = {
    val recs = Seq.newBuilder[Seq[String]]
    val fields = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0; var inQ = false; var wasQuoted = false
    def endField(): Unit = { fields += cur.toString; cur.clear(); wasQuoted = false }
    def endRec(): Unit = { endField(); recs += fields.result(); fields.clear() }
    while (i < content.length) {
      val c = content.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < content.length && content.charAt(i + 1) == '"') {
            cur += '"'; i += 1
          } else inQ = false
        } else cur += c
      } else c match {
        case '"' if cur.isEmpty && !wasQuoted => inQ = true; wasQuoted = true
        case ',' => endField()
        case '\r' if i + 1 < content.length && content.charAt(i + 1) == '\n' =>
          endRec(); i += 1
        case other => cur += other
      }
      i += 1
    }
    if (cur.nonEmpty || wasQuoted || fields.result().nonEmpty) endRec()
    recs.result().drop(1) // ignore 1 lines
  }

  /** Postgres COPY ... CSV HEADER reader: RFC-style '"' quoting with
    * doubling, quoted fields may hold separators/newlines, header row
    * skipped. Same state machine as MySQL's here BECAUSE the two
    * grammars coincide for these options — the point of emitting one
    * CSV body for both loaders. */
  private def parsePgCopyCsv(content: String): Seq[Seq[String]] =
    parseMysqlLoadData(content)

  /** Decode dialect INSERT statements back to row values: splits the
    * VALUES tuples, unescapes string literals ('' → ', MySQL \\ → \,
    * MSSQL N'' prefix), maps NULL, passes numerics bare — the reverse
    * of Sinks.insertStatements, per the dialects' documented literal
    * rules. */
  private def decodeInsertStatements(stmts: Seq[String],
      dialect: String): Seq[Seq[Option[String]]] = {
    val rows = Seq.newBuilder[Seq[Option[String]]]
    stmts.foreach { st =>
      val body = st.substring(st.indexOf("values") + 6).stripSuffix(";")
      var i = 0
      while (i < body.length) {
        assert(body.charAt(i) == '(', s"expected '(' at $i in $body")
        i += 1
        val vals = Seq.newBuilder[Option[String]]
        var rowDone = false
        while (!rowDone) {
          if (dialect == "mssql" && body.charAt(i) == 'N' &&
            i + 1 < body.length && body.charAt(i + 1) == '\'') i += 1
          if (body.charAt(i) == '\'') {
            i += 1
            val sb = new StringBuilder
            var closed = false
            while (!closed) body.charAt(i) match {
              case '\'' if i + 1 < body.length && body.charAt(i + 1) == '\'' =>
                sb += '\''; i += 2
              case '\'' => closed = true; i += 1
              case '\\' if dialect == "mysql" &&
                  i + 1 < body.length && body.charAt(i + 1) == '\\' =>
                sb += '\\'; i += 2
              case c => sb += c; i += 1
            }
            vals += Some(sb.toString)
          } else {
            val sb = new StringBuilder
            while (body.charAt(i) != ',' && body.charAt(i) != ')') {
              sb += body.charAt(i); i += 1
            }
            vals += (if (sb.toString == "NULL") None else Some(sb.toString))
          }
          body.charAt(i) match {
            case ',' => i += 1
            case ')' =>
              rowDone = true; i += 1
              if (i < body.length && body.charAt(i) == ',') i += 1
          }
        }
        rows += vals.result()
      }
    }
    rows.result()
  }

  test("MySQL LOAD DATA + PG COPY grammars round-trip the emitted CSV") {
    import graft.sources.Emitters
    // edge rows: quotes, commas, embedded newline (legal inside an
    // enclosed field under BOTH grammars), non-ASCII, empty string,
    // null date sentinel (emits as empty — the reference strips ñ
    // globally in file mode, database.mts:64, and csvLines mirrors it)
    import java.sql.Date
    val df = Seq(
      ("g1", "says \"hi\"", Date.valueOf("2020-04-01")),
      ("g2", "a,b,c", null.asInstanceOf[Date]),
      ("g3", "line1\nline2", Date.valueOf("2021-03-31")),
      ("g4", "Café €", Date.valueOf("2020-01-01")),
      ("g5", "", Date.valueOf("2020-01-02"))).toDF("guid", "note", "d")
    val types = Seq(TText, TText, TDate)
    val content = Emitters.csvFileContent(df, types)
    // grammar coincidence: one staged file serves both loaders
    val viaMysql = parseMysqlLoadData(content)
    val viaPg = parsePgCopyCsv(content)
    assert(viaMysql == viaPg)
    val expected = Seq(
      Seq("g1", "says \"hi\"", "2020-04-01"),
      Seq("g2", "a,b,c", ""),
      Seq("g3", "line1\nline2", "2021-03-31"),
      Seq("g4", "Café €", "2020-01-01"),
      Seq("g5", "", "2020-01-02"))
    assert(viaMysql.sortBy(_.head) == expected,
      s"decoded ${viaMysql.sortBy(_.head)}")
  }

  test("INSERT statements round-trip under each dialect's literal rules") {
    val tsv = "guid\tname\tamount\td\r\n" +
      "g1\tO'Brien \\ Co\t10.50\t20200401\r\n" +
      "g2\tCafé \"quoted\"\t-3.00\tñ\r\n" +
      "g3\t\t0.00\t20210101"
    val types = Seq(TText, TText, TAmount, TDate)
    val want = Seq(
      Seq(Some("g1"), Some("O'Brien \\ Co"), Some("10.50"), Some("20200401")),
      Seq(Some("g2"), Some("Café \"quoted\""), Some("-3.00"), None),
      Seq(Some("g3"), Some(""), Some("0.00"), Some("20210101")))
    for (dialect <- Seq("mysql", "postgres", "mssql")) {
      val stmts = Sinks.insertStatements("t", tsv, types, dialect)
      assert(decodeInsertStatements(stmts, dialect) == want,
        s"dialect $dialect decoded differently")
    }
    // batching preserves content: 2500 rows reassemble exactly
    val many = ("guid" +: (1 to 2500).map(i => s"g$i")).mkString("\r\n")
    val batched = Sinks.insertStatements("t", many, Seq(TText), "mysql")
    assert(decodeInsertStatements(batched, "mysql") ==
      (1 to 2500).map(i => Seq(Some(s"g$i"))))
  }

  test("CDM model.json: entities, type mapping, partitions") {
    val spec = TableSpec("mst_ledger", "Ledger", "Primary", Seq(
      FieldSpec("guid", "Guid", TText),
      FieldSpec("is_revenue", "IsRevenue", TLogical),
      FieldSpec("opening", "OpeningBalance", TAmount),
      FieldSpec("created", "CreatedDate", TDate)))
    val json = Sinks.cdmModelJson("acme", "mystore", Seq(spec))
    // valid JSON with the reference's type mapping
    val parsed = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](json)
    assert(parsed.get("name") == "acme")
    val entity = parsed.get("entities")
      .asInstanceOf[java.util.List[java.util.Map[String, Any]]].get(0)
    assert(entity.get("name") == "mst_ledger")
    val attrs = entity.get("attributes")
      .asInstanceOf[java.util.List[java.util.Map[String, Any]]]
    val types = (0 until attrs.size).map(i =>
      attrs.get(i).get("name") -> attrs.get(i).get("dataType")).toMap
    assert(types == Map("guid" -> "string", "is_revenue" -> "Int64",
      "opening" -> "decimal", "created" -> "date"))
    assert(entity.get("partitions").asInstanceOf[java.util.List[_]].size == 1)
    assert(json.contains("https://mystore.dfs.core.windows.net/tally/acme/mst_ledger.csv"))
  }

  test("AlterId probe: TDL shape, response parse, closed-company case") {
    val tdl = TallyXml.alterIdProbeTdl(Some("A & B"))
    assert(tdl.contains("$AltMstId") && tdl.contains("$AltVchId"))
    assert(tdl.contains("\"A &amp; B\""))
    assert(TallyXml.parseAlterIds("\"1234\",\"567\"\r\n")
      .contains((1234L, 567L)))
    assert(TallyXml.parseAlterIds("").isEmpty)
    assert(TallyXml.parseAlterIds("\"x\",\"y\"").contains((0L, 0L)))
  }

  test("company-info probe parse + config rows") {
    val resp = "\"guid-1\",\"Acme Ltd\",\"20200401\",\"20210331\",\"†\",\r\n"
    val info = TallyXml.parseCompanyInfo(resp)
    assert(info.contains(TallyXml.CompanyInfo(
      "guid-1", "Acme Ltd", "20200401", "20210331")))
    val rows = TallyXml.configRows(info.get, "2026-08-12 00:00:00")
    assert(rows.toMap.apply("Company Name") == "Acme Ltd")
    assert(rows.toMap.apply("Period From") == "20200401")
    assert(TallyXml.parseCompanyInfo("").isEmpty)
  }
}
