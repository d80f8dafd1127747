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
