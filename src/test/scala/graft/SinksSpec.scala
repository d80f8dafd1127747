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
