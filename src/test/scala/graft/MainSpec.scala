package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flag parsing follows the --parent-child convention") {
    val cfg = Main.parseArgs(Array(
      "--tally-fromdate", "20191001", "--tally-todate", "20191231",
      "--tally-company", "Reliance Industries",
      "--database-schema", "client_reliance",
      "--tally-master", "false"))
    assert(cfg.fromDate == "20191001" && cfg.toDate == "20191231")
    assert(cfg.company.contains("Reliance Industries"))
    assert(cfg.schema == "client_reliance")
    assert(!cfg.syncMaster && cfg.syncTransaction)
  }

  test("replay-mode full sync: YAML spec → TSV replay → parquet warehouse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |      - name: name
        |        field: Name
        |        type: text
        |      - name: opening_balance
        |        field: OpeningBalance
        |        type: amount
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"),
      "guid\tname\topening_balance\r\n" +
        "g1\tCash\t-100.50\r\n" +
        "g2\tSales\t(-)20.00\r\n")
    Main.run(spark, Main.Config(
      technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir)))
    val out = spark.read.parquet(s"$dir/wh/mst_ledger")
    val rows = out.collect().map(r =>
      r.getString(1) -> r.getDecimal(2).doubleValue()).toMap
    assert(rows == Map("Cash" -> -100.5, "Sales" -> -20.0))
  }

  test("multi-company CSV syncs each company into its own schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"), "guid\r\ng1\r\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/config.csv"),
      s"schema,company\n$dir/wh_a,Acme Corp\n$dir/wh_b,Beta Traders\n")
    Main.run(spark, Main.Config(
      technology = "parquet",
      definition = s"$dir/spec.yaml", replayDir = Some(dir),
      companiesCsv = Some(s"$dir/config.csv")))
    assert(spark.read.parquet(s"$dir/wh_a/mst_ledger").count() == 1)
    assert(spark.read.parquet(s"$dir/wh_b/mst_ledger").count() == 1)
  }

  test("tally-truncate false appends instead of clearing (scenario 04)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-app").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"), "guid\r\ny1\r\n")
    val base = Main.Config(technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir))
    Main.run(spark, base) // year 1: normal truncate-sync
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"), "guid\r\ny2\r\n")
    Main.run(spark, base.copy(truncate = false)) // year 2: append
    val got = spark.read.parquet(s"$dir/wh/mst_ledger")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("y1", "y2"))
    Main.run(spark, base) // truncate again: back to one year
    assert(spark.read.parquet(s"$dir/wh/mst_ledger").count() == 1)
  }

  test("parallel full sync writes every table (same result as serial)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-par").toString
    val yaml =
      """master:
        |  - name: mst_a
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |  - name: mst_b
        |    collection: Group
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_a.data"), "guid\r\na1\r\na2\r\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_b.data"), "guid\r\nb1\r\n")
    Main.run(spark, Main.Config(
      technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir), parallel = 2))
    assert(spark.read.parquet(s"$dir/wh/mst_a").count() == 2)
    assert(spark.read.parquet(s"$dir/wh/mst_b").count() == 1)
  }

  test("post-import flag runs a script against the fresh warehouse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-post").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |      - name: name
        |        field: Name
        |        type: text
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"),
      "guid\tname\r\ng1\tCash\r\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/post.sql"),
      "insert into mst_ledger(guid, name) values ('g9', 'Synthetic');")
    Main.run(spark, Main.Config(
      technology = "parquet", schema = s"$dir/wh",
      definition = s"$dir/spec.yaml", replayDir = Some(dir),
      postImport = Some(s"$dir/post.sql")))
    val names = spark.read.parquet(s"$dir/wh/mst_ledger")
      .collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("Cash", "Synthetic"))
  }

  test("server mode: /sync drives a replay sync with overlaid config") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srv").toString
    val yaml =
      """master:
        |  - name: mst_ledger
        |    collection: Ledger
        |    nature: Primary
        |    fields:
        |      - name: guid
        |        field: Guid
        |        type: text
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/spec.yaml"), yaml)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mst_ledger.data"),
      "guid\r\ng1\r\ng2\r\n")
    val srv = Main.startServer(spark, Main.Config(
      definition = s"$dir/spec.yaml", replayDir = Some(dir),
      configFile = s"$dir/config.json", serverPort = Some(0)),
      transportOverride = Some(identity))
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(
            s"http://localhost:${srv.boundPort}$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(post("/sync", s"""{"schema":"$dir/wh"}""") == "Sync started")
      // poll the log endpoint until the in-server sync completes
      val deadline = System.nanoTime() + 60_000_000_000L
      while (!post("/log", "").contains("sync finished") &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(post("/log", "").contains("sync finished"))
      assert(spark.read.parquet(s"$dir/wh/mst_ledger").count() == 2)
    } finally srv.stop()
  }
}
