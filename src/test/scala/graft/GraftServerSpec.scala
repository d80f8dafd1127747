package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CountDownLatch

import graft.server.GraftServer
import org.scalatest.funsuite.AnyFunSuite

class GraftServerSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String = ""): String =
    client.send(
      HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def withServer(transport: String => String = _ => "",
      sync: Map[String, String] => Unit = _ => ())(
      f: (GraftServer, Int) => Unit): Unit = {
    val cfg = java.nio.file.Files.createTempFile("graftcfg", ".json")
    java.nio.file.Files.write(cfg, """{"server":"localhost"}""".getBytes)
    val srv = new GraftServer(0, transport, sync, cfg)
    srv.start()
    try f(srv, srv.boundPort) finally srv.stop()
  }

  test("tally-status relays the transport response; '' on failure") {
    withServer(transport = p => { assert(p == ""); "<RESPONSE>ok</RESPONSE>" }) {
      (_, port) => assert(post(port, "/tally-status", "{}") ==
        "<RESPONSE>ok</RESPONSE>")
    }
    withServer(transport = _ => throw new RuntimeException("down")) {
      (_, port) => assert(post(port, "/tally-status", "{}") == "")
    }
  }

  test("list-company posts the Company-collection TDL probe") {
    var seen = ""
    withServer(transport = p => { seen = p; "<DATA><ROW>Acme</ROW></DATA>" }) {
      (_, port) =>
        assert(post(port, "/list-company", "{}") ==
          "<DATA><ROW>Acme</ROW></DATA>")
        assert(seen.contains("<TYPE>Company</TYPE>"))
        assert(seen.contains("<SET>$Name</SET>"))
    }
  }

  test("sync guard, abort, and log polling") {
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    var interrupted = false
    withServer(sync = cfg => {
      assert(cfg("server") == "localhost")
      started.countDown()
      try release.await()
      catch { case _: InterruptedException => interrupted = true; throw new InterruptedException }
    }) { (srv, port) =>
      srv.log("boot")
      assert(post(port, "/sync", """{"server":"localhost"}""") == "Sync started")
      started.await()
      assert(post(port, "/sync", "{}") == "Sync is already running")
      assert(post(port, "/log") == "boot")
      assert(post(port, "/log?from=1") == "")
      assert(post(port, "/abort") == "Process killed")
      // the interrupted job logs its abort; poll until the thread dies
      val deadline = System.nanoTime() + 5_000_000_000L
      while (!interrupted && System.nanoTime() < deadline) Thread.sleep(10)
      assert(interrupted)
      assert(post(port, "/abort") == "Could not kill process")
    }
  }

  test("config load/save round-trip") {
    withServer() { (_, port) =>
      assert(post(port, "/loadconfig") == """{"server":"localhost"}""")
      assert(post(port, "/saveconfig", """{"server":"remote"}""") ==
        "Config saved")
      assert(post(port, "/loadconfig") == """{"server":"remote"}""")
    }
  }

  private def get(port: Int, path: String): String =
    client.send(
      HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("GET / serves the GUI and the page's own flow drives /sync end-to-end") {
    val started = new CountDownLatch(1)
    var syncedCfg: Map[String, String] = Map.empty
    withServer(transport = p =>
      if (p.contains("<TYPE>Company</TYPE>")) "<DATA><ROW>Acme Ltd</ROW></DATA>"
      else "<RESPONSE>up</RESPONSE>",
      sync = cfg => { syncedCfg = cfg; started.countDown() }) { (srv, port) =>
      val page = get(port, "/")
      // the served page is the real GUI: config form + console
      assert(page.contains("id=\"database_technology\""))
      assert(page.contains("id=\"tally_server\""))
      assert(page.contains("id=\"console\""))
      // every endpoint the page's JS fetches must be live on this
      // server — the page can't reference a route we don't serve
      val fetched = "fetch\\('([^'?]+)".r.findAllMatchIn(page)
        .map(_.group(1)).toSet
      assert(fetched == Set("/loadconfig", "/saveconfig", "/sync",
        "/abort", "/tally-status", "/list-company", "/log", "/ws-port"))
      // drive the page's exact flow over those endpoints:
      assert(get(port, "/loadconfig").contains("localhost")) // loadConfig()
      val formCfg =                                          // configFromForm()
        """{"database":{"technology":"mssql","server":"db","port":1433},
          |"tally":{"server":"tallyhost","port":9000}}""".stripMargin
      assert(post(port, "/saveconfig", formCfg) == "Config saved")
      assert(post(port, "/list-company", formCfg)            // listCompanies()
        .contains("<ROW>Acme Ltd</ROW>"))
      assert(post(port, "/tally-status", "").nonEmpty)       // tallyStatus()
      assert(post(port, "/sync", formCfg) == "Sync started") // startSync()
      started.await()
      assert(syncedCfg("tally.server") == "tallyhost")
      srv.log("EXTRACT mst_ledger 10 rows")
      assert(get(port, "/log?from=0")                        // startPolling()
        .contains("EXTRACT mst_ledger"))
      get(port, "/abort")                                    // abortSync()
    }
  }

  test("WebSocket stream pushes a sync's log lines and the '~' terminator") {
    // functional parity with the reference's ws server
    // (src/server.mts:8,13-15,35-39): connect with the JDK's own
    // WebSocket CLIENT (so the handshake + framing are validated by an
    // independent implementation), run a sync, and receive its log
    // lines pushed — no polling — then '~' when the sync ends
    var srvRef: GraftServer = null
    withServer(sync = _ => {
      srvRef.log("EXTRACT mst_ledger 10 rows")
      srvRef.log("LOAD mst_ledger")
    }) { (srv, port) =>
      srvRef = srv
      val wsPort = get(port, "/ws-port").toInt
      assert(wsPort > 0)
      val messages = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        override def onText(ws: java.net.http.WebSocket,
            data: CharSequence, last: Boolean)
            : java.util.concurrent.CompletionStage[_] = {
          messages.add(data.toString)
          ws.request(1)
          null
        }
      }
      val sock = client.newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:$wsPort/"), listener)
        .join()
      try {
        assert(post(port, "/sync", """{"server":"localhost"}""") ==
          "Sync started")
        def next(): String = {
          val m = messages.poll(10, java.util.concurrent.TimeUnit.SECONDS)
          assert(m != null, "no WebSocket message within 10s")
          m
        }
        assert(next() == "EXTRACT mst_ledger 10 rows")
        assert(next() == "LOAD mst_ledger")
        assert(next() == "~")
        // the poll fallback saw the same lines (minus the marker)
        assert(post(port, "/log") ==
          "EXTRACT mst_ledger 10 rows\nLOAD mst_ledger")
      } finally sock.abort()
    }
  }

  test("flat json config parsing handles strings, numbers, booleans") {
    withServer() { (srv, _) =>
      assert(srv.flatJson(
        """{"server":"h","port":9000,"master":true,"from":"20230401"}""") ==
        Map("server" -> "h", "port" -> "9000", "master" -> "true",
          "from" -> "20230401"))
    }
  }

  test("nested reference config.json keys stay section-qualified") {
    withServer() { (srv, _) =>
      // the reference config.json shape: database AND tally both carry
      // server/port — a flat collapse would shadow one with the other
      val m = srv.flatJson(
        """{"database":{"technology":"mssql","server":"db-host","port":1433,
          |"schema":"tallydb"},
          |"tally":{"server":"tally-host","port":9000,"fromdate":"20240401",
          |"company":""}}""".stripMargin)
      assert(m("tally.server") == "tally-host" && m("tally.port") == "9000")
      assert(m("database.server") == "db-host" && m("database.port") == "1433")
      assert(m("database.schema") == "tallydb")
      assert(!m.contains("server")) // no ambiguous bare key survives
      // and Main.merged picks the tally section for the connection
      val cfg = graft.Main.merged(graft.Main.Config(), m)
      assert(cfg.server == "tally-host" && cfg.port == 9000)
      assert(cfg.technology == "mssql" && cfg.schema == "tallydb")
      assert(cfg.fromDate == "20240401" && cfg.company.isEmpty)
    }
  }
}
