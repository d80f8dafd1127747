package graft.server

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** Minimal server-side WebSocket (RFC 6455) for pushing sync log lines
  * — the functional twin of the reference's `ws` server on its own
  * port next to the HTTP port (src/server.mts:8, 13-15, 35-39: log
  * messages broadcast to every client, `~` on sync completion). The
  * JDK ships a WebSocket CLIENT but no server, and this build takes no
  * third-party deps, so the server side is implemented directly: the
  * upgrade handshake (Sec-WebSocket-Accept = base64(SHA-1(key+GUID)))
  * plus unmasked server→client text frames — the only direction the
  * log stream uses. Client frames are never read (the log console
  * doesn't speak), which keeps the loop push-only and stateless.
  *
  * Loopback-bound like the HTTP server, daemon accept thread, ephemeral
  * port by default (tests); `boundPort` reports the real port and the
  * GUI discovers it via the HTTP `/ws-port` endpoint. */
final class LogWebSocket(port: Int = 0, bindHost: String = "127.0.0.1") {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(bindHost, port))
  private val clients =
    new java.util.concurrent.CopyOnWriteArrayList[Socket]
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        if (handshake(s)) clients.add(s) else s.close()
      } catch {
        case _: Exception => () // closed socket on stop(), or a bad peer
      }
    }
  }, "graft-ws-accept")
  acceptor.setDaemon(true)

  /** Read the HTTP upgrade request, answer 101 with the accept hash.
    * Returns false (caller closes) when the peer isn't a WebSocket
    * upgrade. */
  private def handshake(s: Socket): Boolean = {
    val in = new BufferedReader(new InputStreamReader(
      s.getInputStream, StandardCharsets.ISO_8859_1))
    var key: String = null
    var line = in.readLine()
    while (line != null && line.nonEmpty) {
      if (line.toLowerCase.startsWith("sec-websocket-key:"))
        key = line.substring("sec-websocket-key:".length).trim
      line = in.readLine()
    }
    if (key == null) false
    else {
      // the protocol's fixed GUID (RFC 6455 §1.3)
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
            .getBytes(StandardCharsets.US_ASCII)))
      val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n"
      s.getOutputStream.write(resp.getBytes(StandardCharsets.US_ASCII))
      s.getOutputStream.flush()
      true
    }
  }

  /** One unmasked FIN text frame (server→client frames are unmasked by
    * the RFC; only clients mask). */
  private def frame(msg: String): Array[Byte] = {
    val payload = msg.getBytes(StandardCharsets.UTF_8)
    val n = payload.length
    val header =
      if (n < 126) Array[Byte](0x81.toByte, n.toByte)
      else if (n < 65536) Array[Byte](0x81.toByte, 126,
        (n >> 8).toByte, n.toByte)
      else Array[Byte](0x81.toByte, 127, 0, 0, 0, 0,
        (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte, n.toByte)
    header ++ payload
  }

  /** Push a text message to every connected client; a dead peer is
    * dropped, never propagated (the reference's wsClient.send loop has
    * the same fire-and-forget semantics). */
  def broadcast(msg: String): Unit = {
    val bytes = frame(msg)
    clients.forEach { c =>
      try {
        c.getOutputStream.write(bytes)
        c.getOutputStream.flush()
      } catch {
        case _: Exception => clients.remove(c); try c.close() catch {
          case _: Exception => ()
        }
      }
    }
  }

  def boundPort: Int = server.getLocalPort
  def start(): Unit = acceptor.start()
  def stop(): Unit = {
    running = false
    clients.forEach(c => try c.close() catch { case _: Exception => () })
    try server.close() catch { case _: Exception => () }
  }
}
