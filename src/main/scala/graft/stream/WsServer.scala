package graft.stream

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{ServerSocket, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}

import graft.sources.WsFrames

/** C1/C4 — the serve-plane WebSocket endpoint: the reference's
  * `http.HandleFunc("/ws")` upgrade server (server.go:43-86) with its
  * connection hygiene (server.go:148-174) — the live-transport mirror
  * of the ingest side's [[graft.sources.WsClient]], sharing the same
  * RFC 6455 [[WsFrames]] codec.
  *
  * Semantics pinned to the reference:
  *  - `X-API-Key` header required; missing or unknown key refuses the
  *    upgrade with 401 before any WS handshake (server.go:57-67);
  *  - a client may hold several connections; the registry counts them
  *    and unregisters the client with its LAST one (server.go:132-160);
  *  - per-connection read pump enforces a read limit and a read
  *    deadline, any inbound frame (pong included) resetting the
  *    deadline (server.go:162-173);
  *  - a failed fan-out write closes and prunes that connection only
  *    (server.go:117-121).
  *
  * Driver-side by design, like [[Registry]]: this is transport-plane
  * state (live sockets), consulted by the per-tick serving loop — the
  * data plane (snapshot + config transform) stays in DataFrames and is
  * handed over only at the sink boundary ([[WsServer.fanOutSink]]).
  */
final class WsServer(
    auth: String => Option[String],
    val registry: Registry = new Registry,
    port: Int = 0,
    readLimitBytes: Int = 512,
    readDeadlineMs: Int = 60000,
    serverSocket: Option[ServerSocket] = None) {

  /** One upgraded connection: socket + synchronized unmasked writes
    * (servers MUST NOT mask — RFC 6455 §5.1).
    */
  private final class Conn(val clientId: String, socket: Socket) {
    val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    def send(op: Int, payload: Array[Byte]): Unit =
      synchronized { WsFrames.write(out, op, payload, None) }
    def sendText(s: String): Unit = send(WsFrames.OpText, s.getBytes(UTF_8))
    def close(): Unit = {
      try send(WsFrames.OpClose, Array.emptyByteArray)
      catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
    def setReadDeadline(): Unit =
      try socket.setSoTimeout(readDeadlineMs) catch { case _: Exception => () }
  }

  // wss:// is the same protocol over a TLS listener: pass the socket
  // from [[WsServer.tlsServerSocket]] (the server-side mirror of
  // [[graft.sources.WsTls.clientSocketFactory]])
  private val server = serverSocket.getOrElse(new ServerSocket(port))
  /** Bound port — pass `port = 0` for an ephemeral one (tests). */
  def boundPort: Int = server.getLocalPort

  private val conns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Conn]()
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handleConnection(s), "graft-ws-serve-conn")
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () } // closed during stop()
    }
  }, "graft-ws-serve-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Read HTTP request head lines up to the blank line. */
  private def readHead(in: java.io.InputStream): Seq[String] = {
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0) throw new IOException("connection closed during upgrade")
      sb.append(b.toChar)
      if (sb.length > 16384) throw new IOException("oversized request head")
    }
    sb.result().split("\r\n").toSeq
  }

  private def header(head: Seq[String], name: String): Option[String] =
    head.collectFirst {
      case l if l.toLowerCase.startsWith(name.toLowerCase + ":") =>
        l.split(":", 2)(1).trim
    }

  /** The upgrade path (server.go:54-86): auth BEFORE upgrade, 401 on
    * missing/unknown key, then the 101 handshake, registration, and
    * the connection's read pump.
    */
  private def handleConnection(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    // a handshake that stalls must not pin the thread forever
    socket.setSoTimeout(math.max(readDeadlineMs, 1000))
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    def reject(status: String): Unit = {
      try {
        out.write(s"HTTP/1.1 $status\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
        out.flush()
      } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
    try {
      val head = readHead(in)
      val clientId = header(head, "X-API-Key") match {
        case None => reject("401 Unauthorized"); return
        case Some(key) => auth(key) match {
          case None => reject("401 Unauthorized"); return
          case Some(id) => id
        }
      }
      val wsKey = header(head, "Sec-WebSocket-Key") match {
        case None => reject("400 Bad Request"); return
        case Some(k) => k
      }
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${WsFrames.acceptKey(wsKey)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val conn = new Conn(clientId, socket)
      conns.add(conn)
      registry.connect(clientId)
      readPump(conn)
    } catch {
      case _: Exception => try socket.close() catch { case _: Exception => () }
    }
  }

  /** Per-connection inbound loop (server.go:148-174): enforces the
    * read limit and deadline, answers pings, and prunes the connection
    * on close/EOF/deadline. SO_TIMEOUT is re-armed per frame, so ANY
    * inbound traffic — pongs included — extends the deadline, exactly
    * the reference's pong-handler-resets-deadline contract. The read
    * limit is enforced by the codec on the frame's DECLARED length
    * (before buffering — an authenticated peer must not be able to
    * force a multi-GB allocation per frame), surfacing as the
    * IOException that prunes the connection.
    */
  private def readPump(conn: Conn): Unit = {
    try {
      var open = true
      while (open && running) {
        conn.setReadDeadline()
        WsFrames.read(conn.in, readLimitBytes) match {
          case None => open = false
          case Some((_, op, payload)) =>
            op match {
              case WsFrames.OpPing => conn.send(WsFrames.OpPong, payload)
              case WsFrames.OpClose => open = false
              case _ => () // inbound text/binary/pong: serve plane ignores
            }
        }
      }
    } catch {
      case _: SocketTimeoutException => () // dead peer: deadline expired
      case _: IOException => () // EOF mid-frame or read-limit violation
    } finally prune(conn)
  }

  private def prune(conn: Conn): Unit =
    if (conns.remove(conn)) { // idempotent: pump + failed write can race
      conn.close()
      registry.disconnect(conn.clientId)
    }

  /** Fan one tick's payloads out to the addressed clients' live
    * connections (server.go:106-127): every connection of client `c`
    * receives every payload keyed `c`, and a write failure closes and
    * prunes THAT connection only.
    */
  def broadcast(payloadsByClient: Map[String, Seq[String]]): Unit =
    conns.forEach { conn =>
      payloadsByClient.get(conn.clientId).foreach { msgs =>
        try msgs.foreach(conn.sendText)
        catch { case _: IOException => prune(conn) }
      }
    }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
    conns.forEach(c => prune(c))
  }
}

object WsServer {

  /** TLS listener for a wss:// serve endpoint: server identity from a
    * PKCS12/JKS keystore (file extension picks the type, keytool's
    * convention — same rule as the ingest side's trust-store loader).
    */
  def tlsServerSocket(keyStore: String, password: String,
      port: Int = 0): ServerSocket = {
    val ks = java.security.KeyStore.getInstance(
      if (keyStore.endsWith(".jks")) "JKS" else "PKCS12")
    val is = new java.io.FileInputStream(keyStore)
    try ks.load(is, password.toCharArray) finally is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx.getServerSocketFactory.createServerSocket(port)
  }

  /** [[Broadcast.start]] sink that JSON-encodes each served row and
    * fans it out over the server's live connections — the reference
    * broadcaster's `WriteJSON` per item per conn (server.go:106-127).
    *
    * The per-tick `collect()` is the serve plane's OWN semantic, not
    * an analytics anti-pattern: the reference materializes the full
    * snapshot every tick (`GetAllData`, server.go:99) and pushes it
    * down each socket; sockets live on the driver, so the transformed
    * snapshot (bounded: live symbols × connected clients) must land
    * there. The analytics path never does this.
    */
  def fanOutSink(server: WsServer, clientCol: String = "client_id")
      : (DataFrame, Long) => Unit = (df, _) => {
    val payloadCols = df.columns.filterNot(_ == clientCol).toIndexedSeq
    val rows = df.select(col(clientCol).cast("string").as("_c"),
      to_json(struct(payloadCols.map(col): _*)).as("_j")).collect()
    server.broadcast(rows.groupBy(_.getString(0)).map {
      case (c, rs) => c -> rs.toSeq.map(_.getString(1))
    })
  }
}
