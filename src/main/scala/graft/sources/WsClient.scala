package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Minimal blocking WebSocket text client (RFC 6455): HTTP/1.1 upgrade
  * handshake with caller-supplied headers (the reference feed
  * authenticates with `x-api-key` — ingestor.go:46-49), masked
  * client→server frames, transparent ping→pong, fragmented-message
  * reassembly, close handshake.
  *
  * Implemented on raw `java.net.Socket` because the container's
  * classpath ships no WS library — and the protocol surface a feed
  * consumer needs (text frames + control frames) is small.
  *
  * wss:// is the same protocol over a TLS socket: pass an
  * `SSLSocketFactory` (see [[WsTls.clientSocketFactory]] for the
  * default-trust and private-trust-store variants). Extension
  * negotiation (permessage-deflate) is not offered, so servers must
  * reply without extensions per RFC 6455 §9.1.
  *
  * Construction is TWO-PHASE: the constructor only opens the TCP (or
  * TLS) connection — bounded by `connectTimeoutMs` — and the blocking
  * upgrade I/O lives in [[handshake]], so a supervisor can register
  * the instance (making its `close()` reachable) BEFORE any unbounded
  * read starts. Use `WsClient.connect(...)` for the plain
  * construct-and-handshake case.
  */
final class WsClient(host: String, port: Int, path: String = "/",
    headers: Map[String, String] = Map.empty, connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 0,
    socketFactory: Option[javax.net.SocketFactory] = None) {

  private val socket =
    socketFactory.getOrElse(javax.net.SocketFactory.getDefault).createSocket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setTcpNoDelay(true)
  // a dead peer with no TCP FIN (pulled cable, frozen server) blocks a
  // plain read forever; a read timeout turns it into an IOException the
  // reconnect loop handles like any other disconnect (the reference
  // gets the same protection from its read deadline, server.go:162-166)
  if (readTimeoutMs > 0) socket.setSoTimeout(readTimeoutMs)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  // Mask keys need only be per-frame-distinct, not cryptographic
  // (RFC 6455 §10.3 masking exists to defeat proxy cache poisoning).
  private val maskRng = new java.util.Random(System.nanoTime())

  /** HTTP upgrade handshake (call exactly once, before read/send). The
    * handshake reads always run under a BOUNDED soTimeout — even when
    * `readTimeoutMs = 0` the bound is `connectTimeoutMs` — so a server
    * that accepts the TCP connection and then stalls cannot hang the
    * calling thread forever (the steady-state read timeout is restored
    * afterwards). Failure closes the socket and throws.
    */
  def handshake(): WsClient = {
    if (readTimeoutMs <= 0) socket.setSoTimeout(connectTimeoutMs)
    val keyBytes = new Array[Byte](16)
    maskRng.nextBytes(keyBytes)
    val wsKey = Base64.getEncoder.encodeToString(keyBytes)
    val allHeaders = Seq(
      "Host" -> s"$host:$port",
      "Upgrade" -> "websocket",
      "Connection" -> "Upgrade",
      "Sec-WebSocket-Key" -> wsKey,
      "Sec-WebSocket-Version" -> "13") ++ headers.toSeq
    val req = s"GET $path HTTP/1.1\r\n" +
      allHeaders.map { case (k, v) => s"$k: $v" }.mkString("\r\n") + "\r\n\r\n"
    out.write(req.getBytes(UTF_8))
    out.flush()
    val head = readHttpHead()
    val status = head.headOption.getOrElse("")
    if (!status.contains(" 101 ")) {
      socket.close()
      throw new java.io.IOException(s"WebSocket upgrade refused: '$status'")
    }
    val accept = head.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-accept:") =>
        l.split(":", 2)(1).trim
    }
    if (!accept.contains(WsFrames.acceptKey(wsKey))) {
      socket.close()
      throw new java.io.IOException("bad Sec-WebSocket-Accept from server")
    }
    // RFC 6455 §4.1 steps 4+6: a server accepting an extension or
    // subprotocol the client never offered MUST fail the connection —
    // e.g. permessage-deflate frames would arrive compressed and be
    // silently unreadable by this client
    Seq("sec-websocket-extensions", "sec-websocket-protocol").foreach { h =>
      val v = head.collectFirst {
        case l if l.toLowerCase.startsWith(h + ":") => l.split(":", 2)(1).trim
      }
      if (v.exists(_.nonEmpty)) {
        socket.close()
        throw new java.io.IOException(s"server negotiated unrequested $h: '${v.get}'")
      }
    }
    // restore the steady-state timeout (0 = block; disconnects surface
    // via close()/FIN, or via readTimeoutMs when configured)
    if (readTimeoutMs <= 0)
      try socket.setSoTimeout(0) catch { case _: Exception => () }
    this
  }

  private def readHttpHead(): Seq[String] = {
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0)
        throw new java.io.IOException("connection closed during WS handshake")
      sb.append(b.toChar)
    }
    sb.result().split("\r\n").toSeq
  }

  private def newMask(): Array[Byte] = {
    val m = new Array[Byte](4); maskRng.nextBytes(m); m
  }

  /** Send one masked text frame. */
  def sendText(s: String): Unit = synchronized {
    WsFrames.write(out, WsFrames.OpText, s.getBytes(UTF_8), Some(newMask()))
  }

  /** Next complete text message: answers pings, skips binary, reassembles
    * fragments; None once the server closes (close frame or EOF).
    */
  def readText(): Option[String] = {
    val acc = new java.io.ByteArrayOutputStream()
    var accText = false
    var result: Option[String] = null
    while (result == null) {
      WsFrames.read(in) match {
        case None => result = None
        case Some((fin, op, payload)) => op match {
          case WsFrames.OpPing =>
            synchronized { WsFrames.write(out, WsFrames.OpPong, payload, Some(newMask())) }
          case WsFrames.OpPong => ()
          case WsFrames.OpClose =>
            try synchronized {
              WsFrames.write(out, WsFrames.OpClose, Array.emptyByteArray, Some(newMask()))
            } catch { case _: Exception => () }
            result = None
          case WsFrames.OpText | WsFrames.OpBinary =>
            acc.reset(); acc.write(payload)
            accText = op == WsFrames.OpText
            if (fin && accText) result = Some(new String(acc.toByteArray, UTF_8))
          case WsFrames.OpContinuation =>
            acc.write(payload)
            if (fin && accText) result = Some(new String(acc.toByteArray, UTF_8))
          case _ => () // unknown opcode: skip
        }
      }
    }
    result
  }

  def close(): Unit = {
    try synchronized {
      WsFrames.write(out, WsFrames.OpClose, Array.emptyByteArray, Some(newMask()))
    } catch { case _: Exception => () }
    try socket.close() catch { case _: Exception => () }
  }
}

object WsClient {
  /** Construct and handshake in one call — the common case when no
    * supervisor needs to see the instance between connect and upgrade.
    */
  def connect(host: String, port: Int, path: String = "/",
      headers: Map[String, String] = Map.empty, connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 0,
      socketFactory: Option[javax.net.SocketFactory] = None): WsClient =
    new WsClient(host, port, path, headers, connectTimeoutMs, readTimeoutMs,
      socketFactory).handshake()
}

/** TLS plumbing for wss:// feeds. */
object WsTls {
  /** Client socket factory: the platform default trust store, or a
    * caller-supplied PKCS12/JKS trust store (private CAs, self-signed
    * feed endpoints — the file extension picks the keystore type,
    * `.jks` ⇒ JKS, anything else ⇒ PKCS12, keytool's default).
    */
  def clientSocketFactory(trustStore: Option[String],
      password: Option[String]): javax.net.SocketFactory =
    trustStore match {
      case None => javax.net.ssl.SSLSocketFactory.getDefault
      case Some(p) =>
        val ks = java.security.KeyStore.getInstance(
          if (p.endsWith(".jks")) "JKS" else "PKCS12")
        val is = new java.io.FileInputStream(p)
        try ks.load(is, password.map(_.toCharArray).orNull) finally is.close()
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx.getSocketFactory
    }
}
