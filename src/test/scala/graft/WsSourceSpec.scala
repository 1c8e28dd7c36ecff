package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Ingest
import graft.sources.{TickSource, WsBackoff, WsClient, WsFrames}

/** Server half of RFC 6455, test-side only (the engine is a feed
  * CONSUMER — the reference's serving half is C1, out of engine
  * scope): performs the upgrade handshake, records x-api-key and the
  * subscribe frame, pings once, then plays `frames` as text frames.
  * The first connection is dropped abruptly after `dropAfter` frames
  * (FIN ⇒ client sees EOF), or goes SILENT after `stallAfter` frames
  * (no FIN ⇒ only a read timeout can unstick the client); later
  * connections resume from a shared cursor and then hold the socket
  * open. One thread per connection so a stalled one can't block the
  * acceptor.
  */
final class WsTestServer(frames: Seq[String], dropAfter: Int = Int.MaxValue,
    stallAfter: Int = Int.MaxValue,
    // pluggable listener so the TLS test can hand in an SSLServerSocket
    ss: ServerSocket = new ServerSocket(0)) {
  private val server = ss
  def port: Int = server.getLocalPort
  val apiKeys = new ConcurrentLinkedQueue[String]()
  val subscribes = new ConcurrentLinkedQueue[String]()
  val connections = new AtomicInteger(0)
  private val cursor = new AtomicInteger(0)
  @volatile private var closed = false

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  }, "ws-test-server")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val conn = connections.incrementAndGet()
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0) { sock.close(); return }
      sb.append(b.toChar)
    }
    val head = sb.result().split("\r\n").toSeq
    def header(name: String): Option[String] = head.collectFirst {
      case l if l.toLowerCase.startsWith(name.toLowerCase + ":") =>
        l.split(":", 2)(1).trim
    }
    header("x-api-key").foreach(apiKeys.add)
    val key = header("Sec-WebSocket-Key").getOrElse { sock.close(); return }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${WsFrames.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
    // the client subscribes right after connecting (ingestor.go:63-78)
    WsFrames.read(in) match {
      case Some((_, WsFrames.OpText, p)) => subscribes.add(new String(p, UTF_8))
      case _ => ()
    }
    WsFrames.write(out, WsFrames.OpPing, "hb".getBytes(UTF_8), None)
    var sent = 0
    var done = false
    while (!done) {
      val i = cursor.get()
      if (i >= frames.length) done = true
      else if (conn == 1 && sent >= dropAfter) { sock.close(); return } // abrupt drop
      else if (conn == 1 && sent >= stallAfter) { // silent stall: no FIN
        while (!closed) Thread.sleep(100)
        sock.close(); return
      }
      else if (cursor.compareAndSet(i, i + 1)) {
        WsFrames.write(out, WsFrames.OpText, frames(i).getBytes(UTF_8), None)
        sent += 1
      }
    }
    // everything served: hold the connection open until the client goes away
    while (WsFrames.read(in).exists(_._2 != WsFrames.OpClose)) ()
    sock.close()
  }

  def close(): Unit = { closed = true; server.close() }
}

class WsSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("backoff doubles from base to cap (reference reconnect policy)") {
    assert((0 to 6).map(WsBackoff.delayMs(_)) ==
      Seq(1000L, 2000L, 4000L, 8000L, 16000L, 30000L, 30000L))
    assert(WsBackoff.delayMs(62) == 30000L) // shift overflow guarded
  }

  test("frame read limit rejects on DECLARED length, before buffering (server.go:162)") {
    // a 700-byte frame against a 512-byte limit: rejected from the
    // header alone — the payload must remain unconsumed (unallocated)
    val bos = new java.io.ByteArrayOutputStream()
    WsFrames.write(bos, WsFrames.OpText, Array.fill[Byte](700)('x'), None)
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    val ex = intercept[java.io.IOException](WsFrames.read(in, 512))
    assert(ex.getMessage.contains("read limit"))
    assert(in.available() == 700, "payload bytes must not have been buffered")
    // a hostile header declaring ~2 GB with NO payload behind it must
    // fail the same way, not block or allocate
    val hostile = new java.io.ByteArrayInputStream(Array[Byte](
      0x81.toByte, 127, 0, 0, 0, 0, 0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xF0.toByte))
    intercept[java.io.IOException](WsFrames.read(hostile, 1 << 20))
    // under the limit still reads normally
    val ok = new java.io.ByteArrayOutputStream()
    WsFrames.write(ok, WsFrames.OpText, "small".getBytes(UTF_8), None)
    val got = WsFrames.read(new java.io.ByteArrayInputStream(ok.toByteArray), 512)
    assert(got.exists { case (fin, op, p) =>
      fin && op == WsFrames.OpText && new String(p, UTF_8) == "small" })
  }

  test("client handshake, subscribe, ping→pong, fragmented text (RFC 6455)") {
    // hand-rolled server: checks the upgrade, then exercises the frame
    // shapes WsTestServer doesn't produce (fragmentation)
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      val sb = new StringBuilder
      while (!sb.endsWith("\r\n\r\n")) sb.append(in.read().toChar)
      val key = sb.result().split("\r\n").collectFirst {
        case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
          l.split(":", 2)(1).trim
      }.get
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${WsFrames.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
      // ping (client must pong), then "hello" split across two frames
      WsFrames.write(out, WsFrames.OpPing, "x".getBytes(UTF_8), None)
      out.write(Array[Byte](0x01, 3)); out.write("hel".getBytes(UTF_8)) // text, FIN=0
      out.write(Array[Byte](0x80.toByte, 2)); out.write("lo".getBytes(UTF_8)) // cont, FIN=1
      out.flush()
      // expect pong back from the client
      val pong = WsFrames.read(in)
      assert(pong.exists(f => f._2 == WsFrames.OpPong &&
        new String(f._3, UTF_8) == "x"))
      WsFrames.write(out, WsFrames.OpClose, Array.emptyByteArray, None)
      sock.close()
    })
    t.setDaemon(true); t.start()
    val c = WsClient.connect("127.0.0.1", server.getLocalPort)
    assert(c.readText().contains("hello"))
    assert(c.readText().isEmpty) // close frame → None
    c.close(); server.close()
  }

  test("client fails the connection when the server negotiates an unrequested extension (RFC 6455 §4.1)") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      val sb = new StringBuilder
      while (!sb.endsWith("\r\n\r\n")) sb.append(in.read().toChar)
      val key = sb.result().split("\r\n").collectFirst {
        case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
          l.split(":", 2)(1).trim
      }.get
      // correct Accept, but claims permessage-deflate the client never offered
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        "Sec-WebSocket-Extensions: permessage-deflate\r\n" +
        s"Sec-WebSocket-Accept: ${WsFrames.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
    })
    t.setDaemon(true); t.start()
    val e = intercept[java.io.IOException] {
      WsClient.connect("127.0.0.1", server.getLocalPort)
    }
    assert(e.getMessage.contains("unrequested"))
    server.close()
  }

  test("read timeout unsticks a silently-stalled connection (no FIN)") {
    val n = 30
    val frames = (0L until n.toLong).map(TickSource.frame(_, 5))
    val server = new WsTestServer(frames, stallAfter = 10)
    val raw = spark.readStream.format("graft-ws")
      .option("host", "127.0.0.1").option("port", server.port)
      .option("subscribe", """{"event":"subscribe","symbols":[]}""")
      .option("backoffBaseMs", "100").option("readTimeoutMs", "500")
      .load()
    val parsed = Ingest.validate(Ingest.parseWire(raw))
    val q = parsed.writeStream.format("memory").queryName("ws_stall_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val expected = (0L until n.toLong).count(i => i % 97 != 0 && i % 101 != 0)
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("ws_stall_out").count() < expected &&
      System.currentTimeMillis() < deadline) Thread.sleep(250)
    q.stop()
    val got = spark.table("ws_stall_out").count()
    server.close()
    assert(got == expected, s"expected $expected frames after timeout-reconnect, got $got")
    assert(server.connections.get() >= 2, "read timeout should have forced a reconnect")
  }

  test("stop() closes a blocked reader's socket (no thread leak without a read timeout)") {
    import scala.jdk.CollectionConverters._
    val frames = (0L until 3L).map(TickSource.frame(_, 5))
    val server = new WsTestServer(frames) // serves 3 frames then holds the socket open
    val stream = new graft.sources.WsMicroBatchStream(
      "127.0.0.1", server.port, "/", None, None,
      backoffBaseMs = 100, backoffMaxMs = 1000, numPartitions = 2,
      readTimeoutMs = 0, maxBuffered = 100) // no timeout: read blocks forever
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (stream.latestOffset().asInstanceOf[graft.sources.TickOffset].tick < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      stream.stop() // must close the socket — interrupt can't wake a Socket read
      val name = s"graft-ws-reader-127.0.0.1:${server.port}"
      def readerAlive = Thread.getAllStackTraces.keySet.asScala
        .exists(t => t.getName == name && t.isAlive)
      val dead = (1 to 100).exists { _ =>
        if (readerAlive) { Thread.sleep(100); false } else true
      }
      assert(dead, "reader thread still alive 10s after stop()")
    } finally server.close()
  }

  test("stop() during a stalled HANDSHAKE kills the reader (two-phase connect closes the race)") {
    import scala.jdk.CollectionConverters._
    // a server that accepts TCP but never answers the upgrade: the
    // reader blocks inside handshake() — stop() must still reach the
    // socket because the client registers before handshaking
    val server = new ServerSocket(0)
    val stream = new graft.sources.WsMicroBatchStream(
      "127.0.0.1", server.getLocalPort, "/", None, None,
      backoffBaseMs = 100, backoffMaxMs = 1000, numPartitions = 2,
      readTimeoutMs = 0, maxBuffered = 100)
    try {
      Thread.sleep(500) // reader connects and blocks in the handshake read
      stream.stop()
      val name = s"graft-ws-reader-127.0.0.1:${server.getLocalPort}"
      def readerAlive = Thread.getAllStackTraces.keySet.asScala
        .exists(t => t.getName == name && t.isAlive)
      val dead = (1 to 100).exists { _ =>
        if (readerAlive) { Thread.sleep(100); false } else true
      }
      assert(dead, "reader thread still alive 10s after stop() mid-handshake")
    } finally server.close()
  }

  test("bounded buffer caps unplanned frames (backpressure, not memory growth)") {
    val frames = (0L until 200L).map(TickSource.frame(_, 5))
    val server = new WsTestServer(frames)
    val stream = new graft.sources.WsMicroBatchStream(
      "127.0.0.1", server.port, "/", None,
      subscribe = Some("""{"event":"subscribe","symbols":[]}"""),
      backoffBaseMs = 100, backoffMaxMs = 1000, numPartitions = 2,
      maxBuffered = 5)
    try {
      Thread.sleep(2000) // reader pulls; nothing is planned or committed
      val avail = stream.latestOffset().asInstanceOf[graft.sources.TickOffset].tick
      assert(avail <= 5L, s"buffer grew past the cap: $avail")
    } finally { stream.stop(); server.close() }
  }

  test("wss:// (TLS): graft-ws round trip against a self-signed SSLServerSocket") {
    import scala.sys.process._
    // self-signed server identity + a client trust store holding just
    // that cert, both built with the JDK's own keytool
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val serverKs = dir.resolve("server.p12").toString
    val cert = dir.resolve("ws.cer").toString
    val trustKs = dir.resolve("trust.p12").toString
    val pass = "graftpass"
    assert(Seq("keytool", "-genkeypair", "-alias", "ws", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", serverKs,
      "-storepass", pass, "-keypass", pass, "-dname", "CN=127.0.0.1",
      "-validity", "1").! == 0, "keytool -genkeypair failed")
    assert(Seq("keytool", "-exportcert", "-alias", "ws", "-keystore", serverKs,
      "-storepass", pass, "-file", cert).! == 0, "keytool -exportcert failed")
    assert(Seq("keytool", "-importcert", "-alias", "ws", "-file", cert,
      "-keystore", trustKs, "-storetype", "PKCS12", "-storepass", pass,
      "-noprompt").! == 0, "keytool -importcert failed")
    val kstore = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(serverKs)
    try kstore.load(fis, pass.toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(kstore, pass.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val n = 12
    val frames = (0L until n.toLong).map(TickSource.frame(_, 5))
    val server = new WsTestServer(frames,
      ss = ctx.getServerSocketFactory.createServerSocket(0))
    val raw = spark.readStream.format("graft-ws")
      .option("host", "127.0.0.1").option("port", server.port)
      .option("secure", "true")
      .option("trustStore", trustKs).option("trustStorePassword", pass)
      .option("subscribe", """{"event":"subscribe","symbols":[]}""")
      .option("backoffBaseMs", "100")
      .load()
    val parsed = Ingest.validate(Ingest.parseWire(raw))
    val q = parsed.writeStream.format("memory").queryName("ws_tls_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val expected = (0L until n.toLong).count(i => i % 97 != 0 && i % 101 != 0)
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("ws_tls_out").count() < expected &&
      System.currentTimeMillis() < deadline) Thread.sleep(250)
    q.stop()
    val got = spark.table("ws_tls_out").count()
    server.close()
    assert(got == expected, s"expected $expected frames over TLS, got $got")
    // the encrypted subscribe frame arrived intact
    assert(server.subscribes.contains("""{"event":"subscribe","symbols":[]}"""))
  }

  test("graft-ws source ingests over real WS frames and reconnects after a drop") {
    val n = 60
    val frames = (0L until n.toLong).map(TickSource.frame(_, 5))
    val server = new WsTestServer(frames, dropAfter = 20)
    val raw = spark.readStream.format("graft-ws")
      .option("host", "127.0.0.1").option("port", server.port)
      .option("apiKey", "test-key-1")
      .option("subscribe", """{"event":"subscribe","symbols":["SYM0","SYM1"]}""")
      .option("backoffBaseMs", "100") // keep the test fast
      .load()
    val parsed = Ingest.validate(Ingest.parseWire(raw))
    val q = parsed.writeStream.format("memory").queryName("ws_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val expected = (0L until n.toLong).count(i => i % 97 != 0 && i % 101 != 0)
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("ws_out").count() < expected &&
      System.currentTimeMillis() < deadline) Thread.sleep(250)
    q.stop()
    val got = spark.table("ws_out").count()
    server.close()
    assert(got == expected, s"expected $expected valid frames, got $got")
    assert(server.connections.get() >= 2, "client should have reconnected after the drop")
    assert(server.apiKeys.contains("test-key-1"))
    assert(server.subscribes.contains("""{"event":"subscribe","symbols":["SYM0","SYM1"]}"""))
  }
}
