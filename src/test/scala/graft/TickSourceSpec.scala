package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Ingest, Latest}
import graft.sources.{TickMicroBatchStream, TickOffset, TickSource}

/** End-to-end over the custom DataSourceV2 source: graft-ticks →
  * decode (S3) → validate (F1) → keep-last (A1), checked against the
  * deterministic generator formula.
  */
class TickSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val MaxTicks = 300L
  private val Symbols = 7

  test("graft-ticks microbatch source feeds the full ingest path") {
    val raw = spark.readStream.format("graft-ticks")
      .option("rowsPerBatch", 100)
      .option("maxTicks", MaxTicks)
      .option("symbols", Symbols)
      .option("numPartitions", 3)
      .load()
    val parsed = Ingest.validate(Ingest.parseWire(raw))
    val q = parsed.writeStream.format("memory").queryName("ticks_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ticks_out").collect()
    // expected from the generator formula: drop corrupt (i%97==0) and
    // empty-name (i%101==0) ticks
    val expected = (0L until MaxTicks).filterNot(i => i % 97 == 0 || i % 101 == 0)
    assert(got.length == expected.size)
    val gotTs = got.map(_.getLong(1)).sorted
    assert(gotTs.toSeq == expected.map(1700000000000L + _))
    // payload survived the doubly nested decode
    val m = got.head.getMap[String, String](2)
    assert(m.contains("bid") && m.contains("ask"))

    // keep-last per symbol over the batch output equals the generator argmax
    val latest = Latest.keepLastPerKey(
      spark.table("ticks_out"), Seq("name"), Seq("timestamp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantLatest = expected.groupBy(i => s"SYM${i % Symbols}")
      .map { case (k, is) => k -> (1700000000000L + is.max) }
    assert(latest == wantLatest)
  }

  test("live socket feed drives the ingest pipeline (S1 live parity)") {
    // an in-process TCP server plays the upstream feed: newline-framed
    // wire messages, same shape as the WS ingestor receives
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        (0L until 50L).foreach(i => out.println(TickSource.frame(i, 5)))
        Thread.sleep(3000)
        sock.close()
      } catch { case _: Exception => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val raw = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", port).load()
    val parsed = Ingest.validate(Ingest.parseWire(raw))
    val q = parsed.writeStream.format("memory").queryName("socket_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val expected = (0L until 50L).count(i => i % 97 != 0 && i % 101 != 0)
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table("socket_out").count() < expected &&
      System.currentTimeMillis() < deadline) Thread.sleep(250)
    q.stop()
    server.close()
    val got = spark.table("socket_out").collect()
    assert(got.length == expected) // corrupt frame i=0 dropped
    assert(got.map(_.getString(0)).toSet.subsetOf((0 until 5).map(i => s"SYM$i").toSet))
  }

  test("recovered offset seeds availability: restart never plans end < committed start") {
    val s = new TickMicroBatchStream(
      rowsPerBatch = 1000L, maxTicks = 10000L, numPartitions = 2, nSymbols = 5)
    // simulate restart: Spark hands back the checkpointed offset
    s.deserializeOffset("5000")
    val end = s.latestOffset().asInstanceOf[TickOffset].tick
    assert(end >= 5000L)
  }

  test("frame generator emits corrupt and invalid frames on schedule") {
    assert(TickSource.frame(0, 5).startsWith("{corrupt"))
    assert(TickSource.frame(101, 5).contains("\"name\":\"\""))
    assert(TickSource.frame(1, 5).contains("\"name\":\"SYM1\""))
  }
}
