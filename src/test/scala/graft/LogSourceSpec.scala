package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ingest, Latest}
import graft.sources.{LogSource, TickSource}
import graft.stream.Pipeline

/** The durable-log face of S1 (SURVEY.md §2.1 scale note): the ingest
  * pipeline must run SOURCE-SWAPPED — socket feed in dev, partitioned
  * replayable log at 100 TB — with no downstream change, offsets
  * surviving a restart, and the batch-id append sink keeping replays
  * exactly-once. Plus the A3 count-threshold flush the admission cap
  * gives on this source (reference processor.go:70-81).
  */
class LogSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Rows in the batch-id append sink; 0 while no batch has landed
    * (the dir exists but holds no parquet yet).
    */
  private def rowsIn(appendDir: String): Long =
    try spark.read.parquet(appendDir).count()
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  private val dim = Seq(("SYM0", "NYSE"), ("SYM1", "NASDAQ"), ("SYM2", "LSE"))

  /** The same wire frames the socket tests use, split round-robin over
    * two log partitions (a producer's keyless partitioning).
    */
  private def appendRoundRobin(logDir: String, frames: Seq[(String, Long)]): Unit =
    frames.groupBy(_._2 % 2).foreach { case (p, fs) =>
      LogSource.append(logDir, p.toInt, fs.map(_._1))
    }

  test("log source swaps for the socket source: identical latest table across a forced restart, exactly-once append") {
    val logDir = tmp("gl_log"); val appendDir = tmp("gl_append")
    val latestDir = tmp("gl_latest"); val ckpt = tmp("gl_ckpt")
    val all = (0L until 120L).map(i => (TickSource.frame(i, 5), i))
    val dimDf = dim.toDF("symbol", "exchange")

    // same downstream pipeline the socket source feeds — only the
    // readStream line differs (the source-swap claim under test)
    def startQ() = {
      val raw = spark.readStream.format("graft-log")
        .option("path", logDir).load()
      Pipeline.start(Ingest.parseWire(raw), dimDf, appendDir, latestDir,
        keyCols = Seq("name"), orderCols = Seq("timestamp"),
        nameCol = "name", tsCol = "timestamp", checkpointDir = ckpt,
        trigger = Trigger.ProcessingTime(0), retries = 1)
    }
    def validCount(n: Long): Long =
      (0L until n).count(i => i % 97 != 0 && i % 101 != 0).toLong

    // phase 1: first 60 frames, drain, then stop the query
    appendRoundRobin(logDir, all.take(60))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    assert(rowsIn(appendDir) == validCount(60))

    // phase 2: 60 more frames land while the query is DOWN; the restart
    // resumes from the committed per-partition offsets
    appendRoundRobin(logDir, all.drop(60))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()

    // exactly-once across the restart: every valid frame appended once,
    // none duplicated by the batch-id-keyed sink
    val appended = spark.read.parquet(appendDir)
    assert(appended.count() == validCount(120),
      s"expected ${validCount(120)} rows, got ${appended.count()}")
    assert(appended.select("name", "timestamp").distinct().count() == validCount(120))

    // the latest table equals the batch reference over the same frames
    // — downstream semantics unchanged by the source swap
    val batchRef = Latest.keepLastPerKey(
      Ingest.enrichDim(
        Ingest.validate(Ingest.parseWire(all.map(_._1).toDF("value"))),
        dimDf, "name", "symbol", "exchange"),
      Seq("name"), Seq("timestamp"))
      .select("name", "timestamp", "exchange")
      .collect().map(_.toSeq).toSet
    val got = Pipeline.readLatest(spark, latestDir)
      .select("name", "timestamp", "exchange")
      .collect().map(_.toSeq).toSet
    assert(got == batchRef)
  }

  test("A3 count-threshold flush: admission cap bounds every batch, interval flushes partial ones") {
    val logDir = tmp("a3_log"); val appendDir = tmp("a3_append")
    val latestDir = tmp("a3_latest")
    // 250 clean frames (no corrupt/invalid: multiples of 97/101 shifted
    // out by starting at 1) in one partition
    val frames = (1L to 250L).map(i =>
      s"""{"name":"SYM${i % 5}","timestamp":${1700000000000L + i},"data":{"data":{"bid":"1.0","ask":"1.01"}}}""")
    LogSource.append(logDir, 0, frames)
    val raw = spark.readStream.format("graft-log")
      .option("path", logDir)
      .option("maxOffsetsPerTrigger", "100") // BATCH_SIZE=100 face
      .load()
    val q = Pipeline.start(Ingest.parseWire(raw), dim.toDF("symbol", "exchange"),
      appendDir, latestDir, keyCols = Seq("name"), orderCols = Seq("timestamp"),
      nameCol = "name", tsCol = "timestamp", checkpointDir = tmp("a3_ckpt"),
      trigger = Trigger.ProcessingTime(0), retries = 1)
    try {
      val d1 = System.currentTimeMillis() + 60000
      while (rowsIn(appendDir) < 250 && System.currentTimeMillis() < d1)
        Thread.sleep(250)
      assert(rowsIn(appendDir) == 250, s"backlog not drained: ${rowsIn(appendDir)}")

      // flush-on-size: the 250-record backlog drained as size-bounded
      // flushes — the batch-id sink layout records each flush's row
      // count, and none may exceed BATCH_SIZE
      val perBatch = spark.read.parquet(appendDir)
        .groupBy("batch").count()
        .collect().map(r => r.getLong(1))
      assert(perBatch.forall(_ <= 100), s"oversized flush: ${perBatch.mkString(",")}")
      assert(perBatch.count(_ > 0) >= 3, // 250 records can't fit 2 flushes
        s"expected >=3 size-bounded flushes, got ${perBatch.mkString(",")}")

      // flush-on-interval: 30 more records — far below BATCH_SIZE — must
      // still flush on the next trigger rather than wait for a full batch
      LogSource.append(logDir, 0,
        (251L to 280L).map(i =>
          s"""{"name":"SYM${i % 5}","timestamp":${1700000000000L + i},"data":{"data":{"bid":"1.0","ask":"1.01"}}}"""))
      val d2 = System.currentTimeMillis() + 60000
      while (rowsIn(appendDir) < 280 && System.currentTimeMillis() < d2)
        Thread.sleep(250)
      assert(rowsIn(appendDir) == 280,
        s"partial batch not flushed: ${rowsIn(appendDir)}")
    } finally q.stop()
  }
}
