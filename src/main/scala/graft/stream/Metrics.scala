package graft.stream

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K5 parity — the reference's Prometheus counters
  * (internal/app/metrics/metrics.go:8-34: messages_received/processed,
  * batch_inserts, errors_total, processing latency histogram) mapped
  * onto StreamingQueryListener progress events. Counter values come
  * from query progress (numInputRows, batch duration), not from
  * per-record instrumentation, so they cost nothing on the hot path.
  */
final class Metrics extends StreamingQueryListener {
  val messagesProcessed = new LongAdder
  val batchInserts = new LongAdder
  val queriesStarted = new LongAdder
  val queriesFailed = new LongAdder
  // per-error-class counters, the reference's errors_total{type} labels
  // (metrics.go:8-34: unmarshal / validation / storage). The first two
  // arrive as observed metrics published by Ingest.parseWire/validate
  // (counted = true) — aggregated inside the query, surfaced via
  // progress events, zero hot-path cost. The sink class is incremented
  // by Pipeline's retry loop (driver-side), once per failed attempt,
  // mirroring the reference's increment-regardless-of-retry.
  val errorsUnmarshal = new LongAdder
  val errorsValidation = new LongAdder
  val errorsSink = new LongAdder
  val batchesQuarantined = new LongAdder
  // serve-plane ticks skipped by Broadcast's log-and-continue guard —
  // without this a permanently broken serve loop looks like a healthy
  // running query that silently serves nothing (incremented driver-side
  // by the foreachBatch catch, like errorsSink)
  val serveTickFailures = new LongAdder
  @volatile var lastBatchDurationMs: Long = 0L

  // K5 histogram parity: the reference declares
  // processing_latency_seconds as a HISTOGRAM with the Prometheus
  // default buckets (metrics.go:29-33, prometheus.DefBuckets); the
  // observation here is each micro-batch's triggerExecution duration.
  // Per-bucket counts are stored NON-cumulative and rendered
  // cumulative at exposition (the histogram text contract).
  val latencyBucketsSec: Array[Double] =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
  private val latencyCounts =
    new java.util.concurrent.atomic.AtomicLongArray(latencyBucketsSec.length + 1)
  val latencySumMs = new LongAdder

  private def observeLatency(ms: Long): Unit = {
    val sec = ms / 1000.0
    val i = latencyBucketsSec.indexWhere(sec <= _)
    latencyCounts.incrementAndGet(
      if (i < 0) latencyBucketsSec.length else i)
    latencySumMs.add(ms)
    ()
  }

  /** Cumulative bucket counts (one per bucket bound, then +Inf). */
  def latencyCumulative: Array[Long] = {
    val out = new Array[Long](latencyBucketsSec.length + 1)
    var acc = 0L
    var i = 0
    while (i < out.length) {
      acc += latencyCounts.get(i)
      out(i) = acc
      i += 1
    }
    out
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    queriesStarted.increment()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    messagesProcessed.add(event.progress.numInputRows)
    batchInserts.increment()
    lastBatchDurationMs =
      Option(event.progress.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
    observeLatency(lastBatchDurationMs)
    val om = event.progress.observedMetrics
    def add(name: String, field: String, to: LongAdder): Unit =
      Option(om.get(name)).foreach { row =>
        val v = row.getAs[Any](field)
        if (v != null) to.add(v.asInstanceOf[Number].longValue) // null on empty batch
      }
    add("graft_unmarshal", "errors_unmarshal", errorsUnmarshal)
    add("graft_validation", "errors_validation", errorsValidation)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (event.exception.isDefined) queriesFailed.increment()

  def snapshot: Map[String, Long] = Map(
    "messages_processed" -> messagesProcessed.sum(),
    "batch_inserts" -> batchInserts.sum(),
    "queries_started" -> queriesStarted.sum(),
    "queries_failed" -> queriesFailed.sum(),
    "errors_total_unmarshal" -> errorsUnmarshal.sum(),
    "errors_total_validation" -> errorsValidation.sum(),
    "errors_total_sink" -> errorsSink.sum(),
    "batches_quarantined" -> batchesQuarantined.sum(),
    "serve_tick_failures" -> serveTickFailures.sum(),
    "last_batch_duration_ms" -> lastBatchDurationMs)
}

object Metrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
