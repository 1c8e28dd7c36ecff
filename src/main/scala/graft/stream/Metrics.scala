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

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    queriesStarted.increment()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    messagesProcessed.add(event.progress.numInputRows)
    batchInserts.increment()
    lastBatchDurationMs =
      Option(event.progress.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
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
