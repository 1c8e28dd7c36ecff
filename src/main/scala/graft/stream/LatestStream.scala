package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-last-per-key with TTL — the Redis cache semantics
  * (A1/A2: cache_service.go:37-61, SET ... EX ttl) as typed stateful
  * streaming: one state row per key holding the current argmax record;
  * a processing-time timeout evicts idle keys after the TTL, exactly
  * like Redis key expiry.
  *
  * Scale: state is O(distinct keys), partitioned by key hash across
  * executors; each micro-batch touches only the keys it contains.
  */
object LatestStream {

  /** A tick record for the stateful path (ordering: ts then id). */
  final case class Keyed(key: String, id: Long, tsMs: Long, value: Double)

  implicit val keyedEnc: Encoder[Keyed] = Encoders.product[Keyed]

  /** State-update function, exposed for direct unit testing with
    * TestGroupState: keeps the max-(tsMs, id) record per key; on TTL
    * timeout the state is removed (Redis expiry). With `ttlMs = None`
    * state is retained forever (no timeout registered).
    */
  def updateLatest(ttlMs: Option[Long])(
      key: String, rows: Iterator[Keyed], state: GroupState[Keyed]): Iterator[Keyed] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val candidates = state.getOption.iterator ++ rows
      val best = candidates.maxBy(r => (r.tsMs, r.id))
      state.update(best)
      ttlMs.foreach(state.setTimeoutDuration)
      Iterator.single(best)
    }
  }

  /** Wire the state function into a streaming Dataset. Emits the new
    * latest record for every updated key each micro-batch (update
    * semantics, like the reference cache upsert).
    *
    * Note: a processing-time TTL keeps the query re-triggering even
    * with no input (timeouts are work) — that is correct for the
    * long-running pipeline; batch-style runs (Trigger.AvailableNow)
    * should pass `ttlMs = None`.
    *
    * `initialState`: one pre-seeded state record per key, for the
    * STATE-PARTITION MIGRATION path (see
    * [[graft.queries.Catalog.withStatePartitions]]): the shuffle
    * partition count of a stateful operator is frozen into its
    * checkpoint at first `start()`, and a restart under a different
    * `spark.sql.shuffle.partitions` silently keeps the checkpointed
    * count — so re-sizing state parallelism means ABANDONING the old
    * checkpoint and starting a fresh query whose state is rebuilt
    * offline from the durable append sink
    * ([[Pipeline.rebuildLatest]] / `Latest.keepLastPerKey` over the
    * log) and injected here. Exactness: the rebuilt record per key IS
    * the argmax the old state held (same order columns), so the new
    * query continues bit-identically — StreamingSpec pins the full
    * 4-partition → 8-partition migration.
    */
  def keepLastStateful(ds: Dataset[Keyed], ttlMs: Option[Long],
      initialState: Option[Dataset[Keyed]] = None): Dataset[Keyed] = {
    val conf = if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val grouped = ds.groupByKey(_.key)(Encoders.STRING)
    initialState match {
      case None =>
        grouped.flatMapGroupsWithState[Keyed, Keyed](OutputMode.Update(), conf)(
          updateLatest(ttlMs))
      case Some(init) =>
        grouped.flatMapGroupsWithState[Keyed, Keyed](OutputMode.Update(), conf,
          init.groupByKey(_.key)(Encoders.STRING))(updateLatest(ttlMs))
    }
  }
}
