package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA per key — the stateful-ARITHMETIC member of the
  * keyed-state family (LatestStream keeps an argmax record; this folds
  * a number): state is one (ewma, n, last-seen) triple per key,
  * updated by folding each micro-batch's ticks in (tsMs, id) order —
  * y ← (1−α)·y + α·x — so the smoothed price is maintained
  * incrementally over an unbounded feed with O(keys) state, where the
  * batch [[graft.ops.Bars.ewma]] would need the whole history.
  *
  * Ordering contract: total (tsMs, id) order WITHIN a micro-batch
  * (explicit sort before folding); ACROSS batches the fold applies in
  * arrival order, the standard streaming-fold semantics (same contract
  * as any incremental sketch — replay a reordered log and the fold
  * differs; the gate query drains in one AvailableNow batch, so its
  * result is the exact full-history fold and is checked against the
  * batch oracle bit-for-bit).
  *
  * Scale: state is O(distinct keys) partitioned by key hash; each
  * micro-batch sorts only its own per-key slice (bounded by the
  * trigger's admission), never the history.
  */
object EwmaStream {

  final case class Tick(key: Long, id: Long, tsMs: Long, value: Double)
  final case class EwmaState(ewma: Double, n: Long)
  final case class EwmaOut(key: Long, ewma: Double, n: Long)

  implicit val tickEnc: Encoder[Tick] = Encoders.product[Tick]
  implicit val outEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]
  implicit val stateEnc: Encoder[EwmaState] = Encoders.product[EwmaState]

  /** State-update function, exposed for direct unit testing: folds the
    * batch's ticks for one key into the carried EWMA (first-ever tick
    * seeds y₀ = x₀, matching Bars.ewma), emits the updated running
    * value. The multiply-add is written identically to Bars.ewma's
    * fold so batch and stream agree bit-for-bit on an in-order feed.
    */
  def updateEwma(alpha: Double)(
      key: Long, rows: Iterator[Tick], state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    val sorted = rows.toVector.sortBy(r => (r.tsMs, r.id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val (seed, rest) = state.getOption match {
        case Some(s) => (s, sorted)
        case None => (EwmaState(sorted.head.value, 1L), sorted.tail)
      }
      val folded = rest.foldLeft(seed) { (s, r) =>
        EwmaState(s.ewma * (1 - alpha) + r.value * alpha, s.n + 1)
      }
      state.update(folded)
      Iterator.single(EwmaOut(key, folded.ewma, folded.n))
    }
  }

  /** Wire the state function into a streaming Dataset (update mode —
    * each micro-batch emits the new running EWMA for every touched
    * key; `n` is monotone per key, so downstream keep-last is
    * max_by(n)).
    */
  def ewmaStateful(ds: Dataset[Tick], alpha: Double): Dataset[EwmaOut] =
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateEwma(alpha))
}
