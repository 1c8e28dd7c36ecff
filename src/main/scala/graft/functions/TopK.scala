package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a typed, MERGEABLE Aggregator — the bounded-state
  * alternative to the `row_number() OVER (... ORDER BY v DESC) <= k`
  * window, which shuffles EVERY row to its group's partition and sorts
  * the whole group before discarding all but k. This buffer holds the
  * k best (v, id) pairs — ordered by (v DESC, id ASC), a total order,
  * so the result is deterministic and partitioning-invariant — and
  * partial-aggregates map-side: the exchange carries at most k pairs
  * per (map partition × group) instead of the corpus, the classic
  * 100 TB "top documents per source by quality" shape. The window
  * formulation stays the right tool when ALL ranks are needed
  * (q_window_rank); this one is for top-k selection.
  *
  * Buffer: interleaved primitive long array
  * [bits(v0), id0, bits(v1), id1, …] (the KmvAggregator discipline —
  * O(log k) search + O(k) memmove per accepted row, no boxing until
  * finish); ≤ 2k longs of state per group, also its streaming-state
  * bound.
  */
class TopKByAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[Long], Array[(Double, Long)]] {

  override def zero: Array[Long] = Array.emptyLongArray

  /** Compare pair i of buf against (v, id) in (v DESC, id ASC) order. */
  private def cmp(buf: Array[Long], i: Int, v: Double, id: Long): Int = {
    val c = java.lang.Double.compare(
      v, java.lang.Double.longBitsToDouble(buf(2 * i))) // reversed: v DESC
    if (c != 0) c
    else java.lang.Long.compare(buf(2 * i + 1), id) // id ASC
  }

  private def insert(buf: Array[Long], v: Double, id: Long): Array[Long] = {
    val n = buf.length / 2
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = cmp(buf, mid, v, id)
      if (c == 0) return buf // exact duplicate (v, id)
      else if (c < 0) lo = mid + 1
      else hi = mid
    }
    if (n >= k && lo >= k) return buf
    val keep = math.min(n + 1, k)
    val out = new Array[Long](keep * 2)
    System.arraycopy(buf, 0, out, 0, lo * 2)
    out(2 * lo) = java.lang.Double.doubleToLongBits(v)
    out(2 * lo + 1) = id
    System.arraycopy(buf, lo * 2, out, lo * 2 + 2, (keep - lo - 1) * 2)
    out
  }

  /** SET semantics: an exact duplicate (v, id) pair collapses (the
    * cmp == 0 early return in insert), while a row_number window ranks
    * duplicate input ROWS separately — so equivalence with the window
    * formulation requires the id to be UNIQUE per group (true for
    * doc_id/event_id here; callers with duplicated id rows must
    * pre-aggregate or the window oracle needs SELECT DISTINCT).
    * `+ 0.0` normalizes −0.0 to 0.0 so the bit-level Double.compare
    * order cannot split signed zeros that SQL ORDER BY treats equal.
    */
  override def reduce(buf: Array[Long], x: (Double, Long)): Array[Long] =
    insert(buf, x._1 + 0.0, x._2)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var acc = a
    var i = 0
    while (i < b.length) {
      acc = insert(acc, java.lang.Double.longBitsToDouble(b(i)), b(i + 1))
      i += 2
    }
    acc
  }

  override def finish(r: Array[Long]): Array[(Double, Long)] =
    Array.tabulate(r.length / 2)(i =>
      (java.lang.Double.longBitsToDouble(r(2 * i)), r(2 * i + 1)))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
}

object TopK {

  /** Column aggregate: array<struct<_1: double (value), _2: long (id)>>
    * of the k best pairs under (v DESC, id ASC), in that order.
    */
  def topKBy(v: Column, id: Column, k: Int): Column =
    udaf(new TopKByAggregator(k),
      ExpressionEncoder[(Double, Long)]()).apply(v, id)

  /** Explode a [[topKBy]] result into (rank, id, v) rows — rank is
    * 1-based in the aggregator's (v DESC, id ASC) order.
    */
  def exploded(kept: Column): Column =
    posexplode(kept)
}
