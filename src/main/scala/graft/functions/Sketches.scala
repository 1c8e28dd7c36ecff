package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) sketch as a typed, MERGEABLE Aggregator —
  * the 100 TB shape for q_kmv_distinct: the buffer (k smallest
  * DISTINCT hashes, sorted ascending) partial-aggregates map-side and
  * merges associatively+commutatively, so the plan is ONE hash
  * aggregate over the raw rows — no distinct pre-shuffle, no
  * row_number window shuffle. The result is IDENTICAL to the
  * sort-based formulation (k smallest distinct values are
  * partitioning-invariant), so the same DuckDB oracle checks it.
  *
  * Buffer ops are O(log k) search + O(k) insert on a primitive long
  * array — no boxing, no per-row allocation beyond the rare growth.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert x keeping the k smallest distinct values, sorted. */
  private def insert(buf: Array[Long], x: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, x)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // beats the current k-th: drop the largest
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def reduce(buf: Array[Long], x: Long): Array[Long] = insert(buf, x)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Bottom-k VALUE SAMPLE sketch (coordinated / bottom-k sampling,
  * Cohen & Kaplan): keep the k (hash, value) pairs with
  * lexicographically smallest (h, v) per group, where h is a
  * deterministic 60-bit hash of each row's unique id. The kept set is
  * a uniform random row sample that is ARRIVAL-ORDER-INVARIANT and
  * PARTITIONING-INVARIANT (smallest-k of a fixed keying), so — unlike
  * t-digest/KLL, whose internals are randomized or order-dependent —
  * both engines reproduce it bit-for-bit and quantile estimates off
  * it are oracle-checkable. Mergeable: union + re-take-k
  * ([[Sketches.sampleMerge]]) equals the single-pass sketch, which is
  * what lets per-day / per-partition sketches roll up into any window
  * without a second pass over rows (the q_kmv_rollup pattern, now for
  * QUANTILES — the production percentile primitive at 100 TB, where
  * exact per-group percentile means a full sort).
  *
  * Buffer is an interleaved primitive long array
  * [h0, bits(v0), h1, bits(v1), …] sorted by (h, v) — O(log k) search
  * + O(k) memmove per accepted row, no boxing until finish (the
  * KmvAggregator discipline); ≤ 2k longs of state per group, which is
  * also its streaming-state bound.
  */
class BottomKSampleAggregator(k: Int)
    extends Aggregator[(Long, Double), Array[Long], Array[(Long, Double)]] {

  override def zero: Array[Long] = Array.emptyLongArray

  /** Compare pair i of buf against (h, vBits) in (h, v) order. */
  private def cmp(buf: Array[Long], i: Int, h: Long, v: Double): Int = {
    val c = java.lang.Long.compare(buf(2 * i), h)
    if (c != 0) c
    else java.lang.Double.compare(java.lang.Double.longBitsToDouble(buf(2 * i + 1)), v)
  }

  private def insert(buf: Array[Long], h: Long, v: Double): Array[Long] = {
    val n = buf.length / 2
    // binary search for the (h, v) insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = cmp(buf, mid, h, v)
      if (c == 0) return buf // exact duplicate pair: sample is a set
      else if (c < 0) lo = mid + 1
      else hi = mid
    }
    if (n >= k && lo >= k) return buf // beyond the k-th smallest
    val keep = math.min(n + 1, k)
    val out = new Array[Long](keep * 2)
    System.arraycopy(buf, 0, out, 0, lo * 2)
    out(2 * lo) = h
    out(2 * lo + 1) = java.lang.Double.doubleToLongBits(v)
    System.arraycopy(buf, lo * 2, out, lo * 2 + 2, (keep - lo - 1) * 2)
    out
  }

  /** `+ 0.0` normalizes −0.0 to 0.0 at sketch input: the buffer's
    * bit-level order (Double.compare) distinguishes −0.0 < 0.0, but
    * [[Sketches.sampleMerge]]'s array_distinct/array_sort and the
    * DuckDB oracle use SQL equality where −0.0 == 0.0 — a group
    * holding both signed zeros under one hash would break the merge
    * identity. Normalizing makes the invariant (one stored value per
    * (h, v) under SQL equality) hold by construction.
    */
  override def reduce(buf: Array[Long], x: (Long, Double)): Array[Long] =
    insert(buf, x._1, x._2 + 0.0)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var acc = a
    var i = 0
    while (i < b.length) {
      acc = insert(acc, b(i), java.lang.Double.longBitsToDouble(b(i + 1)))
      i += 2
    }
    acc
  }

  override def finish(r: Array[Long]): Array[(Long, Double)] =
    Array.tabulate(r.length / 2)(i =>
      (r(2 * i), java.lang.Double.longBitsToDouble(r(2 * i + 1))))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
}

object Sketches {
  import org.apache.spark.sql.functions._

  /** The KMV hash domain: 15 hex chars = 60 bits = 2⁶⁰. */
  val Domain60: Double = 1152921504606846976.0

  /** The one 60-bit md5-derived hash every KMV face shares —
    * batch/stream equivalence pins and the DuckDB oracles depend on
    * the salt+width staying byte-identical across call sites, so the
    * expression lives in exactly one place. DuckDB twin:
    * `CAST('0x' || substring(md5('<prefix>' || x), 1, 15) AS BIGINT)`.
    */
  def md5Hash60(prefix: String, c: Column): Column =
    conv(substring(md5(concat(lit(prefix), c).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Column aggregate: k smallest distinct values of a long column,
    * sorted ascending (≤ k elements). Works grouped or global.
    */
  def kmvMins(c: Column, k: Int): Column = udaf(new KmvAggregator(k)).apply(c)

  /** Column aggregate: the bottom-k value sample —
    * array<struct<_1: long (hash), _2: double (value)>> of the k
    * lexicographically smallest (h, v) pairs, sorted. Grouped or
    * global; see [[BottomKSampleAggregator]].
    */
  def bottomKSample(h: Column, v: Column, k: Int): Column =
    udaf(new BottomKSampleAggregator(k),
      ExpressionEncoder[(Long, Double)]()).apply(h, v)

  /** Merge two bottom-k sample sketches WITHOUT rescanning rows:
    * lexicographic array_sort on the (h, v) structs is exactly the
    * sketch order, so union-distinct-take-k reproduces the single-pass
    * sketch. Pure built-in expressions (codegen).
    */
  def sampleMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Sampled values of a bottom-k sketch, sorted ascending by VALUE —
    * the input [[sampleQuantile]] reads.
    */
  def sampleValues(kept: Column): Column =
    array_sort(transform(kept, p => p.getField("_2")))

  /** Nearest-rank quantile over the sorted sample: element at
    * max(1, ceil(q·n)). No interpolation — the estimate is one of the
    * sampled doubles, so it is bit-identical cross-engine (DuckDB
    * twin: `vs[greatest(1, CAST(ceil(q * len(vs)) AS BIGINT))]`).
    * Error: the rank of the returned value is within O(n/√k) of q·n
    * with high probability — the standard uniform-sample quantile
    * bound; k = 256 gives ~6 % rank error at any n.
    */
  def sampleQuantile(vs: Column, q: Double): Column =
    element_at(vs, greatest(lit(1), ceil(lit(q) * size(vs))).cast("int"))

  /** Merge two KMV sketches WITHOUT rescanning either dataset: the k
    * smallest distinct values of the union of the kept sets — exactly
    * the sketch a single pass over both datasets would produce, which
    * is what makes per-partition / per-day sketches composable into
    * any window. Pure built-in expressions (codegen).
    */
  def kmvMerge(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Distinct-count estimate from a KMV sketch: exact below k, else
    * (k−1)·domain/kth-min, where `domain` is the hash space size the
    * values were drawn from (2⁶⁰ for q_kmv_distinct's 15-hex-char
    * hashes).
    */
  def kmvEstimate(kept: Column, k: Int, domain: Double): Column = {
    import org.apache.spark.sql.functions._
    when(size(kept) < k, size(kept).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(domain) /
        element_at(kept, -1).cast("double"))
  }
}
