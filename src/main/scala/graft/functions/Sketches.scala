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
