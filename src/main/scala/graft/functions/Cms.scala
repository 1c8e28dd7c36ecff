package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch as two composable plan fragments (build / point
  * query) over deterministic md5-salted bucket hashing — the
  * frequency-summary sibling of [[Sketches]]' KMV distinct-count
  * sketch (q_heavy_hitters is the oracle-checked face; Probe's
  * cms_heavy is the scale evidence).
  *
  * Scale shape: the build is map-side partial aggregation onto a
  * FIXED d×w counter matrix — the exchange carries ≤ d·w rows per
  * partition no matter the input size, and per-shard sketches ADD
  * cell-wise into any window's sketch without rescanning. Point
  * queries join the broadcast counter table and take the min over
  * the d rows: a guaranteed overestimate with error ≤ (e/w)·N at
  * confidence 1 − e^−d.
  */
object Cms {

  /** Bucket of `key` in hash row i: md5-salted 60-bit value mod width. */
  def bucket(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"c$i|"), key).cast("binary")),
      1, 15), 16, 10).cast("long"), lit(width.toLong))

  /** All d (row, bucket) increments of `key`, as a posexplode. */
  def buckets(key: Column, depth: Int, width: Int): Column =
    posexplode(array((0 until depth).map(i => bucket(i, key, width)): _*))

  /** The d×w counter table (columns i, b, cnt) of a key column. */
  def build(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(buckets(key, depth, width).as(Seq("i", "b")))
      .groupBy("i", "b").agg(count(lit(1)).as("cnt"))

  /** Point-query a sketch: adds `est_cms` (min over the d buckets) to
    * a candidate table. The d×w sketch is the broadcast side BY
    * CONSTRUCTION — at scale the candidate side is the unbounded one.
    */
  def estimate(candidates: DataFrame, cms: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val carried = candidates.columns.map(col).toSeq
    candidates
      .select(carried :+ buckets(key, depth, width).as(Seq("i", "b")): _*)
      .join(broadcast(cms), Seq("i", "b"))
      .groupBy(carried: _*).agg(min(col("cnt")).as("est_cms"))
  }
}
