package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch as two composable plan fragments (build / point
  * query) over deterministic md5-salted bucket hashing — the
  * frequency-summary sibling of [[Sketches]]' KMV distinct-count
  * sketch (q_heavy_hitters / q_stream_cms are the oracle-checked
  * faces; Probe's cms_heavy is the scale evidence).
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

  /** The d/w both oracle-checked faces share (batch q_heavy_hitters
    * and streaming q_stream_cms build cell-for-cell-equal sketches
    * only while these match).
    */
  val DefaultDepth = 4
  val DefaultWidth = 512

  /** Bucket of `key` in hash row i: md5-salted 60-bit value mod width. */
  def bucket(i: Int, key: Column, width: Int): Column =
    pmod(Sketches.md5Hash60(s"c$i|", key), lit(width.toLong))

  /** All d (row, bucket) increments of `key`, as a posexplode. */
  def buckets(key: Column, depth: Int, width: Int): Column =
    posexplode(array((0 until depth).map(i => bucket(i, key, width)): _*))

  /** The d×w counter table (columns i, b, cnt) of a key column. */
  def build(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(buckets(key, depth, width).as(Seq("i", "b")))
      .groupBy("i", "b").agg(count(lit(1)).as("cnt"))

  /** Point-query a sketch: adds `est_cms` (min over the d buckets) to
    * a candidate table. The d×w sketch is the broadcast side BY
    * CONSTRUCTION — at scale the candidate side is the unbounded one
    * (a prior round's survivors, or a fixed watchlist). Each of the d
    * sketch rows joins as its own broadcast LEFT join with empty
    * buckets counting 0: a watchlist key the build never saw gets
    * est_cms = 0, not a dropped row and not a min over only its
    * colliding buckets.
    *
    * Shape: d map-side broadcast hash joins + a `least` over the d
    * looked-up counters — the candidate side never shuffles, row
    * multiplicity and every candidate column (including ones named
    * i/b/cnt) pass through untouched. Internal columns are
    * `_cms_b<i>`/`_cms_c<i>`, guarded against collision.
    */
  def estimate(candidates: DataFrame, cms: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val internal = (0 until depth).flatMap(i => Seq(s"_cms_b$i", s"_cms_c$i"))
    val clash = candidates.columns.toSet.intersect(internal.toSet)
    require(clash.isEmpty,
      s"candidate columns collide with Cms.estimate internals: $clash")
    val joined = (0 until depth).foldLeft(candidates) { (acc, i) =>
      acc.join(broadcast(cms.filter(col("i") === i)
          .select(col("b").as(s"_cms_b$i"), col("cnt").as(s"_cms_c$i"))),
        bucket(i, key, width) === col(s"_cms_b$i"), "left")
    }
    val cnts = (0 until depth).map(i => coalesce(col(s"_cms_c$i"), lit(0L)))
    joined
      .withColumn("est_cms", if (depth == 1) cnts.head else least(cnts: _*))
      .drop(internal: _*)
  }
}
