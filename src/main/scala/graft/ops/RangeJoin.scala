package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point time joined to right
  * rows with an interval [start, end), equi-keyed. Spark plans a raw
  * inequality join as BroadcastNestedLoop (quadratic per key); the
  * standard scale technique is temporal bucketization: pick a bucket
  * width ≥ the longest interval, put each point in its single bucket,
  * explode each interval into the (≤ 2 when len ≤ width) buckets it
  * overlaps, hash-join on (key, bucket), then apply the exact
  * predicate. Cost: one equi-shuffle + ≤2× right-side duplication —
  * same join shape AQE can handle for skew.
  *
  * Each matching pair is produced exactly once (a point lives in
  * exactly one bucket).
  */
object RangeJoin {

  def bucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val l = left.withColumn("_bucket", expr(s"$pointCol div $bucketWidth"))
    val r = right.withColumn("_bucket",
      explode(sequence(expr(s"$startCol div $bucketWidth"),
        // end is exclusive: the interval's last occupied bucket
        expr(s"greatest($startCol, $endCol - 1) div $bucketWidth"))))
    l.join(r, Seq(keyCol, "_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
