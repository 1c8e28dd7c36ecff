package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-bucketed market bars: OHLC candles and volume-weighted average
  * price — the aggregation layer every market-data consumer builds on
  * top of a tick feed (the reference stores raw ticks and serves
  * latest-per-key, market-data-ingestor-go storage/postgres.go:31-44;
  * bar construction is the canonical downstream query on that table).
  *
  * Scale shape: both ops are a single groupBy over (key, bucket) —
  * ONE shuffle of one row per (partition, key, bucket) after map-side
  * partial aggregation. open/close ride `min_by`/`max_by` whose
  * partial state is a single (ord, value) pair, so a 100 TB tick
  * history aggregates with no window, no sort, and no per-key
  * materialization. Bucket count bounds output cardinality, not input.
  */
object Bars {

  /** Packs (ts_ms, tie) into one orderable int64: ts_ms * 10^6 + tie.
    * A composite struct would also order correctly in Spark, but the
    * packed long keeps `min_by` partial state primitive (no object
    * allocation per row in the agg buffer) AND is expressible in
    * every SQL engine — the DuckDB oracle reproduces it verbatim,
    * where struct-ordered arg_min is not portable.
    *
    * Domain proof: epoch ms < 2^43 until year 2248; 2^43 * 10^6 <
    * 2^63, so the pack cannot overflow ANSI int64 for tie < 10^6.
    * Callers with wider tie-breaker domains must pre-rank ties.
    */
  val TiePack = 1000000L

  private def ord(tsMs: Column, tie: Column): Column =
    tsMs * lit(TiePack) + tie

  /** OHLC bars: per (keys..., bucket of `bucketMs`) — open = first
    * value by (ts, tie), close = last, high/low = max/min, plus tick
    * count and exact-decimal volume sum. Ties on ts are broken by
    * `tieCol` (unique id < 10^6 per ms — see [[TiePack]]), making
    * open/close deterministic under any partitioning.
    */
  def ohlc(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      tieCol: String, valueCol: String, bucketMs: Long): DataFrame = {
    val o = ord(col(tsMsCol), col(tieCol))
    val v = col(valueCol)
    ticks
      .withColumn("bucket_ms", col(tsMsCol) - col(tsMsCol) % lit(bucketMs))
      .groupBy((keyCols :+ "bucket_ms").map(col): _*)
      .agg(
        min_by(v, o).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, o).as("close"),
        count(lit(1)).as("n_ticks"),
        sum(v.cast(DecimalType(20, 6))).cast("double").as("sum_value"))
  }

  /** Volume-weighted average price per (keys..., bucket): sum(v·w) /
    * sum(w), both sums in exact decimal (source doubles carry ≤2
    * fractional digits, weights are integers, so products are exact
    * and partial-agg order cannot perturb the result); the one final
    * division is double-on-exact-integers, bit-identical across
    * engines. Zero-weight buckets yield NULL (SQL division), not NaN.
    */
  def vwap(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      valueCol: String, weightCol: String, bucketMs: Long): DataFrame =
    ticks
      .withColumn("bucket_ms", col(tsMsCol) - col(tsMsCol) % lit(bucketMs))
      .groupBy((keyCols :+ "bucket_ms").map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(12, 2)) *
          col(weightCol).cast(DecimalType(10, 0))).as("_sum_vw"),
        sum(col(weightCol).cast(DecimalType(20, 0))).as("_sum_w"),
        count(lit(1)).as("n_ticks"))
      .withColumn("vwap",
        col("_sum_vw").cast("double") /
          when(col("_sum_w") =!= 0, col("_sum_w").cast("double")))
      .drop("_sum_vw")
      .withColumn("sum_weight", col("_sum_w").cast("long"))
      .drop("_sum_w")
}
