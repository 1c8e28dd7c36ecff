package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    *
    * The precondition is ENFORCED per row (one codegen'd branch): a
    * tie ≥ 10^6 would silently collide packed ordinals across
    * adjacent milliseconds, making open/close partition-dependent —
    * the exact nondeterminism the pack exists to rule out — so it
    * raises instead.
    */
  val TiePack = 1000000L

  private def ord(tsMs: Column, tie: Column): Column =
    when(tie >= 0 && tie < lit(TiePack), tsMs * lit(TiePack) + tie)
      .otherwise(raise_error(concat(
        lit(s"Bars tie-breaker out of [0, $TiePack): "), tie.cast("string"),
        lit(" — pre-rank ties (e.g. row_number per ms) before ohlc"))).cast("long"))

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

  /** TWAP — time-weighted average price per (keys..., bucket): each
    * price is weighted by how long it was the LIVE price (from its
    * tick to the next tick in the bucket; the last price holds to
    * bucket end), which is what makes the average robust to burst
    * sampling — a thousand quotes in one millisecond move a tick-count
    * average but not a time-weighted one. Convention: the bucket's
    * coverage runs first-tick→bucket-end (no carry-in of the previous
    * bucket's closing price — carry-in needs cross-bucket state and a
    * different contract; `held_ms` exposes the covered span so callers
    * can see partial coverage). Exact decimal price×duration sums,
    * double division last — same cross-engine parity rule as [[vwap]].
    *
    * Scale shape: one keyed window (lead over (bucket, ts, tie)) for
    * the holding times, then the grouped agg REUSES the window's hash
    * partitioning — one data shuffle total, the same cost class as
    * [[moveVol]]'s lag.
    */
  def twap(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      tieCol: String, valueCol: String, bucketMs: Long): DataFrame = {
    val bucketed = ticks
      .withColumn("bucket_ms", col(tsMsCol) - col(tsMsCol) % lit(bucketMs))
    val w = Window
      .partitionBy((keyCols :+ "bucket_ms").map(col): _*)
      .orderBy(col(tsMsCol), col(tieCol))
    bucketed
      .withColumn("_hold_ms",
        coalesce(lead(col(tsMsCol), 1).over(w),
          col("bucket_ms") + lit(bucketMs)) - col(tsMsCol))
      .groupBy((keyCols :+ "bucket_ms").map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(12, 2)) *
          col("_hold_ms").cast(DecimalType(12, 0))).as("_sum_pt"),
        sum(col("_hold_ms").cast(DecimalType(20, 0))).as("_sum_t"),
        count(lit(1)).as("n_ticks"))
      .withColumn("twap",
        col("_sum_pt").cast("double") /
          when(col("_sum_t") =!= 0, col("_sum_t").cast("double")))
      .drop("_sum_pt")
      .withColumn("held_ms", col("_sum_t").cast("long"))
      .drop("_sum_t")
  }

  /** Per-bucket EWMA — y_i = (1−α)·y_{i−1} + α·x_i folded over the
    * bucket's ticks in (ts, tie) order, y_0 = first tick: the smoothed
    * close that weights recent ticks α-geometrically, the standard
    * denoised bar feature. An ordered fold is inherently sequential,
    * so it runs as a HOF fold over the bucket's sorted tick array —
    * exactly the cross-engine-exact technique the cosine kernels use
    * (DuckDB's list_reduce folds the same direction with the same
    * expression, so doubles match bit-for-bit; α is kept a
    * dyadic-rational literal in BOTH engines).
    *
    * Scale shape: one partial-agg shuffle like [[ohlc]]; the per-group
    * state is the bucket's tick array, so memory is bounded by ticks
    * per (key, bucket) — size `bucketMs` to the feed rate (the same
    * sizing rule as any windowed collect). Not for unbounded buckets;
    * the bounded-state per-bar alternatives are [[ohlc]]/[[vwap]].
    */
  def ewma(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      tieCol: String, valueCol: String, bucketMs: Long,
      alpha: Double = 0.125): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val bucketed = ticks
      .withColumn("bucket_ms", col(tsMsCol) - col(tsMsCol) % lit(bucketMs))
    bucketed
      .groupBy((keyCols :+ "bucket_ms").map(col): _*)
      .agg(
        array_sort(collect_list(struct(
          col(tsMsCol).as("t"), col(tieCol).as("o"),
          col(valueCol).cast("double").as("v")))).as("_s"),
        count(lit(1)).as("n_ticks"))
      .withColumn("_vals", transform(col("_s"), x => x("v")))
      .withColumn("ewma",
        aggregate(
          slice(col("_vals"), lit(2), greatest(size(col("_vals")) - 1, lit(0))),
          element_at(col("_vals"), 1),
          (acc, x) => acc * lit(1 - alpha) + x * lit(alpha)))
      .drop("_s", "_vals")
  }

  /** Multi-resolution OHLC in ONE scan: candles at several bucket
    * widths (e.g. 10 min and 1 h) from a single pass over the ticks,
    * via native grouping sets — Catalyst's Expand generates the
    * per-resolution replicas MAP-SIDE and every aggregate
    * partial-aggregates before the one shuffle, so the exchange
    * carries bar-cardinality rows per resolution while the 100 TB
    * tick scan happens once (vs once per resolution when calling
    * [[ohlc]] per width — the scan, not the agg, dominates at scale).
    * Output: one row per (keys..., granularity_ms, bucket_ms).
    */
  def ohlcMulti(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      tieCol: String, valueCol: String, bucketsMs: Seq[Long]): DataFrame = {
    require(bucketsMs.nonEmpty && bucketsMs.distinct.size == bucketsMs.size,
      s"bucketsMs must be non-empty and distinct: $bucketsMs")
    val keys = keyCols.map(col)
    val v = col(valueCol)
    val bcols = bucketsMs.zipWithIndex.map { case (b, i) =>
      (col(tsMsCol) - col(tsMsCol) % lit(b)).as(s"_b$i")
    }
    val withB = ticks.select(
      (keys :+ v :+ ord(col(tsMsCol), col(tieCol)).as("_o")) ++ bcols: _*)
    val sets = bucketsMs.indices.map(i => (keys :+ col(s"_b$i")).toSeq)
    // grouping() is only legal inside the grouping-sets aggregate, so
    // the per-resolution flags come out of agg and fold into the
    // granularity tag one select above.
    val gflags = bucketsMs.indices.map(i => grouping(col(s"_b$i")).as(s"_g$i"))
    val gran = bucketsMs.indices.foldLeft(lit(null).cast("long")) { (acc, i) =>
      when(col(s"_g$i") === 0, lit(bucketsMs(i))).otherwise(acc)
    }
    withB
      .groupingSets(sets, keys ++ bucketsMs.indices.map(i => col(s"_b$i")): _*)
      .agg(gflags.head, gflags.tail ++ Seq(
        min_by(v, col("_o")).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col("_o")).as("close"),
        count(lit(1)).as("n_ticks"),
        sum(v.cast(DecimalType(20, 6))).cast("double").as("sum_value")): _*)
      .select(keys ++ Seq(gran.as("granularity_ms"),
        coalesce(bucketsMs.indices.map(i => col(s"_b$i")): _*).as("bucket_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"), col("sum_value")): _*)
  }

  /** Tick-to-tick move volatility per (keys..., bucket): sample mean
    * and standard deviation of successive value CHANGES within each
    * key's (ts, tie)-ordered tick series — the realized-volatility
    * bar every risk/feature pipeline derives from ticks. Differences
    * are exact-decimal subtractions (no division per row), power sums
    * stay decimal until the per-GROUP closed form, so partial-agg
    * order cannot perturb a bit and the result is engine-portable.
    * The first move of a bucket uses the previous bucket's last tick
    * (the series is continuous per key, not reset per bar).
    *
    * Scale shape: ONE (key)-partitioned window sort for the lag (same
    * cost class as the as-of join's time sort; key cardinality =
    * instruments, so partitions parallelize) followed by the same
    * single partial+final agg as [[ohlc]] — the shuffle after the
    * window carries one 3-sum row per (partition, key, bucket).
    * Buckets with <2 moves yield NULL vol (guarded division), not NaN.
    */
  def moveVol(ticks: DataFrame, keyCols: Seq[String], tsMsCol: String,
      tieCol: String, valueCol: String, bucketMs: Long): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(ord(col(tsMsCol), col(tieCol)))
    val x = col(valueCol).cast(DecimalType(12, 2))
    val d = x - lag(x, 1).over(w)
    val n = col("n_moves")
    ticks
      .withColumn("bucket_ms", col(tsMsCol) - col(tsMsCol) % lit(bucketMs))
      .withColumn("_d", d)
      .groupBy((keys :+ col("bucket_ms")): _*)
      .agg(
        count(col("_d")).as("n_moves"),
        sum(col("_d")).cast("double").as("_sd"),
        sum(col("_d") * col("_d")).cast("double").as("_sdd"))
      .select(keys ++ Seq(col("bucket_ms"), n,
        when(n > 0, col("_sd") / n).as("mean_move"),
        when(n >= 2, sqrt(
          (n * col("_sdd") - col("_sd") * col("_sd")) /
            (n.cast("double") * (n - 1)))).as("vol_move")): _*)
  }

  /** Gap-fill resample: densify a bar table to a contiguous per-key
    * bucket spine (min..max observed bucket per key) and forward-fill
    * `fillCol` across the gaps (last non-null by bucket order), with
    * `is_gap` marking synthesized rows. The standard time-series
    * resample every charting/feature pipeline runs on bars.
    *
    * Scale shape: the spine is generated from ONE aggregated row per
    * key (sequence + explode, map-side after a bars-sized agg — spine
    * cardinality is keys × time-range/bucket, independent of tick
    * count); the left join is an equality join on (key, bucket); the
    * forward-fill window sorts BAR rows, not ticks. Nothing in the
    * plan touches raw-tick cardinality, so a 100 TB tick history
    * resamples at the cost of its (vastly smaller) bar table.
    */
  def resampleFfill(barsIn: DataFrame, keyCols: Seq[String],
      bucketCol: String, bucketMs: Long, fillCol: String): DataFrame = {
    val keys = keyCols.map(col)
    // The bar table feeds two consumers (spine bounds + the fill join)
    // whose different column pruning defeats exchange reuse — without a
    // cut, the upstream bar AGGREGATION (and its tick scan) runs twice.
    // Same lazy-localCheckpoint pattern as Dedup.minhashLshPairs: the
    // first consumer materializes the (small, bar-cardinality) table,
    // the second reads the cached blocks. Long-running cluster jobs
    // should persist bars to a real table instead (non-reliable blocks).
    val bars = barsIn
      .select((keyCols :+ bucketCol).map(col) :+ col(fillCol): _*)
      .localCheckpoint(false)
    val spine = bars.groupBy(keys: _*)
      .agg(min(col(bucketCol)).as("_lo"), max(col(bucketCol)).as("_hi"))
      .select(keys :+ explode(
        sequence(col("_lo"), col("_hi"), lit(bucketMs))).as(bucketCol): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(bars.select((keyCols :+ bucketCol).map(col) :+
        col(fillCol).as("_fill"): _*), keyCols :+ bucketCol, "left")
      .select(keys ++ Seq(col(bucketCol),
        last(col("_fill"), ignoreNulls = true).over(w).as(fillCol),
        col("_fill").isNull.as("is_gap")): _*)
  }
}
