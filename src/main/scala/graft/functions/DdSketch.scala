package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tail-accurate mergeable quantile sketch — the DDSketch idea
  * (Masson, Lee, Canon: "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB'19) with the
  * log-bucketing made ENGINE-EXACT.
  *
  * Why not KLL (the rank-compaction alternative): KLL's compactions
  * are randomized and merge-order-dependent — two runs of the same
  * job can return different estimates, so the estimate itself can
  * never be oracle-pinned, and on heavy-tailed VALUES a rank
  * guarantee says nothing about how wrong the p99 VALUE is.
  * DDSketch's guarantee is relative VALUE error — the meaningful
  * contract for power-law data (token counts, doc lengths, prices) —
  * and its state is a bucket-count table, a pure function of the
  * input MULTISET: merge-order-independent, so the whole sketch is
  * deterministic and the DuckDB oracle reproduces the estimate
  * hash-exactly.
  *
  * Engine-exact bucketing: the canonical DDSketch bucket
  * `ceil(log_γ(v))` is NOT portable — `ln` is not required to be
  * correctly rounded, so engines can disagree at bucket boundaries.
  * Instead the bucket key is read off the CORRECTLY-ROUNDED decimal
  * rendering `%.17e` that both JVM `format_string` (BigDecimal
  * HALF_UP over the exact expansion) and C `printf` (exact expansion,
  * round-to-nearest) produce: `(e10, d2)` = decimal exponent + first
  * two significant digits. That is a γ≈1.01..1.1 log bucketing (one
  * bucket per 1% of value at d2=99, per 10% at d2=10) with ≤ 90
  * buckets per decade — bounded state O(decades·90), fully mergeable
  * by count addition.
  *
  * Estimate: nearest-rank bucket walk, midpoint of the winning
  * bucket, reconstructed VIA A DECIMAL STRING (`"3.75e2"` → cast to
  * double) because string→double conversion is correctly rounded in
  * both engines while `pow(10, e)` is not. Guarantee: the true
  * quantile value shares the winning bucket, so
  * |est − v| ≤ 0.5·10^(e10−1), i.e. relative error ≤ 0.5/d2 — at
  * most 5% (d2=10), typically ~1%. Rank is EXACT (counts are exact),
  * so unlike a uniform k-sample the tail cannot be missed: p999 on a
  * zipf corpus lands in exactly the right bucket no matter how few
  * rows the tail holds. SketchSpec pins the bound on
  * pareto/lognormal corpora; PERF.md records measured error vs the
  * bottom-k sample at gate k.
  *
  * Domain: finite v > 0 (log buckets, as with any DDSketch) —
  * enforced inside dd2Buckets/dd2BucketsBy, so out-of-domain rows
  * are excluded from the sketch (and from n) rather than silently
  * skewing the cumulative walk.
  */
object DdSketch {

  /** `(e10, d2)` bucket key of a positive double: decimal exponent
    * and first two significant digits, parsed from the
    * correctly-rounded `%.17e` rendering (layout `d.17digits e±XX`,
    * identical across JVM and C formatting).
    */
  def dd2Key(v: Column): Column = {
    val s = format_string("%.17e", v.cast("double"))
    struct(
      split(s, "e").getItem(1).cast("int").as("e10"),
      (substring(s, 1, 1).cast("int") * 10
        + substring(s, 3, 1).cast("int")).as("d2"))
  }

  /** The sketch itself: one count per touched (e10, d2) bucket — a
    * single partial-agged shuffle over the corpus; everything after
    * runs on the bucket-table (≤ 90·decades rows). Mergeable by
    * construction: buckets(A ∪ B) == re-agg of buckets(A) ∪
    * buckets(B) (count addition — SketchSpec pins it).
    */
  def dd2Buckets(df: DataFrame, v: Column): DataFrame =
    df.filter(inDomain(v))
      .select(dd2Key(v).as("k"))
      .groupBy(col("k.e10").as("e10"), col("k.d2").as("d2"))
      .agg(count(lit(1)).as("c"))

  /** The sketch's domain, ENFORCED (not just documented): finite
    * v > 0. Without this, non-positive / NaN / ±Inf rows fell into a
    * (null, null) bucket that still inflated n and sorted FIRST in
    * the cumulative walk — silently skewed quantiles for any caller
    * who forgot the filter. Spark ORDERS NaN greater than every
    * numeric (unlike SQL-null comparison engines), so `NaN > 0` is
    * TRUE and `NaN =!= Inf` is TRUE — both would admit NaN. The one
    * predicate false for NaN, +Inf, -Inf, 0 and negatives alike
    * under Spark's ordering is `0 < d < +Inf` (NaN < Inf is false
    * because NaN sorts above Inf).
    */
  private def inDomain(v: Column): Column = {
    val d = v.cast("double")
    d > 0 && d < lit(Double.PositiveInfinity)
  }

  /** Per-GROUP bucket tables — [[dd2Buckets]] keyed by `groups`: one
    * count per (group, e10, d2). Same single partial-agged shuffle;
    * state per group stays ≤ 90·decades. This is the per-source /
    * per-tenant p99 shape, and the rollup identity holds per group
    * (counts add).
    */
  def dd2BucketsBy(df: DataFrame, groups: Seq[String], v: Column): DataFrame =
    df.filter(inDomain(v))
      .select(groups.map(col) :+ dd2Key(v).as("k"): _*)
      .groupBy(groups.map(col) :+ col("k.e10").as("e10")
        :+ col("k.d2").as("d2"): _*)
      .agg(count(lit(1)).as("c"))

  /** Per-group quantile extraction off a [[dd2BucketsBy]] table: the
    * cumulative walk partitions by group, the rank is exact per
    * group, the non-equi join stays bucket-table-sized. Returns
    * (groups..., pct, est, n).
    */
  def dd2QuantilesBy(buckets: DataFrame, groups: Seq[String],
      qs: Seq[Double]): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(groups.map(col): _*)
      .orderBy(col("e10"), col("d2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups.foldLeft(
        buckets.withColumn("cum", sum(col("c")).over(wCum))) {
      (d, g) => d.withColumnRenamed(g, s"_b_$g")
    }
    val n = buckets.groupBy(groups.map(col): _*).agg(sum(col("c")).as("n"))
    val cond = groups.map(g => col(g) === col(s"_b_$g")).reduce(_ && _) &&
      col("cum") >= col("r")
    val wSel = Window.partitionBy((groups :+ "pct").map(col): _*)
      .orderBy(col("e10"), col("d2"))
    qs.toDF("pct").crossJoin(broadcast(n))
      .withColumn("r", greatest(lit(1L),
        ceil(col("pct") * col("n")).cast("long")))
      .join(broadcast(cum), cond)
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") === 1)
      .select(groups.map(col) :+ col("pct") :+
        concat(floor(col("d2") / 10).cast("int"), lit("."),
          (col("d2") % 10).cast("int"), lit("5e"), col("e10"))
          .cast("double").as("est") :+ col("n"): _*)
  }

  /** Nearest-rank quantile estimates off a [[dd2Buckets]] table: walk
    * buckets in value order to rank ⌈q·n⌉ (exact — counts are exact),
    * reconstruct the winning bucket's midpoint `(d2+0.5)·10^(e10−1)`
    * through its decimal string. The non-equi join against the
    * cumulated bucket table is broadcast-small by design (the bucket
    * table IS the sketch). Returns (pct, est, n).
    */
  def dd2Quantiles(buckets: DataFrame, qs: Seq[Double]): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy(col("e10"), col("d2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = buckets.withColumn("cum", sum(col("c")).over(wCum))
    val n = buckets.agg(sum(col("c")).as("n"))
    val wSel = Window.partitionBy(col("pct")).orderBy(col("e10"), col("d2"))
    qs.toDF("pct").crossJoin(broadcast(n))
      .withColumn("r", greatest(lit(1L),
        ceil(col("pct") * col("n")).cast("long")))
      .join(broadcast(cum), col("cum") >= col("r"))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") === 1)
      .select(col("pct"),
        concat(floor(col("d2") / 10).cast("int"), lit("."),
          (col("d2") % 10).cast("int"), lit("5e"), col("e10"))
          .cast("double").as("est"),
        col("n"))
  }
}
