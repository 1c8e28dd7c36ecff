package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest right-time ≤ left-time within the same key — the
  * canonical market-data enrichment (trade → prevailing quote).
  *
  * Composed from built-ins per the preference order (compose > custom
  * Expression > custom SparkPlan): tag both sides, union, one window
  * sorted by (key, time, side) carrying the last non-null right value
  * forward, keep left rows. This costs exactly ONE shuffle + sort on
  * (key, time) — the same work a dedicated merge-join physical
  * operator would do — versus the naive inequality-join formulation,
  * which Spark plans as a broadcast-nested-loop (quadratic).
  * A right row at the same timestamp as a left row matches (≥, not >):
  * rights sort before lefts on equal time via the side tag.
  *
  * `right` must be unique per (keys, rightTimeCol) — pre-dedupe with
  * Latest.keepLastPerKey; with duplicates the match would be
  * nondeterministic (same as any as-of engine).
  */
object AsOf {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "_asof_t"
    val l = left
      .withColumn(t, col(leftTimeCol))
      .withColumn("_side", lit(1))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(t, col(rightTimeCol))
      .withColumn("_side", lit(0))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop(t, "_side")
  }
}
