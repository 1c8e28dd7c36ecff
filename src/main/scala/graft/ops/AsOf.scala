package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single nearest
  * right row within the same key — backward (greatest right-time ≤
  * left-time; the canonical trade → prevailing-quote enrichment) or
  * forward (smallest right-time ≥ left-time; e.g. purchase → next
  * click), optionally bounded by a max time distance (`toleranceMs`):
  * a stale match beyond the bound reports null, the way a quote older
  * than the book's validity window must not price a trade.
  *
  * Composed from built-ins per the preference order (compose > custom
  * Expression > custom SparkPlan): tag both sides, union, one window
  * sorted by (key, time, side) carrying the nearest right value across
  * (last-ignoreNulls over an unbounded-preceding frame backward;
  * first-ignoreNulls over an unbounded-following frame forward), keep
  * left rows. This costs exactly ONE shuffle + sort on (key, time) —
  * the same work a dedicated merge-join physical operator would do —
  * versus the naive inequality-join formulation, which Spark plans as
  * a broadcast-nested-loop (quadratic). A right row at the same
  * timestamp as a left row matches in both directions (≥/≤, not
  * strict): the side tag sorts rights before lefts backward and after
  * lefts forward. The tolerance check rides on a carried right-time
  * column — no second join.
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
      rightValueCols: Seq[String],
      direction: String = "backward",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    val t = "_asof_t"
    val rt = "_asof_rt"
    // sides order rights before lefts backward (≤ includes equal time)
    // and after lefts forward (≥ includes equal time)
    val rightSide = if (backward) 0 else 2
    val l = left
      .withColumn(t, col(leftTimeCol))
      .withColumn("_side", lit(1))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        (rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
          lit(null).cast(right.schema(rightTimeCol).dataType).as(rt)): _*)
    val r = right
      .withColumn(t, col(rightTimeCol))
      .withColumn("_side", lit(rightSide))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        (rightValueCols.map(col) :+ col(rightTimeCol).as(rt)): _*)
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t), col("_side"))
    val w =
      if (backward) base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def nearest(c: String) =
      if (backward) last(col(c), ignoreNulls = true).over(w)
      else first(col(c), ignoreNulls = true).over(w)
    val carried = (rightValueCols :+ rt).foldLeft(l.unionByName(r)) {
      (df, c) => df.withColumn(c, nearest(c))
    }
    val bounded = toleranceMs match {
      case None => carried
      case Some(tol) =>
        val dist = if (backward) col(t) - col(rt) else col(rt) - col(t)
        val ok = col(rt).isNotNull && dist <= tol
        rightValueCols.foldLeft(carried) { (df, c) =>
          df.withColumn(c, when(ok, col(c)))
        }
    }
    bounded.filter(col("_side") === 1).drop(t, rt, "_side")
  }
}
