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
  * sorted by (key, time, side) — time ascending backward, descending
  * forward — carrying the nearest right row as ONE STRUCT via
  * last-ignoreNulls over an unbounded-preceding frame (incremental
  * O(n) in both directions), keep left rows. The struct carry is load-bearing for correctness, not
  * style: carrying value columns independently would let a right row
  * with a null field mix with an earlier row's value for that field —
  * the match must be one row's values atomically, nulls included.
  * This costs exactly ONE shuffle + sort on (key, time) —
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
    // a right value column named like ANY left output column would emit
    // duplicate columns downstream — fail loudly at plan time instead
    val collisions = rightValueCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"rightValueCols ${collisions.mkString(", ")} collide with left column " +
        "names; alias the right value columns before the as-of join")
    val leftOnly = leftCols.filterNot(keyCols.contains)
    val t = "_asof_t"
    val rt = "_asof_rt"
    val rv = "_asof_rv"
    val rvType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField(rt, right.schema(rightTimeCol).dataType))
    // sides order rights before lefts backward (≤ includes equal time)
    // and after lefts forward (≥ includes equal time)
    val rightSide = if (backward) 0 else 2
    val l = left
      .withColumn(t, col(leftTimeCol))
      .withColumn("_side", lit(1))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftOnly.map(col) :+ lit(null).cast(rvType).as(rv): _*)
    val r = right
      .withColumn(t, col(rightTimeCol))
      .withColumn("_side", lit(rightSide))
      .select(Seq(col(t), col("_side")) ++ keyCols.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col) :+ col(rightTimeCol).as(rt): _*).as(rv): _*)
    // Both directions run as a LAST-ignoreNulls over an
    // UnboundedPreceding→CurrentRow frame, which Spark evaluates
    // incrementally (O(n) per key partition): backward scans time
    // ascending; forward scans time DESCENDING with the side order
    // flipped so an equal-time right still sorts before the left it
    // matches. The naive forward formulation — first(ignoreNulls) over
    // CurrentRow→UnboundedFollowing — uses the unbounded-following
    // frame implementation, which recomputes the aggregate per row:
    // O(n²) on a hot key.
    val base = Window.partitionBy(keyCols.map(col): _*)
    val w =
      (if (backward) base.orderBy(col(t), col("_side"))
       else base.orderBy(col(t).desc, col("_side").desc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nearest = last(col(rv), ignoreNulls = true).over(w)
    val carried = l.unionByName(r).withColumn(rv, nearest)
    val matched = toleranceMs match {
      case None => col(rv)
      case Some(tol) =>
        val rvt = col(rv).getField(rt)
        val dist = if (backward) col(t) - rvt else rvt - col(t)
        when(rvt.isNotNull && dist <= tol, col(rv))
    }
    carried.filter(col("_side") === 1)
      .withColumn(rv, matched)
      .select(keyCols.map(col) ++ leftOnly.map(col) ++
        rightValueCols.map(c => col(rv).getField(c).as(c)): _*)
  }
}
