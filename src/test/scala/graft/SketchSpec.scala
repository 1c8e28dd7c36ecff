package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sketches

/** KmvAggregator must return exactly the k smallest DISTINCT values —
  * identical to the sort-based formulation — regardless of how the
  * input is partitioned (merge is associative + commutative, which is
  * what lets Spark partial-aggregate it map-side).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8
  // duplicates on purpose: distinctness is part of the contract
  private val data = (1 to 500).map(i => (s"g${i % 3}", ((i * 2654435761L) % 997) + 3))

  private def sortBased = data.toDF("g", "h").distinct()
    .groupBy("g").agg(slice(sort_array(collect_list(col("h"))), 1, k).as("kept"))
    .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("kmvMins equals the sort-based k smallest distinct values") {
    val got = data.toDF("g", "h")
      .groupBy("g").agg(Sketches.kmvMins(col("h"), k).as("kept"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == sortBased)
  }

  test("result is invariant to input partitioning (mergeable partials)") {
    val expected = sortBased
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("g", "h").repartition(parts)
        .groupBy("g").agg(Sketches.kmvMins(col("h"), k).as("kept"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got == expected, s"diverged at $parts partitions")
    }
  }

  test("fewer than k distinct values returns them all, sorted") {
    val small = Seq(("a", 5L), ("a", 1L), ("a", 5L), ("a", 9L)).toDF("g", "h")
    val got = small.groupBy("g").agg(Sketches.kmvMins(col("h"), k).as("kept"))
      .collect().head.getSeq[Long](1)
    assert(got == Seq(1L, 5L, 9L))
  }
}
