package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin matches greatest right time <= left time per key") {
    val trades = Seq(("A", 10L, 1L), ("A", 25L, 2L), ("A", 5L, 3L), ("B", 10L, 4L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L, 100.0), ("A", 20L, 101.0), ("B", 50L, 200.0))
      .toDF("sym", "t", "px")
    val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(100.0)), // t=10 -> quote t=8
      (2L, Some(101.0)), // t=25 -> quote t=20
      (3L, None),        // t=5  -> no earlier quote
      (4L, None)))       // B t=10 -> quote only at t=50
  }

  test("bucketed range join: exact [start, end) semantics, pairs once, cross-bucket intervals") {
    import graft.ops.RangeJoin
    val points = Seq(("A", 5L, 1L), ("A", 10L, 2L), ("A", 19L, 3L), ("A", 20L, 4L), ("B", 5L, 5L))
      .toDF("k", "t", "pid")
    val ranges = Seq(("A", 10L, 20L, 100L), ("A", 15L, 25L, 101L), ("B", 0L, 6L, 102L))
      .toDF("k", "s", "e", "rid")
    val out = RangeJoin.bucketed(points, ranges, "k", "t", "s", "e", bucketWidth = 10L)
      .select("pid", "rid").orderBy("pid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      (2L, 100L), // t=10 >= start inclusive
      (3L, 100L), (3L, 101L), // t=19 in both
      (4L, 101L), // t=20: excluded from [10,20), included in [15,25)
      (5L, 102L)))
  }

  test("right row at identical timestamp matches (inclusive >=)") {
    val trades = Seq(("A", 10L, 1L)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 10L, 99.0)).toDF("sym", "t", "px")
    val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px")).collect()
    assert(out.head.getDouble(3) == 99.0)
  }
}
