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

  test("match is one right ROW atomically — null fields don't mix with older rows' values") {
    val trades = Seq(("A", 3L, 1L)).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", 1L, Option.empty[Double], Option(1.0)), // older row has the ask
      ("A", 2L, Option(5.0), Option.empty[Double])  // nearest row: bid only
    ).toDF("sym", "t", "bid", "ask")
    val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t",
      Seq("bid", "ask")).collect().head
    assert(out.getDouble(3) == 5.0)
    // a per-column carry would smuggle ask=1.0 from the t=1 row here
    assert(out.isNullAt(4), "ask must be the matched row's null, not an older row's value")
  }

  test("forward direction matches smallest right time >= left time, equal time included") {
    val trades = Seq(("A", 10L, 1L), ("A", 21L, 2L), ("A", 50L, 3L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0))
      .toDF("sym", "t", "px")
    val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        direction = "forward")
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(100.0)), // equal time included
      (2L, Some(102.0)), // next quote after 21 is 30
      (3L, None)))       // nothing follows 50
  }

  test("tolerance nulls matches beyond the bound, both directions") {
    val trades = Seq(("A", 100L, 1L), ("A", 200L, 2L)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 95L, 1.0), ("A", 130L, 2.0)).toDF("sym", "t", "px")
    val back = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        toleranceMs = Some(10L))
      .orderBy("trade_id")
      .collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(back.toSeq == Seq(Some(1.0), None)) // 200-130=70 > 10 → stale
    val fwd = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        direction = "forward", toleranceMs = Some(10L))
      .orderBy("trade_id")
      .collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(fwd.toSeq == Seq(None, None)) // 130-100=30 > 10; nothing ≥ 200
  }
}
