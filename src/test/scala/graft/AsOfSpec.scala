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

  test("right row at identical timestamp matches (inclusive >=)") {
    val trades = Seq(("A", 10L, 1L)).toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 10L, 99.0)).toDF("sym", "t", "px")
    val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px")).collect()
    assert(out.head.getDouble(3) == 99.0)
  }
}
