package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Pins for the integer PageRank: an independent plain-Scala replica
  * of the exact fixed-point recipe, and the centrality semantics the
  * operator exists for (hubs outrank leaves; damping keeps every
  * node above the teleport floor).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plainPageRank(edges: Seq[(Long, Long)], iters: Int,
      dampNum: Int = 85, dampDen: Int = 100,
      scaleBits: Int = 32): Map[Long, Long] = {
    val s = 1L << scaleBits
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = Math.floorDiv((dampDen - dampNum).toLong * s, dampDen.toLong)
    var r = nodes.map(_ -> s).toMap
    for (_ <- 1 to iters) {
      val ins = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (src, dst) =>
        ins(dst) += Math.floorDiv(r(src), deg(src))
      }
      r = nodes.map(id =>
        id -> (base + Math.floorDiv(dampNum.toLong * ins(id),
          dampDen.toLong))).toMap
    }
    r
  }

  test("pageRank == plain-Scala integer replica on a random-ish graph") {
    val edges = (0L until 60L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 13 + 1) % 60),
        (i, (i + 1) % 60)).filter { case (a, b) => a != b }
    }
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = plainPageRank(edges, iters = 4)
    assert(got == want && got.nonEmpty)
  }

  test("pageRank: hub outranks leaves; every node keeps the teleport floor") {
    // star: 10 leaves all point at node 0; node 0 points at node 1
    val edges = (1L to 10L).map(i => (i, 0L)) :+ ((0L, 1L))
    val r = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val floor = Math.floorDiv(15L << 32, 100L)
    assert(r(0L) > r(2L), s"hub should outrank a leaf: $r")
    assert(r(1L) > r(2L), "the hub's sole target inherits its mass")
    assert(r.values.forall(_ >= floor), "teleport floor violated")
    // leaves 2..10 are symmetric — identical ranks, exactly
    assert((2L to 10L).map(r).toSet.size == 1)
  }

  test("pageRank: dangling mass vanishes but ranking order is preserved") {
    // chain into a sink: 1 -> 2 -> 3 (3 has no out-edges)
    val edges = Seq((1L, 2L), (2L, 3L))
    val r = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(3L) > r(2L) && r(2L) > r(1L),
      s"downstream nodes accumulate rank: $r")
  }
}
