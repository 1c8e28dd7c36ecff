package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Pins for the integer power-iteration PC1: an independent
  * plain-Scala replica of the whole chain (quantize → scatter →
  * centered BigInt matrix → deterministic start → truncating
  * renormalized rounds), alignment with a planted dominant direction,
  * and partitioning invariance.
  */
class Pc1Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replica(pts: Seq[Seq[Float]], dims: Int, iters: Int,
      qBits: Int): Seq[Long] = {
    val s = 1L << qBits
    val q = pts.map(_.map(x => math.round(x.toDouble * s)))
    val n = BigInt(q.length)
    val sums = (0 until dims).map(i => BigInt(q.map(_(i)).sum))
    val m = Array.tabulate(dims, dims) { (i, j) =>
      n * BigInt(q.map(r => r(i) * r(j)).sum) - sums(i) * sums(j)
    }
    val j0 = (0 until dims).minBy(i => (-m(i)(i), i))
    var v = Array.tabulate(dims)(i => if (i == j0) BigInt(1) else BigInt(0))
    val scale = BigInt(1L << 20)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => m(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x => x * scale / mx)
    }
    v.map(_.toLong).toSeq
  }

  // planted: variance concentrated along a fixed direction u with
  // small isotropic noise — PC1 must align with u
  private def planted(dims: Int, n: Int): (Seq[Seq[Float]], Seq[Double]) = {
    val u = (0 until dims).map(d => math.sin(d * 0.7 + 1) / math.sqrt(dims))
    val pts = (0 until n).map { r =>
      val t = ((r * 2654435761L % 1000) / 500.0) - 1.0 // strong axis
      (0 until dims).map { d =>
        val noise = (((r * dims + d) * 40503L % 1000) / 500.0 - 1.0) * 0.05
        (t * u(d) + noise).toFloat
      }
    }
    (pts, u)
  }

  test("pc1Power == plain-Scala replica, and is partitioning-invariant") {
    val dims = 8
    val (pts, _) = planted(dims, 60)
    val want = replica(pts, dims, iters = 3, qBits = 10)
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    def got(d: org.apache.spark.sql.DataFrame) =
      Similarity.pc1Power(d, dims, iters = 3)
        .orderBy("pos").collect().map(_.getLong(1)).toSeq
    assert(got(df) == want)
    assert(got(df.repartition(7)) == want)
  }

  test("pc1 aligns with the planted dominant direction") {
    val dims = 16
    val (pts, u) = planted(dims, 200)
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val v = Similarity.pc1Power(df, dims, iters = 5)
      .orderBy("pos").collect().map(_.getLong(1).toDouble)
    val dot = v.zip(u).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(cos > 0.99, s"PC1 should align with the planted axis, cos=$cos")
  }
}
