package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Pins for deterministic k-means‖ seeding: an independent plain-Scala
  * replica of the whole chain (the GraphSpec/LmSpec discipline — the
  * DuckDB oracle checks cross-engine replay; this checks the MATH),
  * partitioning invariance, and the seeding-quality property that
  * motivates the operator (distance-aware seeds spread across planted
  * clusters where first-k-ids seeding starts crowded).
  */
class KppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala k-means‖, written directly from the derandomized
    * recipe — no Spark, no shared code with the operator.
    */
  private def replica(pts: Seq[(Long, Seq[Double])], k: Int, rounds: Int,
      l: Int, scaleBits: Int, salt: String): Seq[(Long, Long, Long)] = {
    val s = 1L << scaleBits
    def fold(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      fold(a, a) - 2.0 * fold(a, b) + fold(b, b)
    def h60(prefix: String, v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((prefix + v).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    var cands = Vector(pts.minBy(_._1))
    for (r <- 1 to rounds) {
      val qs = pts.map { case (id, v) =>
        id -> math.round(cands.iterator.map(c => d2(v, c._2)).min * s) }
      val phi = qs.map(_._2).sum
      if (phi > 0) {
        val qm = qs.toMap
        val kept = pts.filter { case (id, _) =>
          BigInt(h60(s"$salt$r|", id.toString)) * phi <
            BigInt(l) * qm(id) * BigInt(1L << 60) }
        cands = cands ++ kept.sortBy(_._1)
      }
    }
    require(cands.length >= k, s"replica candidates ${cands.length} < $k")
    val w = pts.groupBy { case (_, v) =>
      cands.minBy { case (cid, cv) => (d2(v, cv), cid) }._1
    }.map { case (cid, g) => cid -> g.length.toLong }
    val weighted = cands.map { case (id, cv) => (id, cv, w.getOrElse(id, 0L)) }
    val chosen = scala.collection.mutable.ArrayBuffer(
      weighted.minBy { case (id, _, cw) => (-cw, id) })
    while (chosen.length < k) {
      val (id, cv, cw, _) = weighted.filter(c => !chosen.exists(_._1 == c._1))
        .map { case (i, v, w0) => (i, v, w0,
          w0 * chosen.iterator.map(ch => math.round(d2(v, ch._2) * s)).min) }
        .minBy { case (i, _, _, sc) => (-sc, i) }
      chosen += ((id, cv, cw))
    }
    chosen.zipWithIndex.map { case ((id, _, cw), i) =>
      (i.toLong, id, cw) }.toSeq
  }

  // four planted blobs at corners of a square, DELIBERATELY id-sorted
  // so the first-k ids all fall in blob 0 — the regime first-k seeding
  // gets wrong by construction
  private def planted: Seq[(Long, Seq[Double])] = {
    val corners = Seq(Seq(10.0, 10.0), Seq(-10.0, 10.0),
      Seq(10.0, -10.0), Seq(-10.0, -10.0))
    (0 until 48).map { i =>
      val blob = i / 12 // ids 0..11 all in blob 0
      val jx = (i % 12) * 0.01
      (i.toLong, Seq(corners(blob)(0) + jx, corners(blob)(1) - jx))
    }
  }

  test("kmeansParInit == plain-Scala replica, and is partitioning-invariant") {
    val pts = planted
    val df = pts.toDF("vec_id", "embedding")
    val want = replica(pts, k = 4, rounds = 2, l = 4,
      scaleBits = 20, salt = "kpp|")
    def got(d: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansParInit(d, 4, rounds = 2, oversample = 4)
        .select("cluster", "vec_id", "w")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got(df) == want)
    assert(got(df.repartition(7)) == want)
  }

  test("kpp seeds spread across planted clusters; first-k seeding starts crowded") {
    val pts = planted
    val df = pts.toDF("vec_id", "embedding")
    def blobOf(id: Long): Long = id / 12
    val kpp = Similarity.kmeansParInit(df, 4, rounds = 2, oversample = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(kpp.map(blobOf).distinct.length == 4,
      s"kpp seeds $kpp cover blobs ${kpp.map(blobOf).distinct}")
    // the first-k baseline by construction sits entirely in blob 0
    assert((0L until 4L).map(blobOf).distinct.length == 1)
    // and feeding the kpp seeds into Lloyd recovers the planted blobs
    val cents = Similarity.kmeans(df, 4, iters = 2,
      seeds = Similarity.kmeansParInit(df, 4, rounds = 2, oversample = 4)
        .select("cluster", "cv"))
    val assigned = Similarity.assignNearest(df, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byBlob = assigned.groupBy { case (id, _) => blobOf(id) }
      .map { case (_, g) => g.map(_._2).distinct.length }
    assert(byBlob.forall(_ == 1), "each planted blob maps to one cluster")
    assert(assigned.map(_._2).distinct.length == 4,
      "all four clusters in use after Lloyd from kpp seeds")
  }
}
