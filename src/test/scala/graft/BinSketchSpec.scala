package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Pins for the 1-bit sign sketch + hamming-shortlist ANN: an
  * independent plain-Scala replica of sketch, hamming, shortlist and
  * rerank (the KppSpec discipline — the DuckDB oracle checks
  * cross-engine replay; this checks the MATH), partitioning
  * invariance, and the odd-dims/zero-component edge cases the
  * catalog's 64-dim face never exercises.
  */
class BinSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replicaWords(v: Seq[Float], dims: Int): Seq[Long] = {
    val nWords = (dims + 31) / 32
    (0 until nWords).map { w =>
      (0 until math.min(32, dims - w * 32)).map { b =>
        if (v(w * 32 + b) > 0f) 1L << b else 0L
      }.sum
    }
  }

  private def replicaKnn(pts: Seq[(Long, Seq[Float])], dims: Int, k: Int,
      shortlist: Int): Seq[(Long, Long, Long, Long)] = {
    val sk = pts.map { case (id, v) => id -> replicaWords(v, dims) }.toMap
    def ham(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val byId = pts.toMap
    pts.flatMap { case (qid, qv) =>
      val short = pts.filter(_._1 != qid)
        .map { case (cid, _) => (cid, ham(sk(qid), sk(cid))) }
        .sortBy { case (cid, h) => (h, cid) }.take(shortlist)
      short.map { case (cid, h) =>
        val cv = byId(cid)
        val cos = dot(qv, cv) / math.sqrt(dot(qv, qv) * dot(cv, cv))
        (qid, cid, h, cos)
      }.sortBy { case (_, cid, _, cos) => (-cos, cid) }.take(k)
        .zipWithIndex.map { case ((q, cid, h, _), i) =>
          (q, i.toLong + 1, cid, h) }
    }
  }

  private def pts(dims: Int): Seq[(Long, Seq[Float])] =
    (0 until 40).map { i =>
      (i.toLong, (0 until dims).map { d =>
        (((i * dims + d) * 2654435761L % 1000) - 500).toFloat / 500f
      })
    }

  test("binSketch == plain-Scala replica, incl. odd dims and zero components") {
    for (dims <- Seq(64, 33, 7)) {
      val data = pts(dims).map { case (id, v) =>
        // plant exact zeros (sign bit must be 0 for x == 0, not just x < 0)
        (id, v.zipWithIndex.map { case (x, j) => if ((id + j) % 11 == 0) 0f else x })
      }
      val df = data.toDF("vec_id", "embedding")
      val got = Similarity.binSketch(df, dims)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (id, ws) =>
          id -> ws.sortBy(_._2).map(_._3).toSeq }
      val want = data.map { case (id, v) => id -> replicaWords(v, dims) }.toMap
      assert(got == want, s"dims=$dims")
    }
  }

  test("centered sketch: quantized-mean thresholds match a replica; biased dim's constant bit becomes balanced") {
    val dims = 4
    // dim 0 heavily positive-shifted: raw sign bit is constant 1
    val data = (0 until 40).map { i =>
      (i.toLong, Seq(
        5.0f + (i % 7) * 0.1f,
        ((i % 5) - 2) * 0.3f,
        ((i % 3) - 1) * 0.5f,
        ((i % 11) - 5) * 0.1f))
    }
    val df = data.toDF("vec_id", "embedding")
    // replica of the quantized mean: sum(round(x*1e6)) / (n*1e6)
    val wantThr = (0 until dims).map { d =>
      data.map { case (_, v) => math.round(v(d).toDouble * 1000000.0) }.sum
        .toDouble / (data.length * 1000000L).toDouble
    }
    val gotThr = Similarity.binMeans(df, dims)
    assert(gotThr == wantThr)
    def bits(th: Seq[Double]): Map[Long, Long] =
      Similarity.binSketch(df, dims, thresholds = th)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val raw = bits(Nil)
    assert(raw.values.forall(w => (w & 1L) == 1L),
      "raw sign bit of the shifted dim should be constant 1")
    val centered = bits(wantThr)
    val ones = centered.values.count(w => (w & 1L) == 1L)
    assert(ones > 5 && ones < 35,
      s"centered bit should be roughly balanced, got $ones/40 ones")
    // and the centered sketch equals the replica cut bit-for-bit
    val want = data.map { case (id, v) =>
      id -> (0 until dims).map(d =>
        if (v(d) > wantThr(d)) 1L << d else 0L).sum
    }.toMap
    assert(centered == want)
  }

  test("knnBinary == plain-Scala replica, and is partitioning-invariant") {
    val dims = 64
    val data = pts(dims)
    val df = data.toDF("vec_id", "embedding")
    val queries = data.take(5).toDF("vec_id", "embedding")
    val want = replicaKnn(data, dims, k = 3, shortlist = 10)
      .filter(_._1 < 5)
    def got(d: org.apache.spark.sql.DataFrame) =
      Similarity.knnBinary(queries, d, dims, k = 3, shortlist = 10)
        .select("query_id", "rank", "neighbor_id", "hamming")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(got(df) == want)
    assert(got(df.repartition(7)) == want)
  }
}
