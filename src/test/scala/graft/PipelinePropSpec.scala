package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Bars, Sample, TextOps}

/** Property tests for the round-6 pipeline operators: each Spark
  * implementation is checked against a direct Scala model on random
  * inputs, one batched Spark job per property (the TransformPropSpec
  * discipline — generators drive data, Spark runs once).
  */
class PipelinePropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, s2) = g.apply(Gen.Parameters.default, s)
        .map(v => (Option(v), s.next)).getOrElse((None, s.next))
      (s2, v)
    }.drop(1).take(n).flatMap(_._2).toSeq

  test("chunk: count formula, stitch reconstruction, token arithmetic on random docs") {
    val docGen = for {
      n <- Gen.choose(0, 200)
    } yield (1 to n).map(i => s"w$i").mkString(" ")
    val docs = sample(docGen, 60, seed = 42L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for ((maxT, ov) <- Seq((64, 16), (10, 0), (7, 6), (1, 0))) {
      val stride = maxT - ov
      val out = TextOps.chunk(df, "doc_id", "text", maxT, ov)
        .orderBy("doc_id", "chunk_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val expChunks = if (toks.length <= maxT) 1
          else math.ceil((toks.length - maxT).toDouble / stride).toInt + 1
        val rows = out(id)
        assert(rows.length == expChunks, s"doc $id cfg ($maxT,$ov)")
        // model: chunk c = toks[c*stride, c*stride+maxT)
        rows.zipWithIndex.foreach { case (r, c) =>
          val exp = toks.slice(c * stride, c * stride + maxT)
          assert(r.getString(2) == exp.mkString(" "), s"doc $id chunk $c")
          assert(r.getLong(3) == exp.length, s"doc $id chunk $c n_tokens")
        }
        // stitch: first chunk + later chunks minus their overlap prefix
        val stitched = (rows.head.getString(2) +: rows.tail.map(
          _.getString(2).split(" ").filter(_.nonEmpty).drop(ov).mkString(" ")))
          .filter(_.nonEmpty).mkString(" ")
        assert(stitched == toks.mkString(" "), s"doc $id stitch ($maxT,$ov)")
      }
    }
  }

  test("capPerGroup: output is exactly each group's k-prefix under the total order") {
    val rowGen = for {
      g <- Gen.choose(0, 9)
      q <- Gen.choose(0, 5) // deliberately narrow → many rank ties
    } yield (g.toLong, q.toLong)
    val rows = sample(rowGen, 300, seed = 7L).zipWithIndex
      .map { case ((g, q), i) => (g, i.toLong, q) }
    val df = rows.toDF("grp", "id", "quality")
    for (k <- Seq(1, 3, 10, 100)) {
      val got = Sample.capPerGroup(df, Seq(col("grp")),
        Seq(col("quality").desc, col("id")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k).map(r => (g, r._2))
      }.toSet
      assert(got == want, s"k=$k")
    }
  }

  test("ewma: Spark HOF fold equals the Scala fold bit-for-bit on random series") {
    val tickGen = for {
      key <- Gen.choose(0, 4)
      ts <- Gen.choose(0L, 2999L)
      v <- Gen.choose(-100000, 100000).map(_ / 100.0)
    } yield (key.toString, ts, v)
    val ticks = sample(tickGen, 500, seed = 99L).zipWithIndex
      .map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }
    val df = ticks.toDF("sym", "ts_ms", "event_id", "value")
    val got = Bars.ewma(df, Seq("sym"), "ts_ms", "event_id", "value",
      bucketMs = 1000L, alpha = 0.125)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(3), r.getLong(2)))).toMap
    val want = ticks.groupBy(t => (t._1, t._2 - t._2 % 1000L))
      .map { case (kb, ts) =>
        val vs = ts.sortBy(t => (t._2, t._3)).map(_._4)
        kb -> (vs.tail.foldLeft(vs.head)((a, x) => a * 0.875 + x * 0.125),
          vs.length.toLong)
      }
    assert(got == want) // exact double equality: same fold, same IEEE ops
  }
}
