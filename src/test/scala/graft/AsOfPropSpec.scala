package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

/** Property check: the union+window as-of formulation must agree with
  * a brute-force per-row reference on random inputs, across both
  * directions and tolerance settings — the edge cases (equal
  * timestamps, keys with no rights, all-stale matches, duplicate left
  * times) are exactly where a side-tag/window trick can silently go
  * wrong.
  */
class AsOfPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type L = (String, Long, Long)   // (sym, t, id)
  private type R = (String, Long, Double)  // (sym, t, px)

  private def genCase(seed: Long): (Seq[L], Seq[R]) = {
    val params = Gen.Parameters.default
    def sample[A](g: Gen[A], n: Long): A =
      g.pureApply(params, rng.Seed(seed ^ n))
    val syms = Seq("A", "B", "C")
    val nl = sample(Gen.choose(1, 25), 1)
    val nr = sample(Gen.choose(0, 25), 2)
    // small time domain on purpose: forces equal-timestamp collisions
    val lefts = (0 until nl).map { i =>
      (sample(Gen.oneOf(syms), 10 + i), sample(Gen.choose(0L, 30L), 100 + i), i.toLong)
    }
    // right times unique per (sym, t) — the operator's documented contract
    val rights = (0 until nr).map { i =>
      (sample(Gen.oneOf(syms), 1000 + i), sample(Gen.choose(0L, 30L), 2000 + i),
        sample(Gen.choose(1, 999), 3000 + i) / 10.0)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    (lefts, rights)
  }

  private def reference(lefts: Seq[L], rights: Seq[R], direction: String,
      tol: Option[Long]): Map[Long, Option[Double]] =
    lefts.map { case (sym, lt, id) =>
      val cands = rights.filter(_._1 == sym)
        .filter(r => if (direction == "backward") r._2 <= lt else r._2 >= lt)
        .filter(r => tol.forall(m => math.abs(lt - r._2) <= m))
      val best =
        if (direction == "backward") cands.sortBy(_._2).lastOption
        else cands.sortBy(_._2).headOption
      id -> best.map(_._3)
    }.toMap

  test("bucketed range join agrees with the plain inequality join across widths and seeds") {
    import graft.ops.RangeJoin
    val params = Gen.Parameters.default
    for (seed <- 1L to 8L; width <- Seq(1L, 3L, 7L, 100L)) {
      def sample[A](g: Gen[A], n: Long): A =
        g.pureApply(params, rng.Seed(seed * 7919 ^ n))
      val syms = Seq("A", "B")
      // negative times on purpose: `div` truncates toward zero, and the
      // bucketing must still cover every (point, interval) pair
      val points = (0 until sample(Gen.choose(1, 20), 1)).map { i =>
        (sample(Gen.oneOf(syms), 10 + i), sample(Gen.choose(-40L, 40L), 100 + i), i.toLong)
      }
      val ranges = (0 until sample(Gen.choose(0, 15), 2)).map { i =>
        val s = sample(Gen.choose(-40L, 40L), 1000 + i)
        // includes empty (len 0) and longer-than-width intervals
        (sample(Gen.oneOf(syms), 500 + i), s, s + sample(Gen.choose(0L, 25L), 2000 + i), i.toLong)
      }
      val pDf = points.toDF("k", "t", "pid")
      val rDf = ranges.toDF("k", "s", "e", "rid")
      val got = RangeJoin.bucketed(pDf, rDf, "k", "t", "s", "e", width)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = pDf.join(rDf, Seq("k"))
        .filter(col("t") >= col("s") && col("t") < col("e"))
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=$seed width=$width")
    }
  }

  test("asOfJoin agrees with brute force across directions, tolerances, and seeds") {
    for (seed <- 1L to 12L; direction <- Seq("backward", "forward");
         tol <- Seq(None, Some(0L), Some(5L))) {
      val (lefts, rights) = genCase(seed)
      val got = AsOf.asOfJoin(
          lefts.toDF("sym", "t", "id"), rights.toDF("sym", "t", "px"),
          Seq("sym"), "t", "t", Seq("px"), direction, tol)
        .collect()
        .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
        .toMap
      val want = reference(lefts, rights, direction, tol)
      assert(got == want,
        s"seed=$seed direction=$direction tol=$tol\nlefts=$lefts\nrights=$rights")
    }
  }
}
