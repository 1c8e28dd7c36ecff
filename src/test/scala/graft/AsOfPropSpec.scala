package graft

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
