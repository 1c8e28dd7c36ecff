package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dsir

/** DSIR importance resampling: weight table + importance pinned
  * against an independent plain-Scala replica; array-literal margin
  * pinned equal to the broadcast-join scorer; sketch-cut selection
  * semantics.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 64

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "the fast brown fox leaps over the lazy dog", true),
    (3L, "quarterly revenue grew eight percent on strong demand", false),
    (4L, "the lazy dog sleeps under the brown fence", false),
    (5L, "stock prices fell sharply amid rate fears", false),
    (6L, "", false))

  /** Plain-Scala replica of the whole weight derivation + scoring,
    * written from the formulas (md5 via java.security, no Spark).
    */
  private def replica(): (Map[Long, Long], Map[Long, Long]) = {
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"d|$f".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % B
    }
    def feats(t: String): Seq[String] = {
      val ts = t.trim.split(" ").filter(_.nonEmpty).toSeq
      ts ++ ts.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    def ql(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val nt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val nr = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, t, tgt) <- corpus; f <- feats(t)) {
      val b = bucket(f)
      nr(b) += 1
      if (tgt) nt(b) += 1
    }
    val shift = ql(nr.values.sum + B) - ql(nt.values.sum + B)
    val w = (0L until B).map(b =>
      b -> (ql(nt(b) + 1) - ql(nr(b) + 1) + shift)).toMap
    val z = corpus.map { case (id, t, _) =>
      id -> feats(t).map(f => w(bucket(f))).sum
    }.toMap
    (w, z)
  }

  private def docsDf = corpus.toDF("doc_id", "text", "is_target")

  test("bucketWeights == plain-Scala replica on every bucket") {
    val got = Dsir.bucketWeights(docsDf, "doc_id", "text",
        col("is_target"), B)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val (want, _) = replica()
    assert(got == want)
  }

  test("importance == plain-Scala replica; feature-less doc scores 0 " +
      "and is present") {
    val w = Dsir.bucketWeights(docsDf, "doc_id", "text", col("is_target"), B)
    val got = Dsir.importance(docsDf, "doc_id", "text", w, B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (_, want) = replica()
    assert(got == want)
    assert(got(6L) == 0L)
  }

  test("target-resembling held-out text outscores out-of-domain text") {
    val w = Dsir.bucketWeights(docsDf, "doc_id", "text", col("is_target"), B)
    val target = Seq((10L, "the brown fox jumps over the dog"),
      (11L, "revenue fell amid weak quarterly demand"))
      .toDF("doc_id", "text")
    val z = Dsir.importance(target, "doc_id", "text", w, B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z(10L) > z(11L),
      s"in-domain text should carry higher importance: $z")
  }

  test("array-literal margin expression == broadcast-join importance " +
      "(the streaming face loses nothing)") {
    val wdf = Dsir.bucketWeights(docsDf, "doc_id", "text",
      col("is_target"), B)
    val wArr = new Array[Long](B)
    wdf.collect().foreach(r => wArr(r.getLong(0).toInt) = r.getLong(3))
    val viaJoin = Dsir.importance(docsDf, "doc_id", "text", wdf, B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docsDf.select(col("doc_id"),
        Dsir.importanceMargin(col("text"), wArr, B).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaJoin)
  }

  test("sketchCut at 3/4 keeps roughly the top quarter, membership " +
      "exactly z > cut") {
    val scored = (1L to 400L).map(i => (i, i)).toDF("doc_id", "z")
    val cut = Dsir.sketchCut(scored, "doc_id", "z", 3, 4, k = 256)
    val kept = scored.filter(col("z").cast("double") > cut).count()
    assert(kept > 40 && kept < 160,
      s"cut $cut kept $kept of 400 — not roughly a quarter")
    // determinism: same cut on a re-shuffled frame
    val cut2 = Dsir.sketchCut(scored.repartition(13), "doc_id", "z", 3, 4,
      k = 256)
    assert(cut == cut2)
  }
}
