package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot product is bit-identical to the HOF fold on real embeddings") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("i"), col("v").as("av"))
    val b = emb.select(col("vec_id").as("j"), col("v").as("bv"))
    val pairs = a.crossJoin(b)
      .select(
        Similarity.dot(col("av"), col("bv")).as("native"),
        Similarity.dotHof(col("av"), col("bv")).as("hof"))
    val diff = pairs.filter(not(col("native") <=> col("hof"))).count()
    assert(diff == 0)
  }

  test("native dot: nulls and simple values") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("zero-norm convention: zero vectors flow through assign, semDedup, knnIvf with cosine 0, no row loss, no NaN capture") {
    // The one rule for the cosine family (Similarity.cosine doc):
    // a zero-norm side has cosine 0.0. Without the guard 0/0 = NaN,
    // and NaN sorts GREATER than every double — a zero-norm CENTROID
    // would win every argmax and swallow the corpus.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 0.0f)) // the zero vector
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cluster", "cv")

    // assignNearest: the zero VECTOR keeps its row, cosine 0
    // everywhere, ties break to the smallest cluster id
    val assigned = Similarity.assignNearest(vecs, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(assigned.size == 4, "a zero vector must not lose its row")
    assert(assigned(3L) == ((0L, 0.0)),
      s"zero vector: deterministic smallest-cluster tie, got ${assigned(3L)}")
    assert(assigned.values.forall(v => !v._2.isNaN), "no NaN cosines")

    // a zero-norm CENTROID must not capture anything with a finite
    // positive alternative (pre-guard it captured EVERYTHING)
    val withZeroCent = cents.union(Seq((2L, Seq(0.0, 0.0))).toDF("cluster", "cv"))
    val a2 = Similarity.assignNearest(vecs, withZeroCent).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a2(0L) == 0L && a2(1L) == 0L && a2(2L) == 1L,
      s"zero centroid must not swallow directed vectors: $a2")

    // semDedup: zero vector is no one's near-duplicate (cos 0 < tau)
    // and is kept; all rows survive to a verdict
    val sd = Similarity.semDedup(vecs, cents, threshold = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(sd.size == 4)
    assert(sd(3L), "zero vector must be kept, not deduped")
    assert(!sd(1L), "real near-dup still caught (1 dups 0)")

    // knnIvf over an at-rest layout: a zero QUERY still probes and
    // returns k finite-scored rows (rank order falls to the id
    // tie-break)
    val work = java.nio.file.Files.createTempDirectory("zero_ivf").toString
    val labeled = vecs.withColumn("label",
      when(col("vec_id") < 2, 0L).otherwise(1L))
    graft.io.AnnLayout.writeIvf(labeled, work)
    val knn = graft.io.AnnLayout.knnIvf(spark, work,
      vecs.filter(col("vec_id") === 3L), k = 2, nprobe = 2)
    val rows = knn.collect()
    assert(rows.length == 2, s"zero query lost rows: ${rows.toSeq}")
    assert(rows.forall(r => !r.getDouble(3).isNaN && r.getDouble(3) == 0.0),
      s"zero-query scores must be the 0.0 convention: ${rows.toSeq}")
  }
}
