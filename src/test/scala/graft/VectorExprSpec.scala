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
}
