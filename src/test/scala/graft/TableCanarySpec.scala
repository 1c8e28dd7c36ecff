package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Physical-type canary for EVERY table the catalog reads (the round-8
  * verdict ask, generalizing TsCanarySpec beyond events.ts): the
  * driver regenerates /root/testdata between rounds and has already
  * shipped one physical-type change that broke analysis for half the
  * query surface (round-7 postmortem). For each plausible drift vector
  * the generator could take, this spec WRITES the alternative encoding
  * and pins that the catalog loader + representative derivations
  * produce IDENTICAL values:
  *
  *  - lineitem.l_shipdate / orders.o_orderdate: timestamp[us] UTC
  *    (current) vs int64-nanos (what TIMESTAMP(NANOS) loads as under
  *    the global nanosAsLong flag) vs timestamp[us] NTZ vs date32 —
  *    normalized by [[Tables.canonicalTsExpr]];
  *  - embeddings.embedding: list<float> (current) vs list<double>,
  *    plus vec_id/label integer-width drift — lossless under the
  *    asDouble cast every similarity op applies;
  *  - documents: doc_id/n_chars integer-width drift — harmless to the
  *    Column-API queries, pinned on a hash+tokenize+topk composite.
  *
  * The remaining tables (region/nation/customer/supplier/part) carry
  * only strings, int32/int64 keys, and doubles — the integer-width
  * drift class documents covers; strings and doubles have one physical
  * encoding both engines agree on.
  */
class TableCanarySpec extends AnyFunSuite {
  // conf-mutating suite: isolated session (see TestSpark.isolated)
  lazy val spark = TestSpark.isolated()
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tablecanary_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // --- date-column flavors -------------------------------------------------

  /** µs instants with sub-ms residue; all post-1970. */
  private val dateUs = Seq(
    (1L, 820454400000000L), // 1996-01-01
    (2L, 852076800123456L),
    (3L, 946684799999999L))

  private def writeDateFlavor(tag: String, flavor: String): String = {
    val dir = tmp(tag)
    val base = dateUs.toDF("l_orderkey", "us")
    val df = flavor match {
      case "ltz" => base.select(col("l_orderkey"),
        timestamp_micros(col("us")).as("l_shipdate"))
      case "ntz" => base.select(col("l_orderkey"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("l_shipdate"))
      case "nanos" => base.select(col("l_orderkey"),
        (col("us") * 1000L + 321L).as("l_shipdate")) // ns with sub-µs residue
      case "date" => base.select(col("l_orderkey"),
        timestamp_micros(col("us") - col("us") % 86400000000L)
          .cast(DateType).as("l_shipdate"))
    }
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("l_shipdate flavors: LTZ/NTZ pass through untouched, int64-nanos repaired — all the identical instant") {
    withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {
      // LTZ: passthrough, canonical µs
      val ltz = Tables.lineitem(spark, writeDateFlavor("ltz", "ltz"))
      assert(ltz.schema("l_shipdate").dataType == TimestampType)
      assert(ltz.select(col("l_orderkey"), unix_micros(col("l_shipdate")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq == dateUs)
      // int64 nanos (the TIMESTAMP(NANOS) legacy read): REPAIRED to µs
      // TimestampType — the flavor that fails analysis raw
      val nan = Tables.lineitem(spark, writeDateFlavor("nanos", "nanos"))
      assert(nan.schema("l_shipdate").dataType == TimestampType,
        "nanos flavor must be repaired to TimestampType")
      assert(nan.select(col("l_orderkey"), unix_micros(col("l_shipdate")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq == dateUs,
        "nanos path must truncate the sub-µs residue")
      // NTZ: passthrough (normalizing it was measured to kill the
      // parquet range pushdown); instants identical via the
      // session-tz-independent diff
      val ntz = Tables.lineitem(spark, writeDateFlavor("ntz", "ntz"))
      assert(ntz.schema("l_shipdate").dataType == TimestampNTZType,
        "NTZ must pass through untouched — see canonicalTsExpr scaladoc")
      assert(ntz.select(col("l_orderkey"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq == dateUs)
    }
  }

  test("date32 passes through; Timestamp-literal filters agree on every flavor; NTZ keeps its range pushdown") {
    withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {
      val dd = Tables.lineitem(spark, writeDateFlavor("date", "date"))
      assert(dd.schema("l_shipdate").dataType == DateType)
      assert(dd.select(col("l_orderkey"),
          expr("cast(unix_date(l_shipdate) as bigint) * 86400000000"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq ==
        dateUs.map { case (k, us) => (k, us - us % 86400000000L) })
      // the query surface's actual access pattern: a Timestamp literal
      // filter, coerced per flavor by Spark, same verdicts everywhere
      for (flavor <- Seq("ltz", "ntz", "nanos", "date")) {
        val q = Tables.lineitem(spark, writeDateFlavor(s"f_$flavor", flavor))
          .filter(col("l_shipdate") <=
            lit(java.sql.Timestamp.valueOf("1996-12-31 23:59:59")))
        assert(q.count() == 1L, s"flavor $flavor: Timestamp-literal filter")
        // the property the passthrough buys (and the round-9 q1_agg
        // regression lost): the RANGE predicate reaches the scan
        if (flavor == "ntz" || flavor == "ltz")
          assert(q.queryExecution.executedPlan.toString
            .contains("LessThanOrEqual(l_shipdate"),
            s"flavor $flavor: range predicate not pushed into the parquet scan")
      }
    }
  }

  test("o_orderdate takes the same canonical path") {
    withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {
      val dir = tmp("orders")
      dateUs.toDF("o_orderkey", "us")
        .select(col("o_orderkey"), (col("us") * 1000L).as("o_orderdate"))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val got = Tables.orders(spark, dir)
        .select(col("o_orderkey"), unix_micros(col("o_orderdate")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == dateUs)
    }
  }

  // --- embeddings flavors --------------------------------------------------

  private val vecs = Seq(
    (1L, Array(0.25f, -0.5f, 1.0f), 0),
    (2L, Array(0.125f, 0.75f, -2.0f), 1),
    (3L, Array(1.5f, 0.0f, 0.0625f), 0))

  /** Derivation every similarity op shares: asDouble → quantized dot
    * products against a fixed probe (power-of-two floats, so float and
    * double physical encodings carry the identical values).
    */
  private def derive(emb: DataFrame): Seq[(Long, Long, Int)] = {
    val probe = array(lit(0.5d), lit(-1.0d), lit(0.25d))
    emb.select(col("vec_id").cast("long"),
        round(aggregate(
          zip_with(graft.ops.Similarity.asDouble(col("embedding")), probe,
            (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x) * 1000000L).cast("long"),
        col("label").cast("int"))
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
  }

  test("embeddings: list<float> vs list<double> and integer-width drift derive identically") {
    val f32 = tmp("embf32"); val f64 = tmp("embf64")
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$f32/embeddings.parquet")
    vecs.toDF("vec_id", "embedding", "label")
      .select(col("vec_id").cast("int").as("vec_id"), // width drift too
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"),
        col("label").cast("long").as("label"))
      .write.mode("overwrite").parquet(s"$f64/embeddings.parquet")
    val a = derive(Tables.embeddings(spark, f32))
    val b = derive(Tables.embeddings(spark, f64))
    assert(a == b && a.nonEmpty)
    assert(Tables.embeddings(spark, f64)
      .schema("embedding").dataType == ArrayType(DoubleType),
      "double flavor was not exercised")
  }

  // --- documents integer-width flavors ------------------------------------

  private val docRows = Seq(
    (1L, "alpha beta gamma", "en", "src0", 16L),
    (2L, "beta beta", "en", "src1", 9L),
    (3L, "alpha beta gamma", "de", "src0", 16L))

  /** Composite touching the documents access patterns that could care
    * about width: md5-of-cast-string (shard shuffle / sampling),
    * modulo arithmetic (kind assignment), tokenize + topKBy (n_chars
    * as the ranking value).
    */
  private def deriveDocs(docs: DataFrame): (Seq[(Long, String, Long)], Seq[(String, Long)]) = {
    val rows = docs.select(col("doc_id").cast("long"),
        substring(md5(concat(lit("s|"), col("doc_id").cast("string"))), 1, 8),
        (col("doc_id") % 3).cast("long"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val topk = docs.groupBy("source")
      .agg(graft.functions.TopK.topKBy(
        col("n_chars").cast("double"), col("doc_id").cast("long"), 1).as("kept"))
      .select(col("source"), element_at(col("kept"), 1).getField("_2"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    (rows, topk)
  }

  test("documents: int32 vs int64 doc_id/n_chars derive identically") {
    val w64 = tmp("doc64"); val w32 = tmp("doc32")
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$w64/documents.parquet")
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast("int").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("int").as("n_chars"))
      .write.mode("overwrite").parquet(s"$w32/documents.parquet")
    val a = deriveDocs(Tables.documents(spark, w64))
    val b = deriveDocs(Tables.documents(spark, w32))
    assert(a == b)
    assert(Tables.documents(spark, w32).schema("doc_id").dataType == IntegerType,
      "int32 flavor was not exercised")
  }
}
