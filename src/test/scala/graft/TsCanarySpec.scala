package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Physical-type canary for the events `ts` column (round-7 postmortem:
  * the testdata generator switched events.ts from parquet
  * TIMESTAMP(NANOS) to timestamp[us] and every events query failed
  * analysis). Writes the same instants as each physical flavor the
  * generator has shipped — int64 nanos (what the nanosAsLong legacy
  * read yields from TIMESTAMP(NANOS)), timestamp[us] without UTC
  * adjustment (pyarrow's default, read as TIMESTAMP_NTZ), and
  * timestamp[us] with UTC adjustment (read as TIMESTAMP) — and pins
  * that [[Tables.events]] derives the IDENTICAL `ts_ms` from all
  * three. If the generator drifts to a fourth flavor, this spec is
  * the first thing that goes red.
  */
class TsCanarySpec extends AnyFunSuite {
  // conf-mutating suite: isolated session (see TestSpark.isolated)
  lazy val spark = TestSpark.isolated()
  import spark.implicits._

  // µs instants with sub-ms residue so floor-to-ms truncation is exercised
  private val micros = Seq(
    (1L, 1704067798778549L),
    (2L, 1704068166738090L),
    (3L, 1704068217102229L),
    (4L, 999L), // < 1 ms after epoch → ts_ms = 0
    (5L, 1704067798778999L))
  private val expectMs = micros.map { case (id, us) => (id, us / 1000L) }

  /** Scoped conf set — saves and restores the prior value so the shared
    * TestSpark session doesn't leak TIMESTAMP_MICROS into any later
    * suite in the same JVM that writes timestamp parquet.
    */
  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tscanary_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def readBack(dir: String, wantType: org.apache.spark.sql.types.DataType)
      : Seq[(Long, Long)] = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == wantType,
      s"canary wrote a flavor that loaded as ${ev.schema("ts").dataType}, " +
        s"expected $wantType — the dispatch path under test was not exercised")
    ev.select("event_id", "ts_ms").as[(Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("ts_ms identical across int64-nanos, timestamp[us] NTZ, timestamp[us] UTC") {
   withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {

    val longDir = tmp("long")
    micros.map { case (id, us) => (id, us * 1000L + 777L) } // ns with sub-µs residue
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    val ntzDir = tmp("ntz")
    micros.toDF("event_id", "us")
      .select(col("event_id"),
        // session tz is UTC in TestSpark, so TS→NTZ cast is exact
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    val ltzDir = tmp("ltz")
    micros.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$ltzDir/events.parquet")

    val fromLong = readBack(longDir, LongType)
    val fromNtz = readBack(ntzDir, TimestampNTZType)
    val fromLtz = readBack(ltzDir, TimestampType)

    assert(fromLong == expectMs, "int64-nanos path")
    assert(fromNtz == expectMs, "timestamp[us] NTZ path")
    assert(fromLtz == expectMs, "timestamp[us] UTC path")
   }
  }

  test("property: 512 random post-1970 instants agree across all three flavors") {
   withConf("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") {
    // deterministic LCG so the corpus is reproducible; micros spread over
    // 1970..2262 (the int64-nanos representable range) with sub-ms residue
    val rnd = new scala.util.Random(0x5eed8L)
    val us = (1L to 512L).map(i => (i, math.abs(rnd.nextLong()) % 9000000000000000L))
    val expect = us.map { case (id, u) => (id, u / 1000L) }

    val dirs = Map("long" -> tmp("plong"), "ntz" -> tmp("pntz"), "ltz" -> tmp("pltz"))
    us.map { case (id, u) => (id, u * 1000L + (id % 1000L)) }
      .toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"${dirs("long")}/events.parquet")
    us.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"${dirs("ntz")}/events.parquet")
    us.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"${dirs("ltz")}/events.parquet")

    assert(readBack(dirs("long"), LongType) == expect)
    assert(readBack(dirs("ntz"), TimestampNTZType) == expect)
    assert(readBack(dirs("ltz"), TimestampType) == expect)
   }
  }

  test("unsupported ts type fails loudly, not with a downstream analysis error") {
    val e = intercept[IllegalArgumentException] {
      Tables.tsMsExpr(org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
