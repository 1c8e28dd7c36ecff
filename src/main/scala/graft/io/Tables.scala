package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized parquet table access for the driver-generated test data
  * (TESTDATA.md). All readers go through here so session-level quirks
  * are handled once.
  *
  * Scale note: at 100 TB these reads are partitioned parquet scans;
  * everything downstream relies on Catalyst pushing filters/projections
  * into the scan, so ops in graft.ops never materialize or collect —
  * they stay `DataFrame => DataFrame`.
  */
object Tables {

  /** The events table carries a parquet TIMESTAMP(NANOS) column, which
    * Spark's vectorized reader rejects by default; this legacy flag
    * (SPARK-40819) reads it as LongType nanos instead. Runtime-settable,
    * so it works regardless of who built the SparkSession.
    */
  private def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    withNanosAsLong(spark).read.parquet(s"$sfDir/$name.parquet")

  /** events with a canonical epoch-millis column `ts_ms` (bigint).
    * Milliseconds are the reference's native timestamp unit
    * (server.go:215 time.Now().UnixMilli()), and ms-truncation agrees
    * bit-for-bit between Spark (ns div 1e6) and the DuckDB oracle
    * (epoch_ms over its µs timestamps), so all event-time logic and
    * oracle comparisons are done on ts_ms.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
