package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Ingest, Latest}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 1) on sf0.001: the reference's
    * hot path as one declarative plan — validate ticks (F1), enrich
    * with a broadcast dimension (P7), keep the latest record per key
    * (A1). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value", "ts_ms")
    val valid = Ingest.validate(ev, "event_type", "ts_ms")
    val enriched = Ingest.enrichDim(valid, Tables.customer(spark, dir),
      "user_id", "c_custkey", "c_mktsegment", "segment")
    Latest.keepLastPerKey(enriched, Seq("user_id"), Seq("ts_ms", "event_id"))
      .orderBy("user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
