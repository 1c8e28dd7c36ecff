package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: the Spark implementation of an operator-backed
  * query plus (when SQL-expressible) the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables.
  *
  * Conventions that make the hash-compare stable across engines:
  *  - identical column aliases on both sides;
  *  - a deterministic total ORDER BY on both sides;
  *  - event time always as epoch-millis bigint (`ts_ms`);
  *  - double aggregates computed in exact decimal arithmetic and cast
  *    to double only at the end (decimal sums are associative, so
  *    partial-aggregation order cannot perturb low bits).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  def all: Seq[Q] =
    ReferenceQ.all ++ TransformQ.all ++ RelationalQ.all ++ TrainingQ.all ++
      StreamQ.all ++ MultimodalQ.all ++ MarketQ.all ++ CorpusQ.all ++
      PipelineQ.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
