package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Ingest-side operators (SURVEY.md §2.1/§2.3):
  *  S3 JSON decode w/ corrupt-record drop, F1/F2/F5 validation filters,
  *  P7 exchange enrichment.
  *
  * All are pure `DataFrame => DataFrame` so the exact same code runs
  * under batch (`spark.read`) and Structured Streaming (`readStream`).
  */
object Ingest {

  /** S3 — decode wire JSON into the MarketData shape, dropping
    * unparseable messages (reference: json.Unmarshal failure → drop,
    * ingestor.go:99-110). `from_json` in PERMISSIVE mode yields null on
    * corrupt input; the null-filter is the drop.
    */
  def parseWire(raw: DataFrame, jsonCol: String = "value",
      counted: Boolean = false): DataFrame = {
    val parsed = raw.withColumn("_m", from_json(col(jsonCol), Schemas.wireSchema))
    val corrupt = col("_m").isNull || col("_m.name").isNull
    // `counted`: publish the dropped-row count as an observed metric
    // (the reference's errors_total{type="unmarshal"}, metrics.go:8-34).
    // Dataset.observe rides the existing row flow — one CollectMetrics
    // aggregate, no second pass, no per-record instrumentation; the
    // Metrics listener picks it up from query progress.
    val observed =
      if (counted) parsed.observe("graft_unmarshal",
        sum(when(corrupt, 1L).otherwise(0L)).as("errors_unmarshal"))
      else parsed
    observed
      .filter(!corrupt)
      .select(
        col("_m.name").as("name"),
        col("_m.timestamp").as("timestamp"),
        col("_m.data.data").as("payload")
      )
  }

  /** F1 — record validation: drop if name empty or timestamp <= 0
    * (models/market_data.go:12-20). A plain conjunctive predicate keeps
    * it inside the parquet scan (pushed filters) / whole-stage codegen.
    * `counted` publishes the dropped-row count as the observed metric
    * `graft_validation.errors_validation` (reference
    * errors_total{type="validation"}) — same zero-extra-pass
    * `observe` mechanism as [[parseWire]]. Counting drops necessarily
    * anchors the filter ABOVE the metrics collection point, so use
    * `counted` on streaming ingest (where the source cannot skip rows
    * anyway), not on batch paths that want the predicate pushed into
    * the scan.
    */
  def validate(df: DataFrame, nameCol: String = "name", tsCol: String = "timestamp",
      counted: Boolean = false): DataFrame = {
    val valid = col(nameCol) =!= "" && col(nameCol).isNotNull && col(tsCol) > 0
    val observed =
      if (counted) df.observe("graft_validation",
        sum(when(!valid, 1L).otherwise(0L)).as("errors_validation"))
      else df
    observed.filter(valid)
  }

  /** F2 — sink-side zero-timestamp guard (postgres.go:122-124,
    * cache_service.go:41-43). Redundant after F1 (Catalyst collapses
    * duplicate predicates), kept for parity.
    */
  def sinkGuard(df: DataFrame, tsCol: String = "timestamp"): DataFrame =
    df.filter(col(tsCol) =!= 0)

  /** P7 — dimension enrichment: left join a small symbol→exchange dim
    * and default misses to "unknown" (ingestor.go:116-122). The
    * reference rebuilds its 293-entry map per message; here the dim is
    * broadcast once — at 100 TB the fact side streams map-side with no
    * shuffle.
    */
  def enrichDim(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      dimVal: String,
      outCol: String = "exchange",
      default: String = "unknown"): DataFrame = {
    val d = dim.select(col(dimKey).as("_dk"), col(dimVal).as("_dv"))
    facts
      .join(broadcast(d), facts(factKey) === col("_dk"), "left")
      .withColumn(outCol, coalesce(col("_dv"), lit(default)))
      .drop("_dk", "_dv")
  }

  /** P6 — shape enriched rows to the persisted market_data relation
    * ([[Schemas.marketDataSchema]]: name, timestamp, exchange, data —
    * postgres.go:52-58's VARCHAR/BIGINT/VARCHAR/JSONB), JSON-encoding
    * the dynamic payload at the sink boundary (`to_json`), exactly
    * where the reference marshals it (postgres.go:121). This is the
    * DataFrame a [[graft.stream.Pipeline.JdbcSink]] appends.
    */
  def toMarketData(df: DataFrame, nameCol: String = "name",
      tsCol: String = "timestamp", exchangeCol: String = "exchange",
      payloadCol: String = "payload"): DataFrame =
    df.select(Schemas.marketDataSchema.fields.map { f =>
      (f.name match {
        case "name" => col(nameCol)
        case "timestamp" => col(tsCol)
        case "exchange" => col(exchangeCol)
        case "data" => to_json(col(payloadCol))
      }).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)

  /** The fixed ingest dataflow (§3.1): decode → validate → enrich. */
  def pipeline(raw: DataFrame, dim: DataFrame, jsonCol: String = "value"): DataFrame = {
    val decoded = parseWire(raw, jsonCol)
    enrichDim(validate(decoded), dim, "name", "symbol", "exchange")
  }
}
