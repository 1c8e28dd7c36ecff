package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.io.Tables
import graft.ops.{Bars, TextOps}

/** Market-analytics queries over the tick/event stream — the bar
  * construction and scrubbing layer a consumer of the reference's
  * stored ticks (market-data-ingestor-go storage/postgres.go:31-44)
  * runs downstream, expressed as single-shuffle grouped aggregations.
  */
object MarketQ {

  private val HourMs = 3600000L
  private val TenMinMs = 600000L

  /** OHLC candles: per (event_type, hour) — open/close via packed
    * (ts, id) `min_by`/`max_by` (deterministic under any partitioning,
    * see [[Bars.TiePack]]), high/low, tick count, exact-decimal sum.
    * One shuffle; partial agg carries one row per (partition, type,
    * hour) regardless of input scale.
    */
  val qOhlcBars = Q(
    "q_ohlc_bars",
    (spark, dir) =>
      Bars.ohlc(Tables.events(spark, dir), Seq("event_type"),
        tsMsCol = "ts_ms", tieCol = "event_id", valueCol = "value",
        bucketMs = HourMs)
        .orderBy("event_type", "bucket_ms"),
    Some(s"""WITH t AS (SELECT event_type, value, event_id,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value,
          ts_ms - ts_ms % $HourMs AS bucket_ms,
          ts_ms * ${Bars.TiePack} + event_id AS o FROM t)
      SELECT event_type, bucket_ms,
        arg_min(value, o) AS open,
        max(value) AS high,
        min(value) AS low,
        arg_max(value, o) AS close,
        count(*) AS n_ticks,
        CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
      FROM b GROUP BY event_type, bucket_ms
      ORDER BY event_type, bucket_ms""")
  )

  /** VWAP per (event_type, hour), weighted by the `k` field parsed
    * from the props JSON payload engine-side (S3/S6-style schema'd
    * parse — corrupt/missing props contribute NULL weight rows, which
    * the SQL aggregates skip on both engines). Sums are exact decimal;
    * the single final division is double-on-exact-integers.
    */
  val qVwap = Q(
    "q_vwap",
    (spark, dir) => {
      val w = from_json(col("props"),
        StructType(Seq(StructField("k", LongType)))).getField("k")
      Bars.vwap(Tables.events(spark, dir).withColumn("weight", w),
        Seq("event_type"), tsMsCol = "ts_ms", valueCol = "value",
        weightCol = "weight", bucketMs = HourMs)
        .orderBy("event_type", "bucket_ms")
    },
    Some(s"""WITH t AS (SELECT event_type, value,
          TRY_CAST(CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$$.k') END AS BIGINT) AS w,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value, w,
          ts_ms - ts_ms % $HourMs AS bucket_ms FROM t)
      SELECT event_type, bucket_ms, count(*) AS n_ticks,
        CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(w AS DECIMAL(10,0)))
            AS DOUBLE)
          / (CASE WHEN sum(CAST(w AS DECIMAL(20,0))) <> 0
               THEN CAST(sum(CAST(w AS DECIMAL(20,0))) AS DOUBLE) END)
          AS vwap,
        CAST(sum(CAST(w AS DECIMAL(20,0))) AS BIGINT) AS sum_weight
      FROM b GROUP BY event_type, bucket_ms
      ORDER BY event_type, bucket_ms""")
  )

  /** Multi-resolution candles — 1 h and 10 min bars from ONE tick
    * scan (see [[Bars.ohlcMulti]]: Expand replicates map-side, one
    * partial-agg shuffle; at 100 TB the scan happens once instead of
    * once per resolution).
    */
  val qOhlcMulti = Q(
    "q_ohlc_multi",
    (spark, dir) =>
      Bars.ohlcMulti(Tables.events(spark, dir), Seq("event_type"),
        tsMsCol = "ts_ms", tieCol = "event_id", valueCol = "value",
        bucketsMs = Seq(HourMs, TenMinMs))
        .orderBy("event_type", "granularity_ms", "bucket_ms"),
    Some(s"""WITH t AS (SELECT event_type, value, event_id,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value,
          ts_ms - ts_ms % $HourMs AS b0,
          ts_ms - ts_ms % $TenMinMs AS b1,
          ts_ms * ${Bars.TiePack} + event_id AS o FROM t)
      SELECT event_type,
        CAST(CASE WHEN GROUPING(b0) = 0 THEN $HourMs ELSE $TenMinMs END
          AS BIGINT) AS granularity_ms,
        coalesce(b0, b1) AS bucket_ms,
        arg_min(value, o) AS open,
        max(value) AS high,
        min(value) AS low,
        arg_max(value, o) AS close,
        count(*) AS n_ticks,
        CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
      FROM b
      GROUP BY GROUPING SETS ((event_type, b0), (event_type, b1))
      ORDER BY event_type, granularity_ms, bucket_ms""")
  )

  /** Realized move-volatility bars: per (event_type, hour), the sample
    * mean/stddev of successive tick-to-tick value changes (see
    * [[Bars.moveVol]] — exact-decimal diffs + power sums, one keyed
    * window sort + one agg shuffle; NULL-guarded closed form).
    */
  val qMoveVol = Q(
    "q_move_vol",
    (spark, dir) =>
      Bars.moveVol(Tables.events(spark, dir), Seq("event_type"),
        tsMsCol = "ts_ms", tieCol = "event_id", valueCol = "value",
        bucketMs = HourMs)
        .orderBy("event_type", "bucket_ms"),
    Some(s"""WITH t AS (SELECT event_type,
          CAST(value AS DECIMAL(12,2)) AS x,
          epoch_ms(ts) AS ts_ms, event_id FROM events),
        d AS (SELECT event_type,
          ts_ms - ts_ms % $HourMs AS bucket_ms,
          x - lag(x) OVER (PARTITION BY event_type
            ORDER BY ts_ms * ${Bars.TiePack} + event_id) AS d
        FROM t),
        a AS (SELECT event_type, bucket_ms, count(d) AS n_moves,
          CAST(sum(d) AS DOUBLE) AS sd,
          CAST(sum(d * d) AS DOUBLE) AS sdd
        FROM d GROUP BY event_type, bucket_ms)
      SELECT event_type, bucket_ms, n_moves,
        CASE WHEN n_moves > 0 THEN sd / n_moves END AS mean_move,
        CASE WHEN n_moves >= 2 THEN
          sqrt((n_moves * sdd - sd * sd) /
            (CAST(n_moves AS DOUBLE) * (n_moves - 1))) END AS vol_move
      FROM a ORDER BY event_type, bucket_ms""")
  )

  /** PII-style scrubbing pass over the customer dimension: mask every
    * digit in the display name and report per-row redaction volume.
    * Pure map-side regex (no lookarounds — Java regex and RE2 agree);
    * zero shuffles at any scale.
    */
  val qPiiRedact = Q(
    "q_pii_redact",
    (spark, dir) =>
      Tables.customer(spark, dir)
        .select(col("c_custkey"),
          TextOps.maskDigits(col("c_name")).as("masked_name"),
          TextOps.digitCount(col("c_name")).cast("long").as("n_redacted"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
        regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
        CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS BIGINT)
          AS n_redacted
      FROM customer ORDER BY c_custkey""")
  )

  /** Gap-filled close series: hourly bars densified to a contiguous
    * per-type bucket spine with the close forward-filled across empty
    * hours (see [[Bars.resampleFfill]] for the scale argument — the
    * whole plan runs at bar cardinality, never tick cardinality).
    */
  val qGapfill = Q(
    "q_gapfill",
    (spark, dir) => {
      val bars = Bars.ohlc(Tables.events(spark, dir), Seq("event_type"),
        tsMsCol = "ts_ms", tieCol = "event_id", valueCol = "value",
        bucketMs = HourMs)
      Bars.resampleFfill(bars, Seq("event_type"), "bucket_ms", HourMs, "close")
        .orderBy("event_type", "bucket_ms")
    },
    Some(s"""WITH t AS (SELECT event_type, value, event_id,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value,
          ts_ms - ts_ms % $HourMs AS bucket_ms,
          ts_ms * ${Bars.TiePack} + event_id AS o FROM t),
        bars AS (SELECT event_type, bucket_ms,
          arg_max(value, o) AS close FROM b GROUP BY event_type, bucket_ms),
        bounds AS (SELECT event_type, min(bucket_ms) AS lo,
          max(bucket_ms) AS hi FROM bars GROUP BY event_type),
        spine AS (SELECT event_type,
          unnest(generate_series(lo, hi, $HourMs)) AS bucket_ms FROM bounds),
        g AS (SELECT s.event_type, s.bucket_ms, bars.close
          FROM spine s LEFT JOIN bars USING (event_type, bucket_ms))
      SELECT g.event_type, g.bucket_ms,
        last_value(g.close IGNORE NULLS) OVER (PARTITION BY g.event_type
          ORDER BY g.bucket_ms
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
        (g.close IS NULL) AS is_gap
      FROM g ORDER BY g.event_type, g.bucket_ms""")
  )

  /** TWAP next to VWAP (see [[Bars.twap]]): prices weighted by how
    * long each was live, per-bucket coverage first-tick→bucket-end;
    * one keyed window + one grouped agg sharing a single shuffle.
    */
  val qTwap = Q(
    "q_twap",
    (spark, dir) =>
      Bars.twap(Tables.events(spark, dir),
        Seq("event_type"), tsMsCol = "ts_ms", tieCol = "event_id",
        valueCol = "value", bucketMs = HourMs)
        .orderBy("event_type", "bucket_ms"),
    Some(s"""WITH t AS (SELECT event_type, value, event_id,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value, event_id, ts_ms,
          ts_ms - ts_ms % $HourMs AS bucket_ms FROM t),
        h AS (SELECT event_type, bucket_ms, value,
          COALESCE(lead(ts_ms) OVER (PARTITION BY event_type, bucket_ms
              ORDER BY ts_ms, event_id), bucket_ms + $HourMs) - ts_ms
            AS hold_ms
          FROM b)
      SELECT event_type, bucket_ms, count(*) AS n_ticks,
        CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(hold_ms AS DECIMAL(12,0)))
            AS DOUBLE)
          / (CASE WHEN sum(CAST(hold_ms AS DECIMAL(20,0))) <> 0
               THEN CAST(sum(CAST(hold_ms AS DECIMAL(20,0))) AS DOUBLE) END)
          AS twap,
        CAST(sum(CAST(hold_ms AS DECIMAL(20,0))) AS BIGINT) AS held_ms
      FROM h GROUP BY event_type, bucket_ms
      ORDER BY event_type, bucket_ms""")
  )

  /** Per-bucket EWMA (see [[Bars.ewma]]): ordered HOF fold, bit-exact
    * vs DuckDB's list_reduce because both engines fold the same
    * direction with the same dyadic-rational α literals.
    */
  val qEwma = Q(
    "q_ewma",
    (spark, dir) =>
      Bars.ewma(Tables.events(spark, dir),
        Seq("event_type"), tsMsCol = "ts_ms", tieCol = "event_id",
        valueCol = "value", bucketMs = HourMs, alpha = 0.125)
        .orderBy("event_type", "bucket_ms"),
    Some(s"""WITH t AS (SELECT event_type, value, event_id,
          epoch_ms(ts) AS ts_ms FROM events),
        b AS (SELECT event_type, value, event_id, ts_ms,
          ts_ms - ts_ms % $HourMs AS bucket_ms FROM t)
      SELECT event_type, bucket_ms, count(*) AS n_ticks,
        list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts_ms, event_id),
          (acc, x) -> acc * 0.875 + x * 0.125) AS ewma
      FROM b GROUP BY event_type, bucket_ms
      ORDER BY event_type, bucket_ms""")
  )

  def all: Seq[Q] =
    Seq(qOhlcBars, qOhlcMulti, qVwap, qMoveVol, qPiiRedact, qGapfill, qTwap,
      qEwma)
}
