package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Ingest, Latest}

/** Queries exercising the reference's own operator surface
  * (SURVEY.md §2) over the `events` table, which stands in for the
  * market-tick stream: user_id ≈ symbol key, ts ≈ tick time, props ≈
  * the open JSON payload, value ≈ a numeric payload field.
  */
object ReferenceQ {

  /** A1 keep-last-per-key — the Redis cache semantic
    * (cache_service.go:45-52) as a deterministic argmax per user_id.
    */
  val qLatestPerKey = Q(
    "q_latest_per_key",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select("user_id", "event_id", "ts_ms", "event_type", "value")
      Latest.keepLastPerKey(ev, Seq("user_id"), Seq("ts_ms", "event_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, ts_ms, event_type, value FROM (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events) t WHERE rn = 1 ORDER BY user_id""")
  )

  /** P7 dimension enrichment — broadcast lookup with "unknown" default
    * (ingestor.go:116-122), customer standing in for the symbol dim.
    */
  val qEnrichDim = Q(
    "q_enrich_dim",
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "event_type")
      Ingest.enrichDim(ev, Tables.customer(spark, dir),
          "user_id", "c_custkey", "c_mktsegment", "segment")
        .select("event_id", "user_id", "event_type", "segment")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, e.event_type,
             coalesce(c.c_mktsegment, 'unknown') AS segment
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id""")
  )

  /** F1 validation + S3 payload decode — parse the JSON payload field
    * `k`, drop invalid records (models/market_data.go:12-20,
    * ingestor.go:99-115).
    */
  val qIngestValidate = Q(
    "q_ingest_validate",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      Ingest.validate(ev, "event_type", "ts_ms")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
        .select("event_id", "user_id", "event_type", "ts_ms", "k")
        // map-only face ending in a total order: barrier the sort so
        // the range sampler reads shuffle files instead of re-running
        // the JSON-parse scan (Catalog.barrierSort rationale)
        .transform(Catalog.barrierSort(_, "event_id"))
    },
    Some("""SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE event_type <> '' AND event_type IS NOT NULL AND epoch_ms(ts) > 0
        AND json_extract_string(props, '$.k') IS NOT NULL
      ORDER BY event_id""")
  )

  /** A2 TTL retention — keep only events within 24h of the newest
    * event (Redis EX ttl, config/config.go:37).
    */
  val qTtlFilter = Q(
    "q_ttl_filter",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select("event_id", "user_id", "ts_ms")
      Latest.ttlFilter(ev, "ts_ms", 24L * 3600 * 1000)
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
      WHERE epoch_ms(ts) >= (SELECT max(epoch_ms(ts)) FROM events) - 86400000
      ORDER BY event_id""")
  )

  /** As-of join — for each purchase, the user's most recent click at
    * or before it (trade → prevailing-quote semantics). Right side
    * deduped per (user, ts) for determinism; oracle uses DuckDB's
    * native ASOF LEFT JOIN.
    */
  val qAsofJoin = Q(
    "q_asof_join",
    (spark, dir) => {
      import graft.ops.{AsOf, Latest}
      val ev = Tables.events(spark, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_ms", "value")
      val clicks0 = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ms"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      val clicks = Latest.keepLastPerKey(clicks0,
        Seq("user_id", "ts_ms"), Seq("click_id"))
      AsOf.asOfJoin(purchases, clicks,
          keyCols = Seq("user_id"), leftTimeCol = "ts_ms", rightTimeCol = "ts_ms",
          rightValueCols = Seq("click_id", "click_value"))
        .select("event_id", "user_id", "ts_ms", "value", "click_id", "click_value")
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
          FROM events WHERE event_type = 'purchase'),
        c0 AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
          FROM events WHERE event_type = 'click'),
        c AS (SELECT user_id, ts_ms, max_by(event_id, event_id) AS click_id,
            max_by(value, event_id) AS click_value
          FROM c0 GROUP BY user_id, ts_ms)
      SELECT p.event_id, p.user_id, p.ts_ms, p.value, c.click_id, c.click_value
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
      ORDER BY p.event_id""")
  )

  /** Interval join — purchases attributed to a signup by the same user
    * within the following 7 days, via the bucketized range join
    * (RangeJoin.bucketed); oracle is the plain inequality join.
    */
  val qRangeJoin = Q(
    "q_range_join",
    (spark, dir) => {
      import graft.ops.RangeJoin
      val ev = Tables.events(spark, dir)
      val weekMs = 7L * 24 * 3600 * 1000
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_ms").as("purchase_ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("ts_ms").as("start_ms"),
          (col("ts_ms") + weekMs).as("end_ms"))
      RangeJoin.bucketed(purchases, signups, "user_id",
          "purchase_ts", "start_ms", "end_ms", bucketWidth = weekMs)
        .select("user_id", "purchase_id", "signup_id", "purchase_ts", "start_ms")
        .orderBy("purchase_id", "signup_id")
    },
    Some("""SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id,
        epoch_ms(p.ts) AS purchase_ts, epoch_ms(s.ts) AS start_ms
      FROM events p JOIN events s
        ON p.user_id = s.user_id
       AND p.event_type = 'purchase' AND s.event_type = 'signup'
       AND epoch_ms(p.ts) >= epoch_ms(s.ts)
       AND epoch_ms(p.ts) < epoch_ms(s.ts) + 604800000
      ORDER BY purchase_id, signup_id""")
  )

  /** Forward as-of with a staleness bound: each purchase paired with
    * the user's NEXT click, but only within 2 s — farther matches
    * report null (the "quote too old to price the trade" rule, mirrored
    * forward). Same single-shuffle union+window plan as q_asof_join;
    * the tolerance rides on a carried right-time column, no extra join.
    * Oracle: min_by over the bounded inequality join (exact at oracle
    * scale; the engine-side plan is the one that survives 100 TB).
    */
  val qAsofTolerance = Q(
    "q_asof_tolerance",
    (spark, dir) => {
      import graft.ops.{AsOf, Latest}
      val ev = Tables.events(spark, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_ms", "value")
      val clicks0 = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ms"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      val clicks = Latest.keepLastPerKey(clicks0,
        Seq("user_id", "ts_ms"), Seq("click_id"))
      AsOf.asOfJoin(purchases, clicks,
          keyCols = Seq("user_id"), leftTimeCol = "ts_ms", rightTimeCol = "ts_ms",
          rightValueCols = Seq("click_id", "click_value"),
          direction = "forward", toleranceMs = Some(2000L))
        .select("event_id", "user_id", "ts_ms", "value", "click_id", "click_value")
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
          FROM events WHERE event_type = 'purchase'),
        c0 AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
          FROM events WHERE event_type = 'click'),
        c AS (SELECT user_id, ts_ms, max_by(event_id, event_id) AS click_id,
            max_by(value, event_id) AS click_value
          FROM c0 GROUP BY user_id, ts_ms),
        m AS (SELECT p.event_id,
            min_by(c.click_id, c.ts_ms) AS click_id,
            min_by(c.click_value, c.ts_ms) AS click_value
          FROM p JOIN c ON p.user_id = c.user_id
            AND c.ts_ms >= p.ts_ms AND c.ts_ms - p.ts_ms <= 2000
          GROUP BY p.event_id)
      SELECT p.event_id, p.user_id, p.ts_ms, p.value, m.click_id, m.click_value
      FROM p LEFT JOIN m USING (event_id)
      ORDER BY p.event_id""")
  )

  def all: Seq[Q] = Seq(qLatestPerKey, qEnrichDim, qIngestValidate, qTtlFilter,
    qAsofJoin, qAsofTolerance, qRangeJoin)
}
