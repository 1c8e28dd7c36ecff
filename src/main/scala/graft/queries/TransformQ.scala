package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.model.{SymbolConfig, ValueRule}
import graft.ops.{Auth, Config, Ingest, Latest, Transform}

/** Queries exercising the transform engine (§2.4 P1-P5), the auth plane
  * (P8/S5/F4), and the serving-plane snapshot query (§3.3), each with a
  * DuckDB oracle. The events table plays the tick stream; payload maps
  * are built from `props` plus synthesized fields so every edge
  * semantic (div-0, unknown op, non-numeric, shadowing, passthrough)
  * is visible to the oracle.
  */
object TransformQ {

  /** P2 arithmetic matrix: one field per op, plus divide-by-zero,
    * unknown-op, and non-numeric passthrough (server.go:224-238).
    */
  val qValueRules = Q(
    "q_value_rules",
    (spark, dir) => {
      val vs = col("value").cast("string")
      val payload = map(
        lit("a"), vs, lit("s"), vs, lit("m"), vs, lit("d"), vs,
        lit("z"), vs, lit("u"), vs, lit("et"), col("event_type"))
      val cfg = SymbolConfig(valueRules = Map(
        "a" -> ValueRule("add", 5), "s" -> ValueRule("subtract", 5),
        "m" -> ValueRule("multiply", 2), "d" -> ValueRule("divide", 2),
        "z" -> ValueRule("divide", 0), "u" -> ValueRule("noop", 9),
        "et" -> ValueRule("multiply", 3)))
      Tables.events(spark, dir)
        .withColumn("p", Transform.applySymbolConfig(payload, cfg))
        .select(
          col("event_id"),
          element_at(col("p"), "a").cast("double").as("v_add"),
          element_at(col("p"), "s").cast("double").as("v_sub"),
          element_at(col("p"), "m").cast("double").as("v_mul"),
          element_at(col("p"), "d").cast("double").as("v_div"),
          element_at(col("p"), "z").cast("double").as("v_div0"),
          element_at(col("p"), "u").cast("double").as("v_unknown_op"),
          element_at(col("p"), "et").as("et"))
        // map-only face: barrier the sort (see Catalog.barrierSort)
        .transform(Catalog.barrierSort(_, "event_id"))
    },
    Some("""SELECT event_id,
        value + 5 AS v_add, value - 5 AS v_sub,
        value * 2 AS v_mul, value / 2 AS v_div,
        value AS v_div0, value AS v_unknown_op,
        event_type AS et
      FROM events ORDER BY event_id""")
  )

  /** The full §2.4 pipeline in reference order (normalize → rules →
    * rename → remove → override) with meta-shadow pinning: the payload
    * carries a `symbol` field that flatten must overwrite.
    */
  val qTransformPipeline = Q(
    "q_transform_pipeline",
    (spark, dir) => {
      val ev = Ingest.enrichDim(
        Tables.events(spark, dir), Tables.customer(spark, dir),
        "user_id", "c_custkey", "c_mktsegment", "exchange")
      val payload = map_concat(
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")),
        map(lit("v"), col("value").cast("string"),
          lit("tag"), lit("x"),
          lit("et"), col("event_type"),
          lit("symbol"), lit("SHADOW")))
      val cfg = SymbolConfig(
        valueRules = Map(
          "v" -> ValueRule("multiply", 1.07),
          "k" -> ValueRule("divide", 0),
          "et" -> ValueRule("add", 5)),
        renameFields = Map("k" -> "k_id"),
        removeFields = Seq("tag"),
        overrideFields = Map("src" -> "graft"))
      ev.withColumn("name", concat(lit("sym"), col("user_id")))
        .withColumn("payload", payload)
        .transform(df => Transform.normalize(df, "name", "ts_ms", "exchange"))
        .withColumn("flat", Transform.applySymbolConfig(col("flat"), cfg))
        .select(
          col("event_id"),
          element_at(col("flat"), "symbol").as("symbol"),
          element_at(col("flat"), "timestamp").cast("long").as("ts_ms"),
          element_at(col("flat"), "exchange").as("exchange"),
          element_at(col("flat"), "k_id").cast("double").as("k_id"),
          element_at(col("flat"), "v").cast("double").as("v"),
          element_at(col("flat"), "et").as("et"),
          element_at(col("flat"), "src").as("src"),
          map_contains_key(col("flat"), "tag").as("tag_present"),
          map_contains_key(col("flat"), "k").as("k_present"))
        // map-only face: barrier the sort (see Catalog.barrierSort)
        .transform(Catalog.barrierSort(_, "event_id"))
    },
    Some("""SELECT e.event_id,
        'sym' || e.user_id AS symbol,
        epoch_ms(e.ts) AS ts_ms,
        coalesce(c.c_mktsegment, 'unknown') AS exchange,
        CAST(json_extract_string(e.props, '$.k') AS DOUBLE) AS k_id,
        e.value * 1.07 AS v,
        e.event_type AS et,
        'graft' AS src,
        false AS tag_present,
        false AS k_present
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id""")
  )

  /** §3.3 serving-plane query: latest snapshot × clients with
    * per-(client,symbol) config gate (F3) — the data-driven interpreter
    * under a broadcast config join, one plan for any client count.
    */
  val qServeSnapshot = Q(
    "q_serve_snapshot",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          col("value"), col("event_type"))
      val latest = Latest.keepLastPerKey(ev, Seq("user_id"), Seq("ts_ms", "event_id"))
        .withColumn("name", concat(lit("sym"), col("user_id")))
        .withColumn("exchange", lit("unknown"))
        .withColumn("payload", map(
          lit("v"), col("value").cast("string"),
          lit("et"), col("event_type")))
      val snapshot = Transform.normalize(latest, "name", "ts_ms", "exchange")
        .select("name", "flat")
        .withColumnRenamed("name", "symbol")
      // config rows come from clients_configs-shaped DATA — id + JSONB
      // text (postgres.go:165-185) — through the engine-side parser,
      // not hand-written typed literals
      val sym = """{"value_rules":{"v":{"op":"multiply","value":2.0}},"override_fields":{"src":"alpha"}}"""
      val rawConfigs = spark.sql(
        s"""SELECT * FROM VALUES
            ('alpha', '{"symbols":{"sym1":$sym,"sym2":$sym,"sym3":$sym}}'),
            ('beta', '{"symbols":{"sym1":{"rename_fields":{"v":"v_beta"}}}}')
          AS t(id, config)""")
      val configs = Config.parse(rawConfigs)
      Transform.serveSnapshot(snapshot, configs)
        .select(
          col("client_id"), col("symbol"),
          element_at(col("flat"), "timestamp").cast("long").as("ts_ms"),
          element_at(col("flat"), "v").cast("double").as("v"),
          element_at(col("flat"), "v_beta").cast("double").as("v_beta"),
          element_at(col("flat"), "src").as("src"))
        .orderBy("client_id", "symbol")
    },
    Some("""WITH latest AS (
        SELECT user_id, ts_ms, value, event_type FROM (
          SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
          FROM events) t WHERE rn = 1),
      clients(client_id) AS (VALUES ('alpha'), ('beta'))
      SELECT c.client_id, 'sym' || l.user_id AS symbol, l.ts_ms,
        CASE WHEN c.client_id = 'alpha' AND l.user_id IN (1, 2, 3)
             THEN l.value * 2
             WHEN c.client_id = 'beta' AND l.user_id = 1
             THEN NULL ELSE l.value END AS v,
        CASE WHEN c.client_id = 'beta' AND l.user_id = 1
             THEN l.value END AS v_beta,
        CASE WHEN c.client_id = 'alpha' AND l.user_id IN (1, 2, 3)
             THEN 'alpha' END AS src
      FROM latest l CROSS JOIN clients c
      ORDER BY c.client_id, 'sym' || l.user_id""")
  )

  /** S6 loader — clients_configs JSONB → per-(client, symbol) config
    * rows (postgres.go:165-185, dto/client.go:3-18), including the
    * defaults: NULL / unparseable config yields no rows (identity
    * transform downstream), use_current_ts folds into the magic
    * timestamp="current" override. Oracle re-parses the same JSON with
    * DuckDB's JSON functions.
    */
  val qConfigParse = Q(
    "q_config_parse",
    (spark, dir) => {
      val raw = spark.sql(
        """SELECT * FROM VALUES
            ('alpha', '{"symbols":{"s1":{"value_rules":{"v":{"op":"multiply","value":2.5},"w":{"op":"add","value":1.0}},"rename_fields":{"a":"b"},"remove_fields":["x","y"],"override_fields":{"src":"cfg"}},"s2":{"use_current_ts":true,"override_fields":{"timestamp":"1234","note":"n"}}}}'),
            ('beta', '{"symbols":{"s1":{}}}'),
            ('gamma', CAST(NULL AS STRING)),
            ('delta', '{not json')
          AS t(id, config)""")
      Config.parse(raw)
        .select(col("client_id"), col("symbol"),
          size(col("rules")).cast("long").as("n_rules"),
          element_at(col("rules"), "v").getField("op").as("v_op"),
          element_at(col("rules"), "v").getField("value").as("v_val"),
          element_at(col("renames"), "a").as("a_renamed"),
          size(col("removes")).cast("long").as("n_removes"),
          element_at(col("overrides"), "src").as("o_src"),
          element_at(col("overrides"), "timestamp").as("o_ts"),
          size(col("overrides")).cast("long").as("n_overrides"))
        .orderBy("client_id", "symbol")
    },
    Some("""WITH raw(id, config) AS (VALUES
        ('alpha', '{"symbols":{"s1":{"value_rules":{"v":{"op":"multiply","value":2.5},"w":{"op":"add","value":1.0}},"rename_fields":{"a":"b"},"remove_fields":["x","y"],"override_fields":{"src":"cfg"}},"s2":{"use_current_ts":true,"override_fields":{"timestamp":"1234","note":"n"}}}}'),
        ('beta', '{"symbols":{"s1":{}}}'),
        ('gamma', NULL),
        ('delta', '{not json')),
      parsed AS (SELECT id AS client_id,
          unnest(json_keys(config, '$.symbols')) AS symbol, config
        FROM raw WHERE json_valid(config)),
      b AS (SELECT client_id, symbol, config,
          '$.symbols.' || symbol AS base FROM parsed)
      SELECT client_id, symbol,
        CAST(len(json_keys(config, base || '.value_rules')) AS BIGINT) AS n_rules,
        json_extract_string(config, base || '.value_rules.v.op') AS v_op,
        CAST(json_extract(config, base || '.value_rules.v.value') AS DOUBLE) AS v_val,
        json_extract_string(config, base || '.rename_fields.a') AS a_renamed,
        CAST(json_array_length(config, base || '.remove_fields') AS BIGINT) AS n_removes,
        json_extract_string(config, base || '.override_fields.src') AS o_src,
        CASE WHEN CAST(json_extract(config, base || '.use_current_ts') AS BOOLEAN)
             THEN 'current'
             ELSE json_extract_string(config, base || '.override_fields.timestamp') END AS o_ts,
        CASE WHEN CAST(json_extract(config, base || '.use_current_ts') AS BOOLEAN)
             THEN CAST(len(list_distinct(list_append(coalesce(json_keys(config, base || '.override_fields'), []), 'timestamp'))) AS BIGINT)
             ELSE CAST(len(json_keys(config, base || '.override_fields')) AS BIGINT) END AS n_overrides
      FROM b ORDER BY client_id, symbol""")
  )

  /** C2 side-effect — last_used_at bookkeeping as a keyed max
    * aggregate (postgres.go:157-160's async UPDATE, made idempotent
    * and mergeable). customer stands in for api_keys; events are the
    * authenticated requests.
    */
  val qLastUsed = Q(
    "q_last_used",
    (spark, dir) => {
      val facts = Tables.events(spark, dir)
        .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_name")),
          col("user_id") === col("c_custkey"))
      Auth.lastUsed(facts, "c_name", "ts_ms").orderBy("key_hash")
    },
    Some("""SELECT sha256(c.c_name) AS key_hash,
        max(epoch_ms(e.ts)) AS last_used_at
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY sha256(c.c_name) ORDER BY key_hash""")
  )

  /** P8/S5/F4 — sha256 auth as a broadcast left-semi join against
    * active keys (customer stands in for the api_keys table).
    */
  val qAuthSemijoin = Q(
    "q_auth_semijoin",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
      val keys = cust.select(
        Auth.hashKey(col("c_name")).as("key_hash"),
        (col("c_acctbal") > 0).as("is_active"))
      val facts = Tables.events(spark, dir)
        .join(broadcast(cust.select("c_custkey", "c_name")),
          col("user_id") === col("c_custkey"))
      Auth.activeKeySemiJoin(facts, keys, "c_name")
        .select("event_id", "user_id")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE sha256(c.c_name) IN
        (SELECT sha256(c_name) FROM customer WHERE c_acctbal > 0)
      ORDER BY e.event_id""")
  )

  def all: Seq[Q] = Seq(qValueRules, qTransformPipeline, qServeSnapshot,
    qConfigParse, qLastUsed, qAuthSemijoin)
}
