package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keep-last-per-key state (SURVEY.md §2.5 A1/A2) — the Redis
  * keyed-upsert semantics (`SET key=<name>` last-write-wins,
  * cache_service.go:37-61) tightened to a deterministic argmax:
  * max by (ordering cols), ties broken by the full ordering tuple.
  *
  * Scale note: implemented as `max_by(struct(*), struct(ord))`, a hash
  * aggregate with map-side partial aggregation — one shuffle of one
  * row per (partition × key), not a window sort over the full fact
  * table. At 100 TB with k distinct keys the exchanged data is
  * O(partitions × k), independent of row count; a
  * `row_number().over(Window)` formulation would instead sort the
  * entire table. The window form is kept in the DuckDB oracle only.
  */
object Latest {

  /** A1 — newest record per key. `orderCols` must be a deterministic
    * total order within each key (e.g. ts_ms, then a unique id).
    */
  def keepLastPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payloadCols = df.columns.toSeq.filterNot(keyCols.contains)
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), ord).as("_latest"))
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** A2 — TTL retention (Redis `EX ttl`, default 24h,
    * config/config.go:37): batch oracle form — keep rows within `ttlMs`
    * of the dataset's max timestamp. The max is computed as a scalar
    * subquery-style broadcast (single-row cross join), not a collect.
    */
  def ttlFilter(df: DataFrame, tsMsCol: String, ttlMs: Long): DataFrame = {
    val maxTs = df.agg(max(col(tsMsCol)).as("_max_ts"))
    df.crossJoin(broadcast(maxTs))
      .filter(col(tsMsCol) >= col("_max_ts") - lit(ttlMs))
      .drop("_max_ts")
  }
}
