package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Client-config loader (S6): parse `clients_configs` rows — id +
  * config JSONB (postgres.go:165-185, dto/client.go:3-18) — into the
  * per-(client, symbol) config rows [[Transform.serveSnapshot]]
  * consumes (client_id, symbol, rules, renames, removes, overrides).
  *
  * Parsing happens engine-side with `from_json` against
  * [[Schemas.clientConfigSchema]], so configs are data, not code:
  * a config change is a table update, no redeploy. Rows whose config
  * is NULL or unparseable JSON yield no config rows — downstream the
  * left-outer config join then applies the identity transform, the
  * reference's missing-config default (postgres.go:173-174).
  *
  * `use_current_ts` folds into the interpreter's magic
  * timestamp="current" override (server.go:213-219), so the whole
  * dto surface lands in the existing four interpreter columns.
  * Note: the reference defines `UseCurrentTS` (dto/client.go:16) but
  * never reads it — its ts="current" magic fires only from
  * OverrideFields itself. Honoring the flag here, with flag-wins
  * precedence over an explicit timestamp override, is this engine's
  * design choice (making the dead dto field mean what its name says),
  * not observed reference behavior.
  */
object Config {

  def parse(configs: DataFrame, idCol: String = "id",
      configCol: String = "config"): DataFrame = {
    val parsed = configs.select(
      col(idCol).as("client_id"),
      from_json(col(configCol), Schemas.clientConfigSchema).as("c"))
    parsed
      .select(col("client_id"), explode(col("c.symbols")).as(Seq("symbol", "sc")))
      .select(
        col("client_id"),
        col("symbol"),
        col("sc.value_rules").as("rules"),
        col("sc.rename_fields").as("renames"),
        col("sc.remove_fields").as("removes"),
        when(col("sc.use_current_ts"),
          map_concat(
            // dedup-protect: an explicit timestamp override loses to the
            // flag (map_concat throws on duplicate keys under ANSI)
            map_filter(
              coalesce(col("sc.override_fields"), map().cast("map<string,string>")),
              (k, _) => k =!= "timestamp"),
            map(lit("timestamp"), lit("current"))))
          .otherwise(col("sc.override_fields")).as("overrides"))
  }
}
