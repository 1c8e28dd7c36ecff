package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling for training-data pipelines: keep a row
  * iff the md5 of (seed|key) starts below a threshold — exact,
  * replayable (same seed ⇒ same sample, across runs AND engines,
  * unlike `DataFrame.sample`'s RNG), and stratifiable (per-stratum
  * rates, e.g. downsample the dominant language while keeping rare
  * ones whole — the standard rebalancing tool for corpus mixes).
  *
  * Scale: a pure map-side filter on a hash prefix — no shuffle, no
  * state, pushes the kept fraction all the way into the first stage.
  */
object Sample {

  /** Rate ∈ [0,1] as an 8-hex-digit md5-prefix threshold: a uniform
    * 32-bit prefix is below rate·2³² with probability `rate`. Rates
    * ≥ 1 map to "g", which every hex string sorts below.
    */
  def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, (rate * 4294967296L).toLong)}%08x"

  /** Keep rows where md5(seed|key) prefix < stratum threshold. */
  def stratifiedHash(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      seed: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (s, r)) => when(strataCol === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")),
        1, 8) < thr)
  }
}
