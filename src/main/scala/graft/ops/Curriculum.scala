package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Quality-curriculum banding at corpus scale.
  *
  * The exact formulation (q_quality_curriculum) ranks every scored
  * document with `ntile(3)` over a global `(z DESC, doc_id)` window —
  * correct, but a window with no partitionBy moves the ENTIRE corpus
  * into one partition (Spark warns "serious performance degradation"),
  * a single-task sort at 100 TB. The scale path here replaces the
  * global rank with two FROZEN cut values derived from the
  * deterministic bottom-k rank sketch (q_quantile_sample's primitive —
  * rank-defined cuts are its documented contract): one bounded
  * aggregation computes the thresholds, and banding becomes a
  * stateless map-side comparison that runs identically over a batch
  * table or a document stream. Rank error of the cuts is the sample
  * bound O(n/√k) — band POPULATIONS are approximate terciles; band
  * MEMBERSHIP is exactly determined by the frozen thresholds, which is
  * what makes the selection reproducible and oracle-replayable.
  */
object Curriculum {

  /** Tercile cut values `(tLo, tHi)` of `zCol` over the scored corpus,
    * from the bottom-k uniform value sample (k lexicographically
    * smallest (md5-hash-of-id, value) pairs — both engines derive the
    * identical set). Cuts are the ascending sample's nearest-rank
    * elements at ceil(n/3) and ceil(2n/3), computed in INTEGER
    * arithmetic ((n+2) div 3 — no float rank, no engine-rounding
    * risk). The driver-side result is two doubles — model-sized, the
    * same bounded-collect class as trained weights; everything heavy
    * (the sample) is one partial-aggregated pass.
    *
    * `zCol` is cast to double for the sample: integer margins are
    * exact in a double up to 2⁵³, far above any hard-sigmoid
    * fixed-point margin (|z| ≤ tokens·8·2^scaleBits ≈ 2³⁰ at defaults).
    *
    * DuckDB twin of the whole derivation (h is [[Sketches.md5Hash60]]
    * with the same salt):
    * {{{
    * rr  AS (SELECT h, v, row_number() OVER (ORDER BY h, v) AS rn ...),
    * vsx AS (SELECT list_sort(list(v)) AS vs FROM rr WHERE rn <= k),
    * thr AS (SELECT vs[(len(vs) + 2) // 3]     AS t_lo,
    *                vs[(len(vs) * 2 + 2) // 3] AS t_hi FROM vsx)
    * }}}
    */
  def sketchTerciles(scored: DataFrame, idCol: String, zCol: String,
      k: Int = 256, saltPrefix: String = "cb|"): (Double, Double) = {
    require(k >= 3, "need at least 3 sampled values for tercile cuts")
    val row = scored
      .select(Sketches.md5Hash60(saltPrefix, col(idCol).cast("string")).as("h"),
        col(zCol).cast("double").as("v"))
      .agg(Sketches.bottomKSample(col("h"), col("v"), k).as("kept"))
      .select(Sketches.sampleValues(col("kept")).as("vs"))
      .select(
        // Spark's `/` on ints is DOUBLE division; the int cast
        // truncates back to the integer quotient — exact for n ≤ k
        // (the quotient of small ints in a double never rounds up
        // across an integer boundary).
        element_at(col("vs"),
          ((size(col("vs")) + 2) / 3).cast("int")).as("t_lo"),
        element_at(col("vs"),
          ((size(col("vs")) * 2 + 2) / 3).cast("int")).as("t_hi"))
      .head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      "sketchTerciles needs a non-empty scored corpus")
    (row.getDouble(0), row.getDouble(1))
  }

  /** Quality band from frozen thresholds: 1 strictly above `tHi`,
    * 2 strictly above `tLo`, else 3 (highest margin = band 1, matching
    * the ntile face's DESC order). Ties AT a cut fall to the lower
    * band — deterministic by construction, no id tiebreak needed
    * because the rule depends on z alone. Pure column expression:
    * the same gate serves the batch table and the document stream.
    */
  def bandByThresholds(z: Column, tLo: Double, tHi: Double): Column = {
    val zd = z.cast("double")
    when(zd > tHi, lit(1L)).when(zd > tLo, lit(2L)).otherwise(lit(3L))
  }
}
