package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level source-overlap matrices — "which crawl sources
  * duplicate each other", the diagnostic that decides dedup order and
  * mixing weights before any doc-level pass. Two faces over the same
  * semantics (both oracle-checked: q_source_overlap /
  * q_source_overlap_kmv; relative accuracy pinned in SketchSpec):
  *
  *  - [[exact]]: pairwise Jaccard via a shingle-keyed equality
  *    self-join. Per-key work is bounded by #sources² (df per shingle
  *    ≤ S, a small constant — no skewed-df blowup), so total cost is
  *    O(shingles·S²), linear in corpus size but a WIDE shuffle of
  *    every distinct (source, shingle).
  *  - [[kmvSketch]]: each source reduced to a k-min-values sketch of
  *    its shingle-hash set in ONE partial-aggregated pass (≤ k longs
  *    per (partition, source) cross the exchange); every pairwise
  *    Jaccard is then estimated from the S-row sketch table alone —
  *    the k-min union sketch of (A, B) is computable from the two
  *    sketches, and the fraction of its members present in BOTH is an
  *    unbiased Jaccard estimator (stderr ≈ 1/√k). This is the 100 TB
  *    path: corpus cost is one scan + a fixed-size exchange.
  */
object Overlap {

  /** Exact pairwise-Jaccard matrix (sa, sb, c, jaccard), sa < sb. */
  def exact(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    // measured note: a collect_set + HOF pair-expansion formulation
    // (one fewer wide shuffle on paper) benched 2.5 s vs this 2.2 s —
    // the nested-lambda expansion is CodegenFallback per shingle row
    // and costs more than the codegen'd hash self-join it replaces
    val srcSh = docs
      .select(col(sourceCol).as("source"),
        explode(TextOps.shingleSet(col(textCol))).as("s"))
      .distinct()
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n"))
    val a = srcSh.select(col("source").as("sa"), col("s"))
    val b = srcSh.select(col("source").as("sb"), col("s"))
    a.join(b, Seq("s")).filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), Seq("sa"))
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), Seq("sb"))
      .select(col("sa"), col("sb"), col("c"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
  }

  /** KMV-sketch matrix (sa, sb, n_both, n_union_kept, j_est), every
    * pair sa < sb (including zero-overlap ones). Deterministic
    * md5-derived hashing, so other engines reproduce it bit-for-bit.
    */
  def kmvSketch(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int): DataFrame = {
    val h = graft.functions.Sketches.md5Hash60("sh|", col("s"))
    val sk0 = docs
      .select(col(sourceCol).as("source"),
        explode(TextOps.shingleSet(col(textCol))).as("s"))
      .select(col("source"), h.as("h"))
      .groupBy("source")
      .agg(graft.functions.Sketches.kmvMins(col("h"), k).as("kept"))
    // explode drops sources whose docs ALL have < 3 tokens — left-join
    // the source universe back (a source-column-pruned second scan,
    // tiny next to the full-text pass) so every pair appears, with
    // empty sketches estimating j = 0 rather than vanishing.
    // localCheckpoint the S-row result so the self-join reads the
    // corpus ONCE (ReuseExchange does not fire across the broadcast
    // side; without the cut the plan scans the corpus per side)
    val sk = docs.select(col(sourceCol).as("source")).distinct()
      .join(sk0, Seq("source"), "left")
      .withColumn("kept", coalesce(col("kept"), array().cast("array<bigint>")))
      .localCheckpoint()
    val a = sk.select(col("source").as("sa"), col("kept").as("ka"))
    val b = sk.select(col("source").as("sb"), col("kept").as("kb"))
    // S-row sketch table × itself: the nested-loop cross is intended
    // and stays tiny no matter the corpus size (S = #sources)
    a.join(b, col("sa") < col("sb"))
      .withColumn("un", graft.functions.Sketches.kmvMerge(col("ka"), col("kb"), k))
      .select(col("sa"), col("sb"),
        size(array_intersect(array_intersect(col("un"), col("ka")), col("kb")))
          .cast("long").as("n_both"),
        size(col("un")).cast("long").as("n_union_kept"))
      .withColumn("j_est",
        when(col("n_union_kept") === 0, lit(0.0))
          .otherwise(col("n_both").cast("double") /
            col("n_union_kept").cast("double")))
  }
}
