package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Data Selection via Importance Resampling (DSIR; Xie et al.,
  * NeurIPS'23) — the pretraining-data selection method that ranks raw
  * documents by how much their hashed n-gram feature distribution
  * looks like a TARGET distribution (wiki/books-quality text), then
  * keeps the top of the ranking. The production shape: one pass
  * derives a B-row weight table (the model artifact), one pass scores
  * the corpus with it, and the selection threshold comes from the
  * bottom-k rank sketch — no global sort anywhere.
  *
  * Determinism recipe (everything replays in the DuckDB oracle):
  *  - features: unigrams + space-joined bigrams, hashed by the
  *    engine-portable md5-prefix integer ([[Classify.bucketOf]],
  *    seed "d") into B buckets;
  *  - the per-bucket importance weight is the QUANTIZED
  *    log-likelihood ratio: w[b] = qlog2(nt[b]+1) − qlog2(nr[b]+1)
  *    + qlog2(Nr+B) − qlog2(Nt+B), with qlog2(x) = floor(log2 x)
  *    computed exactly as length(bin(x))−1 — the [[TextOps.lmScore]]
  *    integer-log recipe applied to the likelihood ratio (true float
  *    logs round differently across engines). Laplace +1 keeps zero
  *    counts finite; the Nr/Nt shift makes w the honest quantized
  *    ratio of smoothed probabilities, not just a count ratio;
  *  - a doc's importance z = Σ_features c·w[bucket] — an exact long
  *    dot product, associative, partition-order-invariant;
  *  - selection keeps z STRICTLY above a frozen cut derived from the
  *    deterministic bottom-k sample ([[Curriculum.sketchTerciles]]'s
  *    primitive at an arbitrary rank) — membership is exactly
  *    determined by the frozen cut, so the kept set is reproducible
  *    and oracle-replayable; the kept FRACTION carries the sample's
  *    O(n/√k) rank error, exactly the curriculum trade.
  *
  * Scale shape: features are map-side explode + one keyed agg; the
  * weight table is B rows (broadcast class); scoring is one broadcast
  * join + keyed agg per corpus pass — [[Classify.scoreHashedLogistic]]
  * plumbing with likelihood-ratio weights instead of trained ones.
  * The cut is one bounded aggregation. For STREAMING serving the
  * frozen weights travel as a B-element ARRAY literal indexed by
  * bucket — element_at on an array literal is O(1) positional access
  * (unlike a map literal's linear scan, the measured 10× Unigram
  * lesson), so the map-side margin expression stays cheap at
  * realistic B.
  */
object Dsir {

  /** floor(log2 x) for x ≥ 1, as exact integer ops. */
  private def qlog2(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** Driver-side twin for the two global totals. */
  private def qlog2l(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Unigram + bigram feature array of a text column. */
  def featureArr(text: Column): Column = {
    val ts = TextOps.tokens(text)
    concat(ts, TextOps.shingles(ts, 2))
  }

  /** Sparse hashed design matrix (_d_id, b, c): one row per
    * (doc, touched bucket) with the exact feature count. Fused
    * kernel since round 14 (see
    * [[org.apache.spark.sql.graftbridge.HashedBucketCounts]]): the
    * per-doc bucket counting happens map-side inside one expression —
    * no per-feature row explosion, NO featurization shuffle (the
    * composed explode + groupBy(doc, b) shuffled one row per feature
    * occurrence). Identical (b, c) multiset, pinned in ExtensionsSpec.
    */
  def hashedNgramFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, HashedBucketCounts}
    docs.select(col(idCol).as("_d_id"),
        explode(ColumnBridge.column(HashedBucketCounts(
          ColumnBridge.expression(TextOps.tokens(col(textCol))),
          buckets, seed = "d", bigrams = true))).as("_bc"))
      .select(col("_d_id"), col("_bc.b").as("b"), col("_bc.c").as("c"))
  }

  /** The composed explode + groupBy formulation [[hashedNgramFeatures]]
    * replaced — kept as the readable reference implementation;
    * ExtensionsSpec pins multiset equality.
    */
  private[graft] def hashedNgramFeaturesComposed(docs: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("_d_id"),
        explode(featureArr(col(textCol))).as("_f"))
      .select(col("_d_id"),
        Classify.bucketOf(col("_f"), buckets, seed = "d").as("b"))
      .groupBy("_d_id", "b").agg(count(lit(1)).as("c"))

  /** The DSIR model artifact: B rows (b, nt, nr, w). `targetLabel` is
    * any boolean Column over `docs`' columns marking the target
    * subset (target ⊆ raw — the standard DSIR setup where the raw
    * corpus contains some in-domain text). Buckets no feature ever
    * touches get nt = nr = 0 ⇒ w = the global shift (the smoothed
    * ratio of nothing to nothing).
    */
  def bucketWeights(docs: DataFrame, idCol: String, textCol: String,
      targetLabel: Column, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = hashedNgramFeatures(docs, idCol, textCol, buckets)
    val lab = docs.select(col(idCol).as("_d_id"),
      targetLabel.cast("boolean").as("_t"))
    // localCheckpoint: B-row (model-sized) result materialized once,
    // shared by the totals collect and the weight projection; lineage
    // cut, blocks freed by the ContextCleaner (the repo convention —
    // an un-unpersisted persist() would pin the cache forever).
    val ag = feats.join(lab, Seq("_d_id"))
      .groupBy("b").agg(
        sum(when(col("_t"), col("c")).otherwise(lit(0L))).as("nt"),
        sum(col("c")).as("nr"))
      .localCheckpoint()
    // two global totals: one bounded scalar collect (model-sized)
    val tot = ag.agg(coalesce(sum("nt"), lit(0L)),
      coalesce(sum("nr"), lit(0L))).head()
    val shift = qlog2l(tot.getLong(1) + buckets) -
      qlog2l(tot.getLong(0) + buckets)
    val full = (0 until buckets).map(_.toLong).toDF("b")
    val out = full.join(ag, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("nr"), lit(0L)).as("nr"),
        (qlog2(coalesce(col("nt"), lit(0L)) + 1)
          - qlog2(coalesce(col("nr"), lit(0L)) + 1) + lit(shift)).as("w"))
    out
  }

  /** Importance margin per doc: z = Σ c·w — one broadcast join + one
    * keyed agg; feature-less docs score z = 0 (present in the output,
    * the [[Classify.scoreHashedLogistic]] convention).
    */
  def importance(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame = {
    val feats = hashedNgramFeatures(docs, idCol, textCol, buckets)
    val z = feats.join(broadcast(weights.select("b", "w")), Seq("b"))
      .groupBy("_d_id").agg(sum(col("c") * col("w")).as("z"))
    docs.select(col(idCol)).join(z.withColumnRenamed("_d_id", idCol),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("z"), lit(0L)).as("z"))
  }

  /** Map-side importance margin from a FROZEN weight array — the
    * streaming/serving face. `wArr(b)` = weight of bucket b (all B
    * present). element_at on the ARRAY literal is O(1) positional
    * access, so this stays cheap at realistic B — unlike a map
    * literal, whose per-lookup linear scan makes
    * [[Classify.hashedLogisticMargin]] small-B-only.
    */
  def importanceMargin(text: Column, wArr: Array[Long], buckets: Int): Column = {
    require(wArr.length == buckets, "weight array must cover every bucket")
    val w = typedLit(wArr.toIndexedSeq)
    aggregate(
      transform(featureArr(text),
        f => element_at(w,
          (Classify.bucketOf(f, buckets, seed = "d") + 1).cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }

  /** The frozen selection cut: the ascending nearest-rank element at
    * ceil(n·num/den) of the deterministic bottom-k value sample of
    * `zCol` (rank-defined cuts are the sample's documented contract).
    * Keep rows with z STRICTLY above it ⇒ approximately the top
    * (1 − num/den) fraction, membership exact under the frozen cut.
    */
  def sketchCut(scored: DataFrame, idCol: String, zCol: String,
      num: Int, den: Int, k: Int = 256, saltPrefix: String = "ds|"): Double = {
    require(num > 0 && num < den, "cut rank num/den must be in (0,1)")
    require(k >= den, "sample must be at least den values for a stable cut")
    val row = scored
      .select(Sketches.md5Hash60(saltPrefix, col(idCol).cast("string")).as("h"),
        col(zCol).cast("double").as("v"))
      .agg(Sketches.bottomKSample(col("h"), col("v"), k).as("kept"))
      .select(Sketches.sampleValues(col("kept")).as("vs"))
      // int cast truncates the exact double quotient — same exactness
      // argument as Curriculum.sketchTerciles
      .select(element_at(col("vs"),
        ((size(col("vs")) * num + (den - 1)) / den).cast("int")).as("cut"))
      .head()
    require(!row.isNullAt(0), "sketchCut needs a non-empty scored corpus")
    row.getDouble(0)
  }
}
