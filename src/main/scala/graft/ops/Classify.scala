package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training for the model-based quality gate — the step
  * [[TextOps.hashedLinearScore]] deliberately left out. That scorer is
  * the fastText-shaped hashing-trick linear classifier (FineWeb-Edu's
  * filter stage) with deterministic STAND-IN weights; a real curation
  * pipeline TRAINS the weights on labeled documents and then scores
  * 100 TB with the frozen model. This object closes the loop: a
  * distributed logistic-regression trainer over the same hashed
  * feature space whose every arithmetic step is EXACT INTEGER, so the
  * whole iterated training run — not just one round — is
  * deterministic on any engine and any partitioning, and its DuckDB
  * oracle replays it unrolled (q_quality_train), the
  * [[Similarity.kmeans]] integer-quantization recipe applied to
  * gradient descent.
  *
  * The determinism recipe (why each choice):
  *  - weights are FIXED-POINT longs `w` (real weight = w / S,
  *    S = 2^scaleBits), so the per-document margin
  *    z = Σ_b count_b · w_b is one exact integer dot product;
  *  - the link is the HARD sigmoid p = clamp(1/2 + m/8, 0, 1) over
  *    margin m = z/S — as one integer numerator
  *    p_num = clamp(4S + z, 0, 8S) over denominator 8S. Piecewise
  *    LINEAR, so no transcendental exp whose last-ulp differences
  *    across libm implementations would break cross-engine replay
  *    (hard-sigmoid logistic units are standard quantized-ML
  *    practice, not a correctness compromise);
  *  - the residual numerator r = p_num − 8S·y and the gradient
  *    numerator G_b = Σ_docs r · count_b are sums of LONGS — exact,
  *    associative, commutative, hence partition-order-invariant:
  *    the same reason kmeans quantizes component sums;
  *  - the update w_b ← w_b − floorDiv(G_b, 8N) (N = |docs|) is exact
  *    integer floor division; the 8N denominator makes the effective
  *    step the MEAN residual-weighted count in w-units (unit learning
  *    rate in real space), independent of corpus size.
  *
  * Scale shape: features are built ONCE (map-side explode + one keyed
  * agg) and persisted; each iteration is two bounded shuffles — a
  * broadcast join with the B-row weight table then a per-doc sum, and
  * a per-bucket sum whose output is B rows. The only driver traffic
  * is the B-row gradient per iteration (B = the hashing-trick bucket
  * count, a model hyperparameter — codebook-sized by definition, the
  * same bounded-collect class as the BPE argmax row). The trained
  * weights then flow into [[scoreHashedLogistic]]: one broadcast
  * join + keyed agg, the scoring gate a 1000-executor cluster runs
  * over the full corpus.
  *
  * Reference lineage: the reference gates and rewrites records with
  * static per-client rules (internal/app/services/websocket/
  * server.go:190 transformFlat, dto/client.go:20 ValueTransform);
  * this is the learned-filter generalization a training-data
  * pipeline needs, with the same apply-a-frozen-artifact serving
  * shape.
  */
object Classify {

  /** Hash bucket of one token — the SAME md5-prefix integer
    * [[TextOps.hashedLinearScore]] derives its stand-in weights from
    * (seed "w"), reduced mod `buckets`. Sharing the hash keeps the
    * trained model drop-in for the scorer's plumbing; 64-vs-2001
    * moduli are coprime, so the stand-in labels are NOT a trivial
    * function of the bucket and the trainer has something real to
    * learn.
    */
  def bucketOf(tok: Column, buckets: Int, seed: String = "w"): Column =
    conv(substring(md5(concat(lit(s"$seed|"), tok).cast("binary")), 1, 8),
      16, 10).cast("long") % buckets

  /** The hashed bag-of-words design matrix, sparse:
    * `(_c_id, b, c)` — one row per (document, touched bucket) with
    * the exact token count; built once per training run and reused by
    * every iteration and by scoring. Fused kernel since round 14
    * (see [[org.apache.spark.sql.graftbridge.HashedBucketCounts]]):
    * per-doc bucket counting is one map-side expression — no
    * per-token row explosion, no featurization shuffle. Identical
    * (b, c) multiset (ExtensionsSpec), so trained weights, scores,
    * and every oracle are unchanged.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, HashedBucketCounts}
    docs.select(col(idCol).as("_c_id"),
        explode(ColumnBridge.column(HashedBucketCounts(
          ColumnBridge.expression(TextOps.tokens(col(textCol))),
          buckets, seed = "w", bigrams = false))).as("_bc"))
      .select(col("_c_id"), col("_bc.b").as("b"), col("_bc.c").as("c"))
  }

  /** The composed explode + groupBy formulation [[hashedFeatures]]
    * replaced — kept as the readable reference implementation;
    * ExtensionsSpec pins multiset equality.
    */
  private[graft] def hashedFeaturesComposed(docs: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("_c_id"),
        explode(TextOps.tokens(col(textCol))).as("_c_t"))
      .select(col("_c_id"), bucketOf(col("_c_t"), buckets).as("b"))
      .groupBy("_c_id", "b").agg(count(lit(1)).as("c"))

  /** Train the hashed linear classifier: `iters` rounds of full-batch
    * gradient descent under the exact-integer recipe above. `label`
    * is any boolean Column over `docs`' columns (the heuristic gate
    * providing supervision — distillation of a cheap rule into the
    * hashed model, the standard bootstrap when no human labels
    * exist). Returns the fixed-point weights, index = bucket.
    *
    * Docs with no tokens contribute no feature rows (their margin is
    * 0, their gradient contribution is empty) but DO count in N —
    * both sides of the oracle agree on that convention.
    */
  def trainHashedLogistic(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int = 64, iters: Int = 3,
      scaleBits: Int = 16): Array[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val s4 = 4L << scaleBits
    val s8 = 8L << scaleBits
    val feats = hashedFeatures(docs, idCol, textCol, buckets).persist()
    val labels = docs
      .select(col(idCol).as("_c_id"), label.cast("long").as("_c_y"))
      .persist()
    val n = labels.count()
    require(n > 0, "trainHashedLogistic needs a non-empty corpus " +
      "(n = 0 would divide the gradient by zero)")
    val k = 8L * n
    var w = Array.fill(buckets)(0L)
    for (_ <- 1 to iters) {
      val wDf = w.toIndexedSeq.zipWithIndex
        .map { case (wv, b) => (b.toLong, wv) }.toDF("b", "w")
      val z = feats.join(broadcast(wDf), Seq("b"))
        .groupBy("_c_id").agg(sum(col("c") * col("w")).as("z"))
      val r = labels.join(z, Seq("_c_id"), "left")
        .select(col("_c_id"),
          (greatest(lit(0L), least(lit(s8), lit(s4) + coalesce(col("z"), lit(0L))))
            - lit(s8) * col("_c_y")).as("rn"))
      val grad = feats.join(r, Seq("_c_id"))
        .groupBy("b").agg(sum(col("rn") * col("c")).as("g"))
        .collect() // B rows — the model itself, bounded by design
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wv, b) =>
        wv - Math.floorDiv(grad.getOrElse(b.toLong, 0L), k)
      }
    }
    feats.unpersist()
    labels.unpersist()
    w
  }

  /** Score a token array with a trained weight vector as ONE
    * map-side column expression — no shuffle, no aggregation state:
    * the exact integer margin z = Σ_tokens w[bucket(token)], same
    * arithmetic as [[scoreHashedLogistic]] (OpsSpec-pinned equal).
    * The weights travel as a B-entry map literal, so this is the
    * SMALL-B face (map-literal lookups scan linearly — fine at the
    * hashing-trick B here; measured 6.8× blowup by B=4096 in Probe
    * margin_lookup. A wide-B margin EXPRESSION should index a
    * B-element array literal instead — O(1) positional element_at,
    * flat in B, the [[Dsir.importanceMargin]] pattern — and the
    * batch-side wide face is the broadcast-join scorer below).
    * Being stateless, it runs UNCHANGED as a
    * streaming projection — q_stream_quality scores a live document
    * stream with it against the frozen trained model.
    */
  def hashedLogisticMargin(toks: Column, weights: Array[Long],
      buckets: Int): Column = {
    val wmap = typedLit(weights.toIndexedSeq.zipWithIndex
      .map { case (wv, b) => b.toLong -> wv }.toMap)
    aggregate(
      transform(toks, t => element_at(wmap, bucketOf(t, buckets))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Score documents with a trained weight vector — the serving face:
    * features (map-side), one broadcast join with the B-row weight
    * table, one keyed agg. Returns (idCol, z, keep) with the exact
    * integer margin z (real margin = z / 2^scaleBits) and the
    * decision at the 0 threshold; token-less docs score z = 0.
    */
  def scoreHashedLogistic(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = weights.toIndexedSeq.zipWithIndex
      .map { case (wv, b) => (b.toLong, wv) }.toDF("b", "w")
    val z = hashedFeatures(docs, idCol, textCol, buckets)
      .join(broadcast(wDf), Seq("b"))
      .groupBy(col("_c_id").as(idCol)).agg(sum(col("c") * col("w")).as("z"))
    docs.select(col(idCol))
      .join(z, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("z"), lit(0L)).as("z"),
        (coalesce(col("z"), lit(0L)) > 0).as("keep"))
  }
}
