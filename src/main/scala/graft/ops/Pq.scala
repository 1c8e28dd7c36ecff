package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the vector-compression format the scalar
  * int8 path ([[Similarity.q8CodesScaled]]) cannot reach: SQ8 stores
  * one byte PER COMPONENT (4× smaller than float32); PQ stores one
  * SUB-SPACE CODE per m-dim block — m·⌈log₂k⌉ bits per vector, e.g.
  * 64 dims → 8 bytes at m=8/k=256 (32× smaller than float32) — by
  * learning a k-centroid codebook PER SUB-SPACE and replacing each
  * subvector with its nearest sub-centroid's index (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Why the DOT decomposition makes this exact-ish: dot(q, x) =
  * Σ_s dot(q_s, x_s) ≈ Σ_s dot(q_s, c_{s,code_s}) — the
  * approximation error per sub-space is dot(q_s, x_s − c_s), bounded
  * by the sub-space quantization error, which is what L2 sub-space
  * k-means minimizes. Hence the trainer is [[Similarity.kmeansL2]]
  * (cosine sub-assignment would ignore subvector magnitude and
  * mis-assign); determinism is inherited from it wholesale, so the
  * ENTIRE train→encode pipeline unrolls into a DuckDB oracle
  * (q_ann_pq), the trained-IVF treatment applied to PQ.
  *
  * Scoring strategy — DECODE, not lookup tables: the classic ADC
  * lookup table is per-QUERY state; in a column engine the same sum
  * is computed by decoding each stored code array back to its
  * centroid concatenation (m O(1) array-literal index operations per
  * row — the codebook travels as a plan literal, k·dims doubles) and
  * scoring with the existing dot machinery. Decode cost is per
  * corpus row per scan, independent of query count, and the decoded
  * column composes with every existing kNN/IVF operator instead of
  * needing a parallel scoring path.
  */
object Pq {

  /** A trained PQ model: m sub-spaces × k centroids × (dims/m)
    * components. Driver-sized BY DESIGN (it IS the index artifact —
    * k·dims doubles, the BPE-merge-list shape); [[encodeExpr]] /
    * [[decodeExpr]] compile it into plan literals.
    */
  final case class PqModel(m: Int, k: Int, sub: Int,
      codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(codebooks.length == m &&
      codebooks.forall(cb => cb.length == k && cb.forall(_.length == sub)))
  }

  /** Train the m sub-space codebooks: slice the corpus into m
    * contiguous (dims/m)-wide blocks and run the deterministic L2
    * Lloyd trainer on each. Codes are POSITIONS in the
    * sorted-by-seed-label centroid order — a total order, so code
    * assignment is engine-portable. The m kmeans runs are INDEPENDENT
    * deterministic pipelines over disjoint slices, so their driver
    * job chains run CONCURRENTLY (optimization guide §2.6 — each
    * run's tail back-fills the others' idle executors; results are
    * identical to the sequential order because each trainer is exact
    * and self-contained). m is small by construction; each run is
    * iters·2 bounded shuffles.
    */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    val dims = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    val codebooks = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      // pool bounded by the host's core count: m is small by
      // construction, but an oversized m must degrade to queued
      // trainers, not m driver threads and m concurrent job chains
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(m, Runtime.getRuntime.availableProcessors)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try Await.result(Future.sequence((0 until m).map { s =>
        Future {
          Similarity.kmeansL2(
              corpus.select(col(idCol),
                slice(col(vecCol), s * sub + 1, sub).as(vecCol)),
              k, iters, idCol, vecCol)
            .orderBy("cluster").collect()
            .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
        }
      }), Duration.Inf)
      finally pool.shutdown()
    }
    PqModel(m, k, sub, codebooks.toIndexedSeq)
  }

  private def cbLit(model: PqModel, s: Int): Column =
    typedLit(model.codebooks(s).map(_.toSeq).toSeq)

  /** Sequential Σ c(i)² replicating the native dot kernel's fold
    * order exactly (ascending index, one accumulator), so a
    * driver-computed centroid norm is BIT-IDENTICAL to the engine's
    * norm2 of the same literal — PqSpec's encode == assignNearestL2
    * pin and the hash oracle both verify the claim.
    */
  private def normDriver(c: IndexedSeq[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i < c.length) { a += c(i) * c(i); i += 1 }
    a
  }

  /** Argmin-L2 code for one PREBOUND subvector column: the same
    * (vn − 2·dot) + cn arithmetic as [[Similarity.assignNearestL2]],
    * ties to the LOWEST code (strict `<` over ascending j ==
    * min_by's (dist², cluster) order). The subvector and its norm
    * arrive as bound columns (evaluated once per row, not once per
    * candidate) and the k candidate norms as driver-computed
    * literals — the restructure that took encode from 1.3 ms/row to
    * interpreter-bounded O(k·sub) real work (the first cut
    * re-evaluated slice + norm2 inside the fold: 256× redundant
    * traversals per sub-space per row).
    */
  private def subCodeExpr(xs: Column, vn: Column, model: PqModel,
      s: Int): Column = {
    val cb = cbLit(model, s)
    val cn = typedLit(model.codebooks(s).map(normDriver).toSeq)
    aggregate(
      sequence(lit(0), lit(model.k - 1)),
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("j")),
      (best, j) => {
        val d = vn - lit(2.0) * Similarity.dot(xs, element_at(cb, j + 1)) +
          element_at(cn, j + 1)
        when(d < best.getField("d"),
          struct(d.as("d"), j.as("j"))).otherwise(best)
      },
      best => best.getField("j"))
  }

  /** Reconstruction of a code array: the concatenation of its m
    * sub-centroids — m O(1) literal-array index operations, yielding
    * the array<double> every existing kNN operator scores directly.
    */
  def decodeExpr(codes: Column, model: PqModel): Column =
    flatten(array((0 until model.m).map { s =>
      element_at(cbLit(model, s), element_at(codes, s + 1) + 1)
    }: _*))

  /** The at-rest table: `(idCol, codes array<int>)` — per sub-space,
    * slice and norm bound once per row, then the argmin fold.
    */
  def encode(corpus: DataFrame, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var df = corpus.select(col(idCol),
      Similarity.asDouble(col(vecCol)).as("_pq_v"))
    val codeCols = (0 until model.m).map { s =>
      df = df
        .withColumn(s"_pq_xs$s",
          slice(col("_pq_v"), s * model.sub + 1, model.sub))
        .withColumn(s"_pq_vn$s", Similarity.norm2(col(s"_pq_xs$s")))
      subCodeExpr(col(s"_pq_xs$s"), col(s"_pq_vn$s"), model, s)
    }
    df.select(col(idCol), array(codeCols: _*).as("codes"))
  }

  /** Asymmetric top-k over a PQ-coded corpus: FLOAT queries scored
    * against DECODED corpus rows by dot — the ADC sum realized
    * through decode + the shared dot kernel. Returns
    * (query_id, rank, neighbor_id, adot); ties → lowest neighbor id.
    */
  def knnDecoded(queries: DataFrame, codes: DataFrame, model: PqModel,
      k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = codes.select(col(idCol).as("neighbor_id"),
      decodeExpr(col("codes"), model).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("neighbor_id"))
    corpus.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adot", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adot"))
  }

  /** Shortlist-then-rerank — how PQ is actually DEPLOYED: the coded
    * corpus produces a `shortlist`-deep candidate set per query
    * (cheap: the 20×-compressed table is the only full scan), then
    * ONLY the shortlisted rows' float vectors are fetched (an
    * id-equality join against the float table — |queries|·shortlist
    * rows, never the corpus) and reranked by exact dot. Why this
    * stage is not optional at tight k: quantization error collapses
    * WITHIN-NEIGHBORHOOD distinctions (measured: recall@10 direct =
    * 0.15 on clustered data — the near-ties PQ cannot order — vs
    * 0.76 with a 100-deep shortlist + exact rerank; 0.25 → 0.66 on
    * adversarial uniform data; deeper shortlists buy more — PERF.md
    * round-11 pq). Returns (query_id, rank, neighbor_id, dot).
    */
  def knnRerank(queries: DataFrame, codes: DataFrame, model: PqModel,
      corpus: DataFrame, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= k)
    val short = knnDecoded(queries, codes, model, shortlist, idCol, vecCol)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    short.join(cv, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dot", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** [[knnRerank]] with the float fetch hitting an AT-REST corpus —
    * the deployment shape the in-memory variant's id-equality join
    * cannot deliver at 100 TB: `short.join(corpus)` makes the
    * shortlist ids JOIN KEYS, so the float table is scanned in full
    * to fetch |queries|·shortlist rows. Here the shortlist pairs are
    * collected (bounded by construction — the same driver-side
    * contract as [[graft.io.AnnLayout.knnIvf]]'s probed-cluster
    * list) and the ids go back down as pushed per-value equality
    * predicates ([[graft.io.AnnLayout.fetchByIds]]); on an id-sorted
    * layout the scan then touches ~one row group per shortlisted id
    * instead of the corpus (byte ratio measured in Probe id_fetch).
    * Result-identical to [[knnRerank]] on the same corpus —
    * PqSpec pins it, and q_ann_pq_rerank_rest shares
    * q_ann_pq_rerank's oracle. `corpusPath` must hold (idCol LONG,
    * vecCol) parquet, ideally sorted by idCol within files.
    */
  def knnRerankAtRest(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, codes: DataFrame, model: PqModel,
      corpusPath: String, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= k)
    // |queries|·shortlist pairs — the bounded shortlist IS the point
    // of the rerank stage, so collecting it is model-sized by design
    val pairs = knnDecoded(queries, codes, model, shortlist, idCol, vecCol)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
    import spark.implicits._
    val short = pairs.toDF("query_id", "neighbor_id")
    val cv = graft.io.AnnLayout.fetchByIds(spark, corpusPath,
        pairs.map(_._2).distinct, idCol)
      .select(col(idCol).as("neighbor_id"),
        Similarity.asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(short).join(cv, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dot", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }
}
