package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Similarity

/** At-rest IVF layout — the missing half of
  * [[graft.ops.Similarity.knnIvf]]'s scale story. knnIvf's scaladoc
  * says "the corpus is partitioned by cluster id, so a query touches
  * nprobe partitions instead of the full corpus"; reading the corpus
  * from one flat table, that partitioning is a SHUFFLE paid per query
  * batch, and every file is still scanned. Writing the corpus
  * Hive-partitioned by cluster id ONCE turns the probe list into a
  * partition filter: a query batch reads only the probed clusters'
  * directories (`PartitionFilters` in the scan — LayoutSpec pins it),
  * which at a 100 TB embedding store is the IVF 1/(clusters/nprobe)
  * scan fraction realized in bytes actually read, not just rows
  * filtered.
  *
  * The layout is two artifacts, both written from the same corpus
  * pass:
  *  - `path/corpus`: the vectors, `cluster=<id>/` partitioned
  *    (small-files-guarded via [[Bucketing.writePartitioned]]);
  *  - `path/reps`: one representative (min-id member — the same
  *    engine-exact medoid stand-in knnIvf uses) vector per cluster —
  *    the coarse quantizer a reader probes WITHOUT touching the
  *    corpus. Kept beside the data exactly like a real IVF index's
  *    codebook.
  */
object AnnLayout {

  /** Write the IVF layout: partitioned corpus + representative table.
    * One corpus scan for the data (the partition write), one
    * aggregation for the reps.
    */
  def writeIvf(corpus: DataFrame, path: String,
      clusterCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    Bucketing.writePartitioned(corpus, s"$path/corpus",
      Seq(clusterCol), Seq(idCol), maxRecordsPerFile)
    repsOf(corpus, clusterCol, idCol, vecCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/reps")
  }

  /** `(cluster, rep_id, rep_vec)` — min-id member per cluster, the
    * engine-exact medoid stand-in knnIvf uses. rep_id is stored so
    * [[appendIvf]] can merge rep tables without re-reading the corpus.
    */
  private def repsOf(corpus: DataFrame, clusterCol: String,
      idCol: String, vecCol: String): DataFrame = {
    val minIds = corpus.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("rep_id"))
    corpus.select(col(idCol).as("rep_id"), col(vecCol).as("rep_vec"))
      .join(minIds, Seq("rep_id"))
      .select(col(clusterCol), col("rep_id"), col("rep_vec"))
  }

  /** Incremental index maintenance — the operation a 100 TB at-rest
    * index lives or dies by (a full rewrite per ingest batch would
    * cost the whole corpus): APPEND a new vector batch into the
    * existing layout. The batch's rows append into their
    * `cluster=<id>/` directories (only touched partitions gain
    * files — the same partitioned-write path as the initial layout,
    * small-files-guarded); the reps codebook is refreshed by merging
    * the OLD reps with the batch's per-cluster minima — min is
    * associative, so merge-of-minima == min-over-union, and no
    * corpus re-read ever happens. The merged reps table is
    * codebook-sized by definition, so materializing it driver-side
    * before overwriting its own input path is bounded (and the
    * overwrite-what-you-read hazard is the reason to materialize).
    * LayoutSpec pins: write(A) + append(B) answers queries
    * identically to write(A ∪ B) from scratch.
    *
    * Crash/reader safety: the merged reps are written to a staging
    * sibling (`reps.stage`) and RENAMED into place — a directory
    * rename on the same filesystem, so a failure between the corpus
    * append and the reps refresh leaves the OLD reps intact (stale
    * codebook: queries still probe correctly, merely without the new
    * clusters until a retried append completes the swap), never a
    * half-written one, and a concurrent reader sees old-or-new, not
    * a mid-overwrite mix. Single WRITER assumed (two concurrent
    * appends would race the swap) — the same contract every
    * no-table-format parquet maintenance path here carries.
    */
  def appendIvf(newVecs: DataFrame, path: String,
      clusterCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val spark = newVecs.sparkSession
    newVecs.repartition(col(clusterCol))
      .sortWithinPartitions(col(clusterCol), col(idCol))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(clusterCol)
      .parquet(s"$path/corpus")
    val old = spark.read.parquet(s"$path/reps")
    val merged = old
      .unionByName(repsOf(newVecs, clusterCol, idCol, vecCol))
      .groupBy(col(clusterCol))
      .agg(min_by(struct(col("rep_id"), col("rep_vec")), col("rep_id"))
        .as("_r"))
      .select(col(clusterCol), col("_r.rep_id").as("rep_id"),
        col("_r.rep_vec").as("rep_vec"))
      .collect() // codebook-sized; must leave the path before the swap
    spark.createDataFrame(
        spark.sparkContext.parallelize(merged.toIndexedSeq, 1), old.schema)
      .write.mode("overwrite").parquet(s"$path/reps.stage")
    swapDir(spark, s"$path/reps.stage", s"$path/reps")
  }

  /** Rename `stage` into `target` (backup-then-rename: target →
    * `<target>.old`, stage → target, delete backup). Both paths must
    * share a filesystem; callers are single-writer.
    *
    * Self-repairing: a crash between the two renames leaves the
    * target missing and the backup present — the next swap (the
    * single writer's retry) restores the backup FIRST, so the window
    * where a reader can observe a missing target is bounded by the
    * writer's absence, never permanent.
    */
  private[graft] def swapDir(spark: SparkSession, stage: String,
      target: String): Unit = {
    import org.apache.hadoop.fs.Path
    val t = new Path(target)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val s = new Path(stage)
    val bak = new Path(target + ".old")
    repairSwap(spark, target)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(t)) { if (!fs.rename(t, bak)) sys.error(s"rename $t -> $bak failed") }
    if (!fs.rename(s, t)) {
      // restore the backup so the layout never points at nothing
      if (fs.exists(bak)) fs.rename(bak, t)
      sys.error(s"rename $s -> $t failed")
    }
    fs.delete(bak, true)
    ()
  }

  /** Restore `target` from its `.old` backup if a previous swap was
    * interrupted between its two renames (target gone, backup
    * present). Writers call this before touching the directory —
    * [[swapDir]] does, and so does any compaction that READS the
    * target before staging its rewrite.
    */
  private[graft] def repairSwap(spark: SparkSession, target: String): Unit = {
    import org.apache.hadoop.fs.Path
    val t = new Path(target)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(target + ".old")
    if (!fs.exists(t) && fs.exists(bak)) {
      if (!fs.rename(bak, t)) sys.error(s"repair rename $bak -> $t failed")
    }
    ()
  }

  /** IVF top-k against a [[writeIvf]] layout — result-identical to
    * [[graft.ops.Similarity.knnIvf]] on the same corpus (same probe
    * ranking, same exact-cosine rerank, same tie-breaks; pinned in
    * LayoutSpec and oracle-checked by q_ann_ivf_layout), but the
    * corpus scan reads ONLY the probed clusters' partitions.
    *
    * The probed-cluster set crosses the driver as an `isin` partition
    * filter — a BOUNDED collect (≤ |queries|·nprobe ids, and the
    * query side of a top-k batch is broadcast-class by design), the
    * same driver-side-rate-table shape as Sample's mixing tables.
    * Everything heavy stays distributed: the rerank join carries only
    * probed-partition rows.
    *
    * Why not dynamic partition pruning instead of the collect?
    * Measured (Probe ann_dpp, byte-level — plan strings are
    * unreliable here: the executed plan can show an
    * `IN dynamicpruning#N` filter that never pruned): under DEFAULT
    * config a broadcast semi-join on the probe list reads the FULL
    * corpus — `reuseBroadcastOnly` can't prune through the
    * window-derived probe subplan — while the static `isin` reads
    * ~6% of it. Flipping
    * `spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly=false`
    * session-wide does make DPP prune to within ~20% of the isin
    * path, but a library operator mutating global optimizer conf is
    * worse than one bounded tiny job. Collect stays, deliberately.
    */
  def knnIvf(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      clusterCol: String = "label"): DataFrame = {
    val reps = spark.read.parquet(s"$path/reps")
      .select(col(clusterCol).as("cluster"),
        Similarity.asDouble(col("rep_vec")).as("rv"))
      .withColumn("rn", Similarity.norm2(col("rv")))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.norm2(col("qv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy((Similarity.dot(col("qv"), col("rv"))
        / sqrt(col("qn") * col("rn"))).desc, col("cluster"))
    val probed = q.crossJoin(broadcast(reps))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select("query_id", "qv", "qn", "cluster")
    val probedClusters = probed.select("cluster").distinct()
      .collect().map(_.get(0)).toIndexedSeq
    val members = spark.read.parquet(s"$path/corpus")
      .filter(col(clusterCol).isin(probedClusters: _*))
      .select(col(clusterCol).as("cluster"), col(idCol).as("neighbor_id"),
        Similarity.asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", Similarity.norm2(col("cv")))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probed.join(members, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.dot(col("qv"), col("cv"))
        / sqrt(col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Quantized IVF layout — [[writeIvf]] with the floats REPLACED by
    * int8 codes ([[graft.ops.Similarity.q8CodesScaled]], stored as
    * array<tinyint> PLUS the per-vector double scale): the index at
    * rest is ~4× smaller, so the probed partitions cost ~4× fewer
    * bytes to scan — compression and partition pruning multiply.
    * Storing the scale is what makes this TRUE scalar quantization:
    * a reader reconstructs `scale·code/127 ≈ component`, so
    * DEQUANTIZED dot scoring — measured recall@10 = 0.96 vs dot
    * truth, where RAW code dots measure 0.06 (PERF.md ann_recall: an
    * l∞-normalized near-duplicate key, not an ANN score) — is
    * computable straight from the layout. The reps codebook stores
    * (codes, scale) too; [[knnIvfQ8]] probes and reranks with the
    * dequantized score end-to-end. The float layout ([[writeIvf]])
    * remains the exact-rerank option.
    */
  def writeIvfQ8(corpus: DataFrame, path: String,
      clusterCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val codes = Similarity.q8CodesScaled(corpus, idCol, vecCol,
        idCol, "codes", "scale")
      .withColumn("codes", col("codes").cast("array<tinyint>"))
      .join(corpus.select(col(idCol), col(clusterCol)), Seq(idCol))
    Bucketing.writePartitioned(codes, s"$path/corpus",
      Seq(clusterCol), Seq(idCol), maxRecordsPerFile)
    val minIds = codes.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("rep_id"))
    codes.select(col(idCol).as("rep_id"), col("codes").as("rep_codes"),
        col("scale").as("rep_scale"))
      .join(minIds, Seq("rep_id"))
      .select(col(clusterCol), col("rep_id"), col("rep_codes"),
        col("rep_scale"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/reps")
  }

  /** IVF top-k against a [[writeIvfQ8]] layout, ANN-faithful: quantize
    * the query batch keeping its scales, rank clusters by the
    * DEQUANTIZED dot against the reps — `(sq·srep·codedot)/127²`, the
    * [[graft.ops.Similarity.knnQuantizedDot]] score (ties → lowest
    * cluster) — and rerank probed members the same way (ties → lowest
    * id). The integer code dot stays the kernel; the two stored
    * scales turn it into a true dot estimate instead of the
    * l∞-normalized near-dup key raw code dots are. Same
    * partition-filter scan discipline as [[knnIvf]]; oracle-checked
    * by q_ann_ivf_q8.
    */
  def knnIvfQ8(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      clusterCol: String = "label"): DataFrame = {
    val reps = spark.read.parquet(s"$path/reps")
      .select(col(clusterCol).as("cluster"), col("rep_codes"),
        col("rep_scale"))
    val q = Similarity.q8CodesScaled(queries, idCol, vecCol,
      "query_id", "qa", "sq")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy((col("sq") * col("rep_scale")
          * Similarity.intDot(col("qa"), col("rep_codes")).cast("double")
          / lit(16129.0)).desc,
        col("cluster"))
    val probed = q.crossJoin(broadcast(reps))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nprobe)
      .select("query_id", "qa", "sq", "cluster")
    val probedClusters = probed.select("cluster").distinct()
      .collect().map(_.get(0)).toIndexedSeq
    val members = spark.read.parquet(s"$path/corpus")
      .filter(col(clusterCol).isin(probedClusters: _*))
      .select(col(clusterCol).as("cluster"), col(idCol).as("neighbor_id"),
        col("codes"), col("scale"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    probed.join(members, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", col("sq") * col("scale")
        * Similarity.intDot(col("qa"), col("codes")).cast("double")
        / lit(16129.0))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** TRAINED-quantizer IVF — [[writeIvf]] with the coarse quantizer
    * LEARNED instead of inherited: run the shipped deterministic
    * Lloyd k-means ([[graft.ops.Similarity.kmeans]]: min-id seeds,
    * integer-quantized exact means, total-order argmax — same result
    * on any engine/partitioning), label the corpus with a final
    * [[graft.ops.Similarity.assignNearest]] pass, write it
    * Hive-partitioned by the learned label, and store the learned
    * CENTROIDS as the reps codebook (rep_id = the cluster id; no
    * member is "the" rep once the codebook is trained). [[knnIvf]]
    * then probes the trained codebook unchanged — same partition
    * filter, same rerank.
    *
    * Why train: with data-blind cluster labels the probe ranking is
    * uncorrelated with member geometry — measured recall@10 at
    * nprobe=8/256 was 0.018; k-means relabeling on the same corpus
    * recovered 1.0 at nprobe=4 (PERF.md ann_recall_trained). This is
    * the end-to-end wiring of that measurement.
    *
    * Cost: iters·(assign + means) shuffles over the corpus, then the
    * one partitioned write — a bounded index-build job, amortized
    * over every query against the layout, and incrementally
    * maintainable afterwards with [[appendTrained]] (NOT
    * [[appendIvf]], whose min-id reps merge is the UNtrained
    * codebook's maintenance rule and would overwrite learned
    * centroids). Returns the trained centroid table (cluster, cv).
    */
  def trainIvf(corpus: DataFrame, path: String, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      maxRecordsPerFile: Long = 5000000L): DataFrame = {
    val spark = corpus.sparkSession
    val base = corpus.drop(clusterCol) // learned labels replace any prior ones
    val cents = Similarity.kmeans(base, k, iters, idCol, vecCol)
    val labeled = base.join(
      Similarity.assignNearest(base, cents, idCol, vecCol)
        .select(col("vec_id").as(idCol), col("cluster").as(clusterCol)),
      Seq(idCol))
    Bucketing.writePartitioned(labeled, s"$path/corpus",
      Seq(clusterCol), Seq(idCol), maxRecordsPerFile)
    cents.select(col("cluster").as(clusterCol),
        col("cluster").as("rep_id"), col("cv").as("rep_vec"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/reps.stage")
    swapDir(spark, s"$path/reps.stage", s"$path/reps")
    cents
  }

  /** [[trainIvf]] composed with the scaled-int8 at-rest format of
    * [[writeIvfQ8]] — trained recall AND ~4× smaller probed bytes in
    * ONE artifact: the learned k-means codebook labels the corpus,
    * the corpus is stored as (codes: array<tinyint>, scale: double)
    * partitioned by the learned label, and the reps are the QUANTIZED
    * CENTROIDS (code + scale of each learned centroid).
    * [[knnIvfQ8]] runs unchanged against it — dequantized probe
    * ranking against quantized centroids, dequantized rerank over
    * pruned partitions. Maintenance: [[appendTrained]]'s
    * frozen-codebook rule applies (assign → quantize → append;
    * retraining is a new build); oracle-checked end to end by
    * q_ann_ivf_trained_q8. Returns the (float) centroid table.
    */
  def trainIvfQ8(corpus: DataFrame, path: String, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      maxRecordsPerFile: Long = 5000000L): DataFrame = {
    val spark = corpus.sparkSession
    val base = corpus.drop(clusterCol)
    val cents = Similarity.kmeans(base, k, iters, idCol, vecCol)
    val labels = Similarity.assignNearest(base, cents, idCol, vecCol)
      .select(col("vec_id").as(idCol), col("cluster").as(clusterCol))
    val codes = Similarity.q8CodesScaled(base, idCol, vecCol,
        idCol, "codes", "scale")
      .withColumn("codes", col("codes").cast("array<tinyint>"))
      .join(labels, Seq(idCol))
    Bucketing.writePartitioned(codes, s"$path/corpus",
      Seq(clusterCol), Seq(idCol), maxRecordsPerFile)
    Similarity.q8CodesScaled(cents, "cluster", "cv",
        "rep_id", "rep_codes", "rep_scale")
      .withColumn("rep_codes", col("rep_codes").cast("array<tinyint>"))
      .select(col("rep_id").as(clusterCol), col("rep_id"),
        col("rep_codes"), col("rep_scale"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/reps.stage")
    swapDir(spark, s"$path/reps.stage", s"$path/reps")
    cents
  }

  /** Incremental maintenance for a TRAINED layout ([[trainIvf]]):
    * assign the new batch to the FROZEN codebook (one
    * [[graft.ops.Similarity.assignNearest]] pass against `path/reps`
    * — broadcast-sized, no corpus read) and append its rows into
    * their learned-label partitions. The reps codebook is left
    * untouched — that is the point: the standard IVF practice is a
    * frozen coarse quantizer between retrains, and retraining is a
    * new [[trainIvf]] build by design. LayoutSpec pins reps
    * invariance, label agreement with assignNearest, and
    * query-identity against a hand-built reference on the unioned
    * corpus.
    */
  def appendTrained(newVecs: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val spark = newVecs.sparkSession
    val cents = spark.read.parquet(s"$path/reps")
      .select(col(clusterCol).as("cluster"), col("rep_vec").as("cv"))
    val base = newVecs.drop(clusterCol)
    val labeled = base.join(
      Similarity.assignNearest(base, cents, idCol, vecCol)
        .select(col("vec_id").as(idCol), col("cluster").as(clusterCol)),
      Seq(idCol))
    labeled.repartition(col(clusterCol))
      .sortWithinPartitions(col(clusterCol), col(idCol))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(clusterCol)
      .parquet(s"$path/corpus")
  }

  /** Incremental maintenance for a TRAINED Q8 layout
    * ([[trainIvfQ8]]): assign the new batch against the DEQUANTIZED
    * stored codebook (`code·scale/127` — the only codebook a
    * Q8-layout reader has, so append-time assignment is
    * self-consistent with probe-time ranking), quantize the batch,
    * and append into the learned-label partitions. The quantized
    * reps stay untouched — same frozen-codebook rule as
    * [[appendTrained]]. A borderline vector can land in a different
    * partition than the float-codebook assignment [[trainIvfQ8]]
    * used for the initial corpus; labels only gate which partitions
    * a probe reads, never the rerank score, so this shifts recall at
    * the margin, not correctness (LayoutSpec pins query-identity
    * against an unpruned reference over the unioned layout).
    */
  def appendTrainedQ8(newVecs: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val spark = newVecs.sparkSession
    val cents = spark.read.parquet(s"$path/reps")
      .select(col(clusterCol).as("cluster"),
        transform(col("rep_codes"),
          c => c.cast("double") * col("rep_scale") / lit(127.0)).as("cv"))
    val base = newVecs.drop(clusterCol)
    val labels = Similarity.assignNearest(base, cents, idCol, vecCol)
      .select(col("vec_id").as(idCol), col("cluster").as(clusterCol))
    val codes = Similarity.q8CodesScaled(base, idCol, vecCol,
        idCol, "codes", "scale")
      .withColumn("codes", col("codes").cast("array<tinyint>"))
      .join(labels, Seq(idCol))
    codes.repartition(col(clusterCol))
      .sortWithinPartitions(col(clusterCol), col(idCol))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(clusterCol)
      .parquet(s"$path/corpus")
  }

  /** The pruned corpus scan a probe list induces — exposed separately
    * so tests can assert on `inputFiles` (only probed `cluster=<id>/`
    * directories appear).
    */
  def prunedCorpusScan(spark: SparkSession, path: String,
      clusterCol: String, clusters: Seq[Any]): DataFrame =
    spark.read.parquet(s"$path/corpus")
      .filter(col(clusterCol).isin(clusters: _*))
}
