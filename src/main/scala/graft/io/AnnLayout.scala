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
    val minIds = corpus.groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("_rid"))
    corpus.select(col(idCol).as("_rid"), col(vecCol).as("rep_vec"))
      .join(minIds, Seq("_rid"))
      .select(col(clusterCol), col("rep_vec"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/reps")
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

  /** The pruned corpus scan a probe list induces — exposed separately
    * so tests can assert on `inputFiles` (only probed `cluster=<id>/`
    * directories appear).
    */
  def prunedCorpusScan(spark: SparkSession, path: String,
      clusterCol: String, clusters: Seq[Any]): DataFrame =
    spark.read.parquet(s"$path/corpus")
      .filter(col(clusterCol).isin(clusters: _*))
}
