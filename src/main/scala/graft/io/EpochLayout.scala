package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Epoch-directory publication for paired at-rest artifacts — the
  * single-pointer design [[AnnLayout.maintainTrained]]'s docstring
  * names as the way to close its last reader window.
  *
  * The flat layout publishes a retrain with TWO directory swaps
  * (`corpus`, then `reps`); [[AnnLayout.repairTrainedSwap]] makes
  * crashes safe, but a CONCURRENT reader inside the two renames can
  * still observe the new corpus against the old reps (recall loss,
  * never wrong rows). Here a version of the whole pair lives under
  * one epoch directory:
  *
  * {{{
  * root/epochs/e3/corpus/...    root/epochs/e3/reps/...
  * root/epochs/e3/_EPOCH_COMPLETE
  * root/epochs/e4/...           (being built — no marker yet)
  * }}}
  *
  * and "the current version" is resolved as the HIGHEST-numbered
  * epoch whose `_EPOCH_COMPLETE` marker exists. There is no pointer
  * file and therefore no pointer swap: publishing is one atomic
  * file CREATE (the marker), which a reader either sees or doesn't.
  * Every resolution is a consistent pair by construction — the
  * marker is written only after both artifacts are fully on disk —
  * so the flat layout's cross-artifact window does not exist at all,
  * and no repair logic is needed for readers (an unmarked epoch is
  * simply invisible; the writer deletes it on its next entry).
  *
  * Cost accounting (why this is cost-NEUTRAL versus the flat
  * layout, not the naive "doubles the footprint"): a retrain already
  * writes a complete second copy (`corpus.stage` + `reps.stage`)
  * before swapping, so peak at-rest bytes during maintenance are
  * identical; the epoch store additionally RETAINS `retain`
  * previous epochs after publish (default 1) for in-flight readers —
  * that retention is the one real cost over the flat layout, and it
  * is the same snapshot-retention contract every table format
  * (Iceberg/Delta snapshot expiry) charges for the same guarantee.
  *
  * Contracts carried over unchanged from [[AnnLayout]]: single
  * writer; a reader's query lifetime must be shorter than `retain`
  * publish intervals (else GC can delete the epoch under it — the
  * standard snapshot-expiry contract); APPENDS mutate the current
  * epoch in place (they never touch `reps`, so there is no pair to
  * keep consistent — readers see old-or-new rows of one consistent
  * codebook, exactly as [[AnnLayout.appendTrained]] documents).
  * Retrains — the only operation that changes the pair — publish a
  * NEW epoch.
  *
  * Reference scope note: the reference engine
  * (market-data-ingestor-go) has no at-rest index at all; this is
  * part of the north-star extension surface (SURVEY §2.7), the
  * 100 TB maintenance story for the trained ANN layouts.
  */
object EpochLayout {

  private val EpochRe = "e([0-9]+)".r
  private[graft] val Marker = "_EPOCH_COMPLETE"

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (epoch number, path) for every `e<N>` child of `root/epochs`,
    * complete or not; empty when the store has never been written.
    */
  private[graft] def epochs(spark: SparkSession,
      root: String): Seq[(Long, Path)] = {
    val dir = new Path(s"$root/epochs")
    val fs = fsOf(spark, root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochRe(n) => Some((n.toLong, st.getPath))
          case _ => None
        }
      case _ => None
    }.flatten.sortBy(_._1)
  }

  private def isComplete(spark: SparkSession, p: Path): Boolean =
    fsOf(spark, p.toString).exists(new Path(p, Marker))

  /** The current epoch's directory — highest-numbered COMPLETE
    * epoch — or None before the first publish. Mutation-free: safe
    * under a concurrent writer (the analogue of
    * [[AnnLayout.readSwapped]], except nothing can ever need
    * falling back from).
    */
  def current(spark: SparkSession, root: String): Option[String] =
    epochs(spark, root).filter(e => isComplete(spark, e._2))
      .lastOption.map(_._2.toString)

  /** [[current]] that throws with a clear message when the store is
    * empty — the read-path entry point.
    */
  def currentOrFail(spark: SparkSession, root: String): String =
    current(spark, root).getOrElse(
      sys.error(s"no complete epoch under $root/epochs — " +
        "publish one first (trainIvf/publish)"))

  /** Build-and-publish one epoch: `build` populates a fresh
    * `root/epochs/e<N+1>` (invisible to readers — no marker), then
    * the marker file is created (the atomic publish), then complete
    * epochs older than the newest `retain + 1` are deleted. Returns
    * the published directory.
    *
    * Writer-entry repair: any UNMARKED epoch directory is a crashed
    * previous build and is deleted first — readers never saw it, so
    * this is pure garbage collection, with no roll-forward/roll-back
    * case analysis to get right (contrast
    * [[AnnLayout.repairTrainedSwap]]'s three-state repair; the
    * marker-only protocol has one state: complete or garbage).
    */
  def publish(spark: SparkSession, root: String, retain: Int = 1)
      (build: String => Unit): String = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val fs = fsOf(spark, root)
    val all = epochs(spark, root)
    all.filterNot(e => isComplete(spark, e._2))
      .foreach(e => fs.delete(e._2, true))
    val next = all.lastOption.map(_._1 + 1).getOrElse(1L)
    val dir = s"$root/epochs/e$next"
    build(dir)
    require(fs.exists(new Path(dir)),
      s"publish build wrote nothing at $dir")
    fs.create(new Path(dir, Marker)).close() // THE publish: one atomic create
    val complete = epochs(spark, root)
      .filter(e => isComplete(spark, e._2))
    complete.dropRight(retain + 1).foreach(e => fs.delete(e._2, true))
    dir
  }

  /** Initial trained-IVF build as epoch 1 (or a full manual rebuild
    * as a new epoch). Thin wrapper: [[AnnLayout.trainIvf]] writes
    * the pair into the invisible epoch dir; the marker publishes it.
    */
  def trainIvf(corpus: DataFrame, root: String, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      maxRecordsPerFile: Long = 5000000L,
      seeds: DataFrame = null, retain: Int = 1): String =
    publish(corpus.sparkSession, root, retain) { dir =>
      AnnLayout.trainIvf(corpus, dir, k, iters, idCol, vecCol,
        clusterCol, maxRecordsPerFile, seeds)
      ()
    }

  /** Probe the current epoch — [[AnnLayout.knnIvf]] against the
    * resolved pair. Identical results to the flat layout's probe on
    * the same data (EpochSpec pins it); the only difference is that
    * the resolution step can never observe a mid-swap state.
    */
  def knnIvf(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    AnnLayout.knnIvf(spark, currentOrFail(spark, root), queries, k,
      nprobe)

  /** The intake loop against the epoch store —
    * [[AnnLayout.maintainTrained]]'s policy (same gates, same
    * measured thresholds) with the retrain re-targeted at a new
    * epoch:
    *  - the batch APPENDS into the CURRENT epoch in place (via
    *    [[AnnLayout.appendTrainedWithStats]] — reps untouched, so no
    *    pair consistency is at stake);
    *  - when the crowding gate fires, the rebuilt corpus+reps are
    *    written into the next epoch directory and published with the
    *    marker create. No staging siblings, no paired swap, no
    *    repair cases: the build target is invisible until complete.
    */
  def maintainTrained(newVecs: DataFrame, root: String, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      clusterCol: String = "label",
      warnCosP50: Double = 0.7, retrainShareFactor: Double = 3.0,
      maxRecordsPerFile: Long = 5000000L,
      compactWhenFilesOver: Int = 0, compactFiles: Int = 1,
      kppSeeds: Boolean = false, retain: Int = 1)
      : AnnLayout.MaintainResult = {
    val spark = newVecs.sparkSession
    val cur = currentOrFail(spark, root)
    val stats = AnnLayout.appendTrainedWithStats(newVecs, cur, idCol,
      vecCol, clusterCol, maxRecordsPerFile, compactWhenFilesOver,
      compactFiles)
    val k = spark.read.parquet(s"$cur/reps").count()
    require(k > 0, s"empty reps table at $cur")
    val warned = stats.assignCosP50 < warnCosP50
    val retrain = stats.topCellShare > retrainShareFactor / k.toDouble
    if (retrain) {
      val base = spark.read.parquet(s"$cur/corpus")
        .drop(clusterCol)
        .select(col(idCol), col(vecCol))
      val seeds = if (kppSeeds)
        Similarity.kmeansParInit(base, k.toInt, idCol = idCol,
          vecCol = vecCol).select(col("cluster"), col("cv"))
      else null
      publish(spark, root, retain) { dir =>
        AnnLayout.trainIvf(base, dir, k.toInt, iters, idCol, vecCol,
          clusterCol, maxRecordsPerFile, seeds)
        ()
      }
    }
    AnnLayout.MaintainResult(stats, warned, retrained = retrain)
  }
}
