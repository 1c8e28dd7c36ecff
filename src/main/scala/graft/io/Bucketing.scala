package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the at-rest half of the shuffle story: a
  * table written bucketed+sorted by its join/aggregation key is
  * already hash-partitioned on disk, so every subsequent join or
  * aggregation on that key runs WITHOUT an exchange (and, with sorted
  * buckets, without a sort). At 100 TB this converts the recurring
  * fact⋈fact shuffle — the single most expensive operation in the
  * pipeline — into a one-time cost paid at write.
  *
  * Spark-native bucketing (no Hive needed): bucket count must match
  * across co-located tables; readers get `SortMergeJoin` over two
  * bucketed scans with no Exchange (asserted in SkewCcSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Hive-style partitioned layout — the at-rest half of PREDICATE
    * pruning (as [[writeBucketed]] is of the shuffle): a tick history
    * laid out `partition_col=value/` lets any reader with an equality
    * or range predicate on the partition column skip whole directories
    * before a single byte is read (`PartitionFilters` in the scan
    * node), which at a 100 TB history is the difference between
    * scanning a day and scanning a decade.
    *
    * The `repartition(partitionCols)` before the write is the
    * small-files guard: without it every input partition writes one
    * file per partition value it touches (tasks × values files of a
    * few KB each — the classic metadata killer); with it each value's
    * rows coalesce into one task, and `maxRecordsPerFile` re-splits
    * oversized values into bounded files. `sortCols` orders rows
    * WITHIN each file so parquet row-group min/max stats become tight
    * non-overlapping ranges — a range predicate on the sort key then
    * skips row groups inside the surviving directories too.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
