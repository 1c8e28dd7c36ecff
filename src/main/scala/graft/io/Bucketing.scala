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
}
