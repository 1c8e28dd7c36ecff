package graft

import org.apache.spark.sql.SparkSession

/** One-call session setup for library users: a SparkSession builder
  * pre-configured the way every graft operator expects —
  *
  *  - `GraftExtensions` registered (native `graft_dot` SQL function +
  *    the HOF→native dot-product rewrite rule);
  *  - AQE on (runtime coalescing + skew-join split — the default skew
  *    answer, see Skew.saltedJoin for the explicit fallback);
  *  - runtime bloom-filter injection pinned on (Catalyst's automatic
  *    half of the Bloom story: a selective filter on one shuffle-join
  *    side gets a sketch prefilter injected on the other;
  *    [[graft.ops.Bloom]] is the explicit half, for SEMANTIC
  *    exclusion sets the optimizer cannot discover);
  *  - `spark.sql.shuffle.partitions` sized to the given parallelism
  *    instead of the 200 default (at cluster scale, set it to a small
  *    multiple of total executor cores, or let AQE coalesce);
  *  - parquet TIMESTAMP(NANOS) readable (SPARK-40819 legacy flag);
  *  - UTC session timezone (all engine/oracle time arithmetic is
  *    epoch-millis).
  *
  * Callers chain further config before `getOrCreate()`:
  * {{{
  *   val spark = GraftSession.builder(parallelism = 32)
  *     .master("local[32]").getOrCreate()
  * }}}
  */
object GraftSession {

  def builder(parallelism: Int): SparkSession.Builder =
    SparkSession.builder()
      // withExtensions (not the spark.sql.extensions static conf):
      // applies even when a SparkContext already exists in the JVM
      .withExtensions(new org.apache.spark.sql.graftbridge.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** The default HDFSBackedStateStore keeps every streaming key's state
    * in executor HEAP — fine for bench-scale keyed state, an OOM at
    * 100 TB key cardinality (keep-last over hundreds of millions of
    * symbols·users, watermark dedup state, windowed bars). This conf
    * swaps in the RocksDB provider (built into Spark since 3.2): state
    * lives off-heap/on-disk with incremental checkpointing, bounding
    * executor memory by the RocksDB cache, not by key count.
    * Per-SESSION conf, read at query start — set it on the builder (or
    * `spark.conf.set` before `.start()`); StreamingSpec proves the
    * stateful keep-last path end-to-end on RocksDB in-container.
    */
  val RocksDbStateStore: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** [[builder]] with RocksDB streaming state — the cluster-scale
    * default for long-running stateful pipelines.
    */
  def streamingBuilder(parallelism: Int): SparkSession.Builder =
    builder(parallelism).config(RocksDbStateStore._1, RocksDbStateStore._2)
}
