package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large joins on hot keys.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so badly that even
  * split sub-partitions hotspot, or when AQE is unavailable (streaming
  * micro-batches). Technique: fact rows get a deterministic salt in
  * [0, S); the other side is replicated S× with every salt value; the
  * join key becomes (key, salt), spreading each hot key over S
  * reducers. Results are exactly those of the unsalted join for the
  * supported join types (inner/left/left_semi/left_anti — ones where
  * unmatched rows of the replicated side are never emitted; right/full
  * outer would emit them once per salt and are rejected).
  *
  * The salt is derived from a unique fact column (pmod of its hash),
  * not rand(), so replays/retries are deterministic (same row → same
  * partition), which retried micro-batch sinks rely on.
  *
  * SELECTION RULE (both regimes measured, PERF.md rounds 3 and 9):
  * salting replicates the ENTIRE `other` side S×, so its cost is
  * S·|other| extra build rows against the straggler time it removes —
  * choose `saltedJoin` only when `other` is dim-sized (round-3 hot-key
  * probe, 20M facts ⋈ 5k dim: salted 3.3 s vs AQE 6.4 s, ~2×) and
  * AQE's split is unavailable or the sort itself is the bottleneck;
  * when `other` is corpus-sized the replication dominates everything
  * (round-9 paragraph tag-back probe, 4M paras ⋈ 3M first-occurrence
  * index with one 1M-occurrence hash: salted-8 19.3 s vs AQE 2.6-3.1 s
  * — 7× WORSE) and AQE skew-split is the right tool, with lowered
  * `skewedPartitionThresholdInBytes`/`skewedPartitionFactor` when the
  * hot partition sits under the 256 MB default. Rule of thumb:
  * S·|other| must stay broadcast-class; if it doesn't fit in a few
  * hundred MB, don't salt — split.
  */
object Skew {

  def saltedJoin(
      facts: DataFrame,
      other: DataFrame,
      joinKey: String,
      saltFrom: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("outer", "").filter(_ != '_')
    require(Set("inner", "left", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti only, got '$joinType': " +
        "right/full outer would emit each unmatched replicated-side row once per salt")
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(joinKey, "_salt"), joinType).drop("_salt")
  }
}
