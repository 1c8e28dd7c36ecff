package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-sweep invariants (PERF.md "Plan audit") as a permanent
  * regression test: a future query or rewrite that plans a cartesian
  * product, an unintended nested-loop join, loses a filter pushdown,
  * or drops map-side partial aggregation fails CI instead of shipping
  * a 100 TB footgun. Plans are inspected at sf0.001 — plan SHAPE, not
  * timing, so the smallest SF is enough.
  *
  * Streaming-gate queries (q_stream_*) are excluded: calling them runs
  * an AvailableNow streaming query and returns the memory-sink table,
  * whose batch plan says nothing about the streaming plan under test
  * (StreamingSpec covers those semantics).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private lazy val sweep: Map[String, String] =
    SparkEntry.queries.keys.filterNot(_.startsWith("q_stream"))
      .map(n => n -> planOf(n)).toMap

  test("no query in the catalog plans a cartesian product") {
    for ((name, p) <- sweep)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
  }

  /** Plan lines of partition-less Window operators. A `Window` node
    * prints its non-empty specs as top-level bracket groups:
    * `[functions], [partitionSpec], [orderSpec]` fully specified,
    * two groups when one spec is empty. The ambiguity between
    * `[funcs], [partition]` (fine: partitioned, unordered frame) and
    * `[funcs], [order]` (the global-sort killer) resolves by the
    * group's content — an order spec always carries ASC/DESC NULLS
    * markers.
    */
  private def globalWindowLines(plan: String): Seq[String] =
    plan.linesIterator.filter { l =>
      val i = l.indexOf("Window [")
      i >= 0 && {
        val s = l.substring(i + "Window ".length)
        var depth = 0
        val groups = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
        for (c <- s) {
          if (c == '[') { if (depth == 0) groups += new StringBuilder; depth += 1 }
          else if (c == ']') depth -= 1
          else if (depth >= 1 && groups.nonEmpty) groups.last.append(c)
        }
        def isOrderSpec(g: String): Boolean =
          g.contains(" ASC") || g.contains(" DESC")
        groups.length < 2 ||
          (groups.length == 2 && isOrderSpec(groups(1).toString))
      }
    }.toSeq

  test("no cataloged query plans a partition-less WindowExec outside the bounded-input allowlist") {
    // A global (partition-less) window is a single-task sort over its
    // whole input — the scale killer that got q_quality_curriculum's
    // ntile face demoted to a spec-only cross-check in round 13. The
    // allowlist names the queries whose global window runs over a
    // PROVABLY BOUNDED input (a model/aggregate table untethered from
    // corpus size), each with its bound:
    val bounded = Set(
      "q_bpe_pairs",          // rank over the adjacent-pair AGG: alphabet²-sized
      "q_quantile_dd",        // cumsum over the DDSketch bucket table:
      "q_quantile_dd_rollup"  //   width-bounded (log-γ buckets), not corpus
    )
    val flagged = sweep.toSeq.sortBy(_._1).map { case (name, p) =>
      name -> globalWindowLines(p)
    }.filter(_._2.nonEmpty)
    val offenders = flagged.collect { case (name, ls) if !bounded(name) =>
      s"$name:\n  ${ls.mkString("\n  ")}"
    }
    assert(offenders.isEmpty,
      s"partition-less WindowExec outside the allowlist:\n${offenders.mkString("\n")}")
    // keep the allowlist honest: every entry must actually plan the
    // global window it is excused for (a stale entry would silently
    // re-admit the pattern later)
    val stale = bounded -- flagged.map(_._1).toSet
    assert(stale.isEmpty, s"allowlist entries with no global window: $stale")
  }

  test("broadcast-nested-loop joins appear only in the intended broadcast-scalar/dim crosses") {
    // each of these carries a broadcast side that is a scalar row or a
    // tiny dim (query set, per-group stats, corpus count, config dim) —
    // the cross is the POINT, and the broadcast keeps it linear
    val intended = Set("q_knn", "q_ann_ivf", "q_serve_snapshot",
      "q_knn_q8", "q_knn_q8dot", // broadcast query-code table × corpus codes
      "q_ann_ivf_layout", // broadcast per-cluster rep table × query set
      "q_ann_ivf_q8", // broadcast per-cluster rep-code table × query set
      "q_ann_ivf_trained", // broadcast learned-centroid codebook × query set
      "q_ann_ivf_trained_q8", // broadcast quantized-centroid codebook × query set
      "q_ann_ivf_kpp", // same trained-codebook probe, kpp-seeded build
      "q_ann_epoch", // the q_ann_ivf_trained probe against the resolved epoch
      "q_ann_takedown", // same probe over the post-takedown layout
      "q_ann_pq_rerank_rest", // same shortlist cross; float fetch is point reads
      "q_ann_bin_knn", // broadcast query sign-sketches × corpus sketch table
      "q_hybrid_rrf", // dense half: broadcast query vectors × corpus (knnBruteForce)
      "q_snapshot_diff", "q_tfidf", "q_ttl_filter",
      "q_embed_outliers", // 2-column percentile stats row × vector side
      "q_kmeans_assign", "q_semdedup", // k-row centroid table × corpus
      "q_semdedup_incr", // same centroid cross, once per side (new + corpus)
      "q_knn_graph", // k-row centroid table × corpus (assignment), then bucketed pairs
      "q_knn_graph_mp", // same centroid cross, widened to top-p probes per vector
      "q_ann_pq", // k-row sub-codebook table × corpus slices (L2 assignment)
      "q_ann_pq_knn", // same trainer cross + broadcast query set × decoded corpus
      "q_ann_pq_rerank", // same shortlist cross; the rerank itself is an id-equality join
      "q_ann_ivf_pq", // coarse + sub-codebook trainer crosses + broadcast rep probe
      "q_ann_ivf_pq_res", // same crosses over the residual table
      "q_pagerank", // the knnGraph centroid cross building the edge table
      "q_source_overlap_kmv", // S-row KMV sketch table × itself (S = #sources)
      "q_mix_temperature", // 1-row global-min × S-row count table
      "q_quantile_dd", // 3-quantile row set × bucket-table-sized cumsum (the sketch)
      "q_quantile_dd_grouped", // 3-quantile rows × S-group count table, same class
      "q_quantile_dd_rollup") // same sketch-extraction cross over the merged buckets
    for ((name, p) <- sweep if p.contains("BroadcastNestedLoopJoin"))
      assert(intended(name), s"$name plans an unintended BroadcastNestedLoopJoin")
  }

  test("q_curate_e2e executes exactly ONE file scan of documents (shared-scan curation DAG)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // Count documents-file scans across EVERY action the composed DAG
    // runs (the localCheckpoint materializations fire the listener via
    // withAction, the final collect via the driver's normal path).
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        actions.incrementAndGet()
        val n = qe.executedPlan.toString.linesIterator
          .count(l => l.contains("FileScan parquet") && l.contains("documents"))
        scans.addAndGet(n)
        ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = SparkEntry.queries("q_curate_e2e")(spark, dir)
      assert(df.count() > 0)
      // the executed-plan string of the RETURNED frame reads only
      // checkpointed blocks — no file scan at all downstream
      assert(!df.queryExecution.executedPlan.toString.contains("FileScan"),
        "final curate plan should read checkpoints, not files")
      // listener delivery is async — wait for it to drain
      val deadline = System.nanoTime() + 10e9.toLong
      while (actions.get() < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(actions.get() >= 3, s"expected >=3 actions (2 checkpoints + count), saw ${actions.get()}")
      assert(scans.get() == 1,
        s"composed curation DAG executed ${scans.get()} documents scans; the shared-scan contract is exactly 1")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q3_shipping pushes its filters into every scan") {
    val p = planOf("q3_shipping")
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters in q3 scans")
    assert(!p.replaceAll("PushedFilters: \\[[^\\]]+\\]", "")
      .contains("PushedFilters"), "a q3 scan lost its pushed filters")
  }

  test("q_latest_per_key ships partial max_by below the exchange (map-side combine)") {
    assert(planOf("q_latest_per_key").contains("partial_max_by"),
      "argmax no longer partial-aggregates map-side")
  }

  test("q_dedup_span ships partial_min below the exchange (hot spans collapse map-side)") {
    // the operator's hot-key claim rests on this: a span duplicated a
    // million times must partially aggregate to one candidate per map
    // partition BEFORE the first-occurrence exchange
    assert(planOf("q_dedup_span").contains("partial_min"),
      "span first-occurrence index no longer partial-aggregates map-side")
  }

  test("q_bpe_pairs partial-aggregates the corpus-sized word count") {
    val p = planOf("q_bpe_pairs")
    assert(p.contains("partial_count"),
      "word-frequency agg lost its map-side combine")
    assert(p.contains("partial_sum"),
      "pair-count agg lost its map-side combine")
  }

  test("q_decontaminate broadcasts the eval-set shingles (corpus side stays map-only)") {
    val p = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "decontamination join lost its broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus side is being shuffled for the join")
  }

  test("bloom twins keep the might_contain probe BELOW the exact join") {
    // the operator's contract: the sketch filter runs map-side on the
    // big side, so only the candidate slice reaches the join — losing
    // the probe silently reverts to the un-accelerated plan
    // (codegen of the probe itself is pinned in BloomSpec on a
    // non-AQE plan, where the `*(n)` markers are printable)
    for (name <- Seq("q_bloom_anti", "q_decontaminate_bloom")) {
      val p = planOf(name)
      assert("""Filter .*might_contain""".r.findFirstIn(p).isDefined,
        s"$name lost its bloom probe filter")
    }
  }

  test("q_twap's grouped agg reuses the window's hash partitioning (one data shuffle)") {
    // the operator's cost claim: lead() partitions by (keys, bucket) and
    // the groupBy on the same keys rides that Exchange — a second
    // hashpartitioning Exchange means the claim (and the cost class) broke.
    // The final orderBy adds ONE rangepartitioning Exchange; that's the sort.
    val p = planOf("q_twap")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash Exchange in q_twap, found $hashEx:\n$p")
  }

  test("q_roll_corr's lag and frame sums share one hash exchange") {
    // lag-window → filter → sums-window all partition on user_id with
    // the same order; a second hashpartitioning Exchange means the
    // filter broke partitioning propagation and the claim is stale
    val p = planOf("q_roll_corr")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash Exchange in q_roll_corr, found $hashEx:\n$p")
  }

  test("q_kmeans_assign partial-aggregates the argmax below the exchange") {
    // the operator's cost claim: the k-fold centroid expansion is
    // map-side (broadcast cross) and max_by pre-reduces per partition,
    // so the shuffle carries |corpus| rows, not |corpus|·k
    val p = planOf("q_kmeans_assign")
    assert(p.contains("partial_max_by"),
      "assignNearest no longer partial-aggregates the argmax map-side")
    assert(p.contains("BroadcastExchange"),
      "centroid table is no longer broadcast")
  }

  test("minhash signature kernel runs exactly once per row in the plan") {
    // the fused kernel's win is one pass per doc; an isNotNull filter
    // on its output gets predicate-pushed below the project and
    // re-evaluates kernel+shingle pipeline per row (seen live), and a
    // CollapseProject regression would inline it 8× into element_at
    // a range source, not a LocalRelation — ConvertToLocalRelation
    // would otherwise evaluate the projection at optimize time
    val docs = spark.range(100).selectExpr("id AS doc_id",
      "concat('a b c d e f w', id) AS text")
    val p = graft.ops.Dedup.withMinhashSignature(docs, "doc_id", "text", 8)
      .queryExecution.optimizedPlan.toString
    val n = "graft_minhash".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 graft_minhash in the plan, found $n:\n$p")
  }

  test("forest CC stays a single shuffle-free job over materialized pairs") {
    // the operator's whole value is narrow-only execution: partition
    // union-find → coalesce-tree merges, no Exchange anywhere. Feed it
    // a pre-materialized pair table so the plan under audit is the CC
    // itself, not the upstream candidate generator.
    import spark.implicits._
    val pairs = (1L to 200L).map(i => (i, i / 2 + 1)).toDF("i", "j")
      .repartition(8).localCheckpoint(true)
    val cc = graft.ops.Dedup.connectedComponentsForest(pairs, fanIn = 2)
    cc.collect()
    val p = cc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"forest CC planned a shuffle — the one-job contract is broken:\n$p")
    assert(p.contains("Coalesce"), s"expected the narrow merge tree in:\n$p")
  }

  test("q_quantile_sample is one partial-agged sketch pass — no sort, no window") {
    val p = planOf("q_quantile_sample")
    assert(p.contains("partial_bottomksampleaggregator")
        || p.toLowerCase.contains("partial_bottomksample"),
      s"sketch no longer partial-aggregates map-side:\n$p")
    assert(!p.contains("Window"),
      "quantile sketch must never plan a window over the rows")
    // exactly one data shuffle: the grouped agg exchange (plus AQE reads)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected ONE grouped-agg exchange, found $exchanges:\n$p")
  }

  test("q_quality_curriculum_sk bands with NO window anywhere (the 100 TB curriculum plan)") {
    // The ntile face (q_quality_curriculum) is the exact-rank
    // small-SF cross-check and keeps its global window; the sketch
    // face is the plan a 100 TB run uses — frozen thresholds, banding
    // as a map-side comparison. A Window (any window: the partition-
    // less ntile sort was the catalog's one scale-killer) in this
    // plan means the scale face regressed to the rank formulation.
    val p = planOf("q_quality_curriculum_sk")
    assert(!p.contains("Window"),
      s"sketch-thresholded curriculum planned a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the B-row weight join lost its broadcast")
  }
}
