package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling for training-data pipelines: keep a row
  * iff the md5 of (seed|key) starts below a threshold — exact,
  * replayable (same seed ⇒ same sample, across runs AND engines,
  * unlike `DataFrame.sample`'s RNG), and stratifiable (per-stratum
  * rates, e.g. downsample the dominant language while keeping rare
  * ones whole — the standard rebalancing tool for corpus mixes).
  *
  * Scale: a pure map-side filter on a hash prefix — no shuffle, no
  * state, pushes the kept fraction all the way into the first stage.
  */
object Sample {

  /** Rate ∈ [0,1] as an 8-hex-digit md5-prefix threshold: a uniform
    * 32-bit prefix is below rate·2³² with probability `rate`. Rates
    * ≥ 1 map to "g", which every hex string sorts below.
    */
  def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, (rate * 4294967296L).toLong)}%08x"

  /** Keep rows where md5(seed|key) prefix < stratum threshold. */
  def stratifiedHash(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      seed: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (s, r)) => when(strataCol === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")),
        1, 8) < thr)
  }

  /** Ranked per-group cap: keep the k best rows of each group under an
    * explicit total order — the "at most N documents per domain" mixing
    * step, where "best" is a quality ranking rather than a coin flip
    * (for an unranked cap, [[stratifiedHash]] is the map-only tool).
    * One shuffle on the group key; rank() would keep co-equal rows past
    * the cap, so callers make `order` total (tiebreak on a unique id)
    * and row_number stays deterministic.
    *
    * Scale note: a pathological group (one domain = half the corpus)
    * sorts in a single task. The standard fix when that bites is a
    * pre-pass that hash-prunes giant groups down toward k·fanout with
    * [[stratifiedHash]] before the exact ranked cap — composable from
    * these two primitives, not a separate operator.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column],
      order: Seq[Column], k: Int): DataFrame = {
    require(!df.columns.contains("_rn"),
      "capPerGroup reserves the internal column name _rn; " +
        "rename or drop it first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Temperature mixing at T = 2 (the multilingual-corpus standard:
    * sample share ∝ n^(1/2), so big sources are damped toward the
    * small ones): per-source keep rate r_s = √(n_min / n_s) — the
    * UNIQUE rate profile realizing n^(1/2) shares while keeping the
    * smallest source whole (r = 1 wastes no data; every other source
    * subsamples by exactly its size excess). Applied as the same
    * deterministic md5-threshold filter as [[stratifiedHash]], with
    * the thresholds COMPUTED from the data instead of passed in.
    *
    * Every float step (÷, √, ×2³², floor) is a single IEEE
    * correctly-rounded operation on exact integer inputs, so any
    * engine reproduces the thresholds bit-for-bit — which is what
    * makes a data-dependent sampling decision oracle-checkable.
    *
    * Scale: one partial-agged count pass (the S-row rate table
    * localCheckpoints, ≤ S rows held), then a map-side broadcast-join
    * + hash filter over the corpus — no shuffle of document rows.
    * Generalizing to arbitrary T needs pow(), which is NOT correctly
    * rounded — [[temperatureMixQuantized]] is that generalization,
    * via grid-quantized rates computed in exact integer arithmetic.
    */
  def temperatureMixSqrt(df: DataFrame, keyCol: Column, sourceCol: Column,
      seed: String): DataFrame = {
    require(!df.columns.exists(Set("_src", "_thresh", "keep_rate")),
      "temperatureMixSqrt reserves column names _src/_thresh/keep_rate")
    val counts = df.groupBy(sourceCol.as("_src")).agg(count(lit(1)).as("n_src"))
      .localCheckpoint()
    val nMin = counts.agg(min(col("n_src")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("keep_rate",
        sqrt(col("n_min").cast("double") / col("n_src").cast("double")))
      .withColumn("_thresh",
        floor(col("keep_rate") * lit(4294967296.0)).cast("long"))
      .select(col("_src"), col("keep_rate"), col("_thresh"))
    df.join(broadcast(rates), sourceCol === col("_src"))
      .filter(conv(substring(
          md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")),
          1, 8), 16, 10).cast("long") < col("_thresh"))
      .drop("_src", "_thresh")
  }

  /** Temperature mixing at ARBITRARY rational T = tNum/tDen ≥ 1
    * (sample share ∝ n^(1/T)): per-source keep rate
    * r_s = (n_min/n_s)^(1/T), QUANTIZED to the 2^-gridBits grid.
    * Real mixing recipes use T ∈ [1.5, 4] (mT5, PaLM); [[
    * temperatureMixSqrt]] covers only T = 2 because pow() is not
    * correctly rounded and a naive pow-computed threshold would
    * diverge between engines by an ulp — exactly at a hash-threshold
    * boundary, that flips membership.
    *
    * The quantized threshold dodges float entirely: it is the LARGEST
    * integer t with  t^tNum · n_s^tDen ≤ 2^(gridBits·tNum) · n_min^tDen
    * — a monotone integer predicate, found by a bit-by-bit descent
    * over exact BigInt arithmetic, so every engine that can compare
    * integers agrees on t exactly (the oracle reproduces it with a
    * recursive-CTE HUGEINT binary search). The reported keep_rate
    * t / 2^gridBits is a dyadic rational with ≤ gridBits+1 significant
    * bits — exactly representable as a double — and sits within one
    * grid step BELOW the true pow() rate (pinned in TrainingSpec).
    *
    * Scale: one partial-agged count shuffle; the S-row count table is
    * collected to the DRIVER for the threshold computation (S =
    * distinct sources — the same cardinality AQE plans over; this is
    * query planning, not a data collect), then a broadcast join +
    * map-side hash filter over the corpus — document rows never
    * shuffle. gridBits ≤ 32 so thresholds compare against the same
    * 32-bit md5 prefix as [[stratifiedHash]].
    */
  def temperatureMixQuantized(df: DataFrame, keyCol: Column,
      sourceCol: Column, seed: String, tNum: Int, tDen: Int = 1,
      gridBits: Int = 32): DataFrame = {
    require(tNum >= 1 && tDen >= 1 && tNum >= tDen,
      s"temperature tNum/tDen must be >= 1, got $tNum/$tDen")
    require(gridBits >= 1 && gridBits <= 32,
      s"gridBits must be in [1,32], got $gridBits")
    require(!df.columns.exists(Set("_src", "_thresh", "keep_rate")),
      "temperatureMixQuantized reserves column names _src/_thresh/keep_rate")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(sourceCol.cast("string").as("_src"))
      .agg(count(lit(1)).as("n_src"))
      .as[(String, Long)].collect().toSeq
    if (counts.isEmpty)
      // empty input: same empty-result flow-through as the sqrt face
      df.withColumn("keep_rate", lit(0.0)).filter(lit(false))
    else {
      val nMin = counts.map(_._2).min
      val rows = counts.map { case (s, n) =>
        val rhs = (BigInt(1) << (gridBits * tNum)) * BigInt(nMin).pow(tDen)
        val nsT = BigInt(n).pow(tDen)
        var t = BigInt(0)
        var step = BigInt(1) << gridBits
        while (step > 0) {
          val c = t + step
          if (c.pow(tNum) * nsT <= rhs) t = c
          step >>= 1
        }
        (s, t.toLong.toDouble / math.pow(2.0, gridBits),
          (t << (32 - gridBits)).toLong)
      }
      val rates = rows.toDF("_src", "keep_rate", "_thresh")
      df.join(broadcast(rates), sourceCol.cast("string") === col("_src"))
        .filter(conv(substring(
            md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")),
            1, 8), 16, 10).cast("long") < col("_thresh"))
        .drop("_src", "_thresh")
    }
  }

  /** Greedy token-budget selection — the "take the best documents
    * until the budget is spent" mixing step: within each group, order
    * rows by the caller's quality ranking (made total with a
    * unique-id tiebreak) and keep rows while the RUNNING total of
    * `weight` (inclusive of the current row) stays ≤ `budget`. The
    * boundary row that would push the total past the budget is
    * dropped — the greedy prefix rule every token-budgeted recipe
    * uses, deterministic because the order is total and the weights
    * are integers (no float accumulation).
    *
    * The running total is exposed as `cumCol` so downstream stages
    * (and audits) see how much of the budget each survivor consumed.
    *
    * Shape: one shuffle on the group key, a per-group sort, and a
    * running sum with the rows-unbounded-preceding frame — identical
    * cost to [[capPerGroup]], which is this operator with
    * weight ≡ 1. The same giant-group caveat applies, with the same
    * composable fix (hash-prune huge groups with [[stratifiedHash]]
    * before the exact ranked pass).
    */
  def selectToBudget(df: DataFrame, groupCols: Seq[Column],
      order: Seq[Column], weight: Column, budget: Long,
      cumCol: String = "cum_weight"): DataFrame = {
    require(!df.columns.contains(cumCol),
      s"selectToBudget writes the running total to '$cumCol'; " +
        "rename or drop the existing column, or pass another cumCol")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol, sum(weight.cast("long")).over(w))
      .filter(col(cumCol) <= budget)
  }

  /** Epoch upsampling — the other half of mixture weighting:
    * [[temperatureMixSqrt]]/[[temperatureMixQuantized]] only DELETE
    * rows (rate ≤ 1), but real mixing recipes also REPEAT
    * high-quality sources (factor > 1, e.g. "Wikipedia × 2.5").
    * Each row is emitted `floor(f)` times plus one more copy with
    * probability `f − floor(f)`, decided by the same deterministic
    * md5-threshold coin as [[stratifiedHash]] — so the realized
    * multiset is a pure function of (seed, key) and the expected
    * multiplicity is exactly f. The copy index comes back as
    * `epoch` (0-based), which downstream shuffling/sharding feeds
    * into its key so copies land in different shards.
    *
    * Factors below 1 degenerate to a plain hash subsample (0 or 1
    * copies), making this a superset of the rate filters; rows whose
    * multiplicity lands on 0 are dropped.
    *
    * Shape: map-side only — a per-row CASE for the factor, one hash
    * compare, and an explode of a 0..n−1 sequence; no shuffle, no
    * state. At 100 TB the explode IS the write amplification the
    * recipe asked for, paid exactly once at the final materialize.
    */
  def upsampleEpochs(df: DataFrame, keyCol: Column, sourceCol: Column,
      factors: Map[String, Double], defaultFactor: Double = 1.0,
      seed: String): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(f => f >= 0.0),
      "upsample factors must be non-negative")
    require(!df.columns.contains("epoch") && !df.columns.contains("_ue_n"),
      "upsampleEpochs writes 'epoch' and reserves '_ue_n'")
    def perSource[T](f: Double => T, dflt: T, mk: T => Column): Column =
      factors.toSeq.sortBy(_._1).foldLeft(mk(dflt)) { case (acc, (s, v)) =>
        when(sourceCol === s, mk(f(v))).otherwise(acc)
      }
    // integer part and fractional-part threshold are both computed
    // driver-side per source (exact IEEE: floor, subtract, ×2³²,
    // floor), so the engine only ever compares strings and adds ints
    val full = perSource[Int](f => math.floor(f).toInt,
      math.floor(defaultFactor).toInt, lit(_))
    val thr = perSource[String](f => thresholdHex(f - math.floor(f)),
      thresholdHex(defaultFactor - math.floor(defaultFactor)), lit(_))
    val extra = when(substring(
      md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")),
      1, 8) < thr, 1).otherwise(0)
    df.withColumn("_ue_n", full + extra)
      .filter(col("_ue_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("_ue_n") - 1)))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("_ue_n")
  }

  /** Deterministic named-bucket split — train/validation/test
    * assignment as a pure function of (seed, key): the [0, 1) hash
    * line is cut at the cumulative fractions and each row is labeled
    * by the segment its md5 prefix falls in. The last bucket absorbs
    * the residual up to 1.0, so every row is assigned. Same
    * hex-string-compare trick as [[stratifiedHash]]: thresholds are
    * driver-computed, the engine compares strings — map-side only,
    * no shuffle, rerun-stable, and membership never changes when the
    * corpus grows (a doc's bucket depends on its key alone).
    */
  def splitAssign(df: DataFrame, keyCol: Column,
      fractions: Seq[(String, Double)], seed: String,
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one bucket")
    require(fractions.forall(_._2 >= 0.0), "fractions must be non-negative")
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    require(!df.columns.contains(splitCol),
      s"splitAssign writes '$splitCol'; rename or drop it first")
    val h = substring(
      md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary")), 1, 8)
    val cuts = fractions.init.scanLeft(0.0)(_ + _._2).tail // cumulative, < last
    val assign = fractions.init.zip(cuts).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), cut), acc) =>
      when(h < lit(thresholdHex(cut)), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assign)
  }

  /** Deterministic seeded global shuffle into `nShards` shards — the
    * final write stage of a training-data pipeline: every row gets a
    * shard in [0, nShards) and a dense position 0..k−1 within its
    * shard, both pure functions of (seed, key), so any engine — and
    * any RERUN — produces the identical layout. Shard and order both
    * derive from md5(seed|key): shard from the first 32 hash bits mod
    * nShards (uniform to within 2⁻³² bias), order from the full
    * 128-bit hash with the key as tiebreak — a shuffled order that no
    * corpus sort key leaks into. Changing the seed is a fresh,
    * independent epoch permutation.
    *
    * Shape: one hash-partitioned exchange on the shard id and a
    * per-shard sort — exactly the physical work a sharded write must
    * do anyway, so the operator adds nothing beyond the write's own
    * cost. The dense in-shard position is a row_number over that
    * sort; at 100 TB each shard is a task's output file and nShards
    * is sized to the target file size, not to the executor count.
    */
  def shuffleShards(df: DataFrame, keyCol: Column, seed: String,
      nShards: Int, shardCol: String = "shard",
      posCol: String = "pos"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("_sh_h"),
      "shuffleShards reserves the internal column name _sh_h")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(s"$seed|"), keyCol.cast("string")).cast("binary"))
    val w = Window.partitionBy(col(shardCol)).orderBy(col("_sh_h"), keyCol)
    df.withColumn("_sh_h", h)
      .withColumn(shardCol,
        (conv(substring(col("_sh_h"), 1, 8), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn(posCol, row_number().over(w).cast("long") - 1)
      .drop("_sh_h")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis,
    * IPL 2006: keep the k items with the largest uᵢ^(1/wᵢ)) in exact
    * integer-hash arithmetic — the "sample documents ∝ quality
    * weight" curation primitive. Instead of the float pow (whose
    * cross-engine bit-identity transcendentals can't guarantee), each
    * row's priority is the MAX of wᵢ independent 60-bit md5 draws:
    * max of w uniforms has CDF t^w — the SAME distribution as
    * u^(1/w) — so ES's top-k-by-priority verdicts are reproduced
    * exactly, deterministically, and both engines agree on every bit.
    * Integer weights only (the standard quality-bucket setup);
    * fractional weights quantize to a grid upstream.
    *
    * Scale shape: the w draws are a map-side array expression (no
    * explode, no per-copy rows — w is bounded by maxWeight), and the
    * k winners come from ONE bounded-state [[graft.functions
    * .TopKByAggregator]] pass, so the exchange carries ≤ parts·k
    * pairs. Draws are 52-bit (13 hex chars) so every priority is
    * EXACTLY representable in the aggregator's double buffer (2⁵² <
    * 2⁵³) — a 60-bit draw would silently round and diverge from the
    * oracle's exact integer comparison. Ties (two rows drawing the
    * same 52-bit max — ~k²/2⁵²) break by id ascending, keeping the
    * verdict total. Invalid weights (null, < 1, > maxWeight) raise
    * inside the draw expression itself, so the guard cannot be
    * pruned away.
    */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int, seed: String, maxWeight: Int = 64): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    weightedKeptRows(
      df.withColumn("_ws_p", weightedPriority(idCol, weightCol, seed, maxWeight))
        .agg(graft.functions.TopK.topKBy(
          col("_ws_p").cast("double"), idCol.cast("long"), k).as("_ws_kept")),
      "_ws_kept")
  }

  /** The per-row Efraimidis–Spirakis priority as a pure Column — the
    * max of w independent 52-bit md5 draws (≡ u^(1/w) in
    * distribution). Row-deterministic (a pure function of id and
    * weight), which is WHY the streaming face (q_stream_weighted)
    * equals the batch pass: the priority does not depend on arrival
    * order or batching, and the bounded top-k agg merges
    * arrival-order-invariantly.
    */
  def weightedPriority(idCol: Column, weightCol: Column, seed: String,
      maxWeight: Int = 64): Column = {
    val wInt = weightCol.cast("int")
    val guarded = when(wInt.isNull || wInt < 1 || wInt > lit(maxWeight),
      raise_error(concat(
        lit(s"weightedSample needs integer weights in [1, $maxWeight], got "),
        coalesce(wInt.cast("string"), lit("null"))))).otherwise(wInt)
    array_max(transform(
      sequence(lit(1), guarded),
      j => conv(substring(md5(
        concat(lit(s"$seed|"), idCol.cast("string"), lit("|"), j.cast("string"))
          .cast("binary")), 1, 13), 16, 10).cast("long")))
  }

  /** The (rank, id, priority) explode of a topKBy array — shared by
    * the batch op and the streaming face's batch-side apply.
    */
  def weightedKeptRows(df: DataFrame, keptCol: String): DataFrame =
    df.select(posexplode(col(keptCol)).as(Seq("_ws_pos", "_ws_pair")))
      .select((col("_ws_pos") + 1).cast("long").as("rank"),
        col("_ws_pair").getField("_2").as("id"),
        col("_ws_pair").getField("_1").cast("long").as("priority"))
}
