package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the second
  * of the two tokenizer-training families (BPE builds merges bottom-up
  * from characters; unigram starts from an over-complete piece vocab
  * and PRUNES under a probabilistic model; Kudo 2018). Completes the
  * tokenizer-training story next to [[TextOps.bpeTrain]], with the
  * same division of labor: the corpus is touched ONCE (the
  * word-frequency aggregation), every training iteration runs on the
  * bounded distinct-word table, and the driver sees only model-sized
  * rows (piece counts per round — the classifier's B-row gradient
  * shape).
  *
  * EVERY number in training is an exact integer — there is no
  * floating-point state anywhere, which is what makes the whole
  * multi-round run replay hash-exactly in the DuckDB oracle
  * (q_unigram_train / q_unigram_train_soft), closing the gap the
  * previous `Math.log`-literal design had (libm `ln` is not
  * ulp-specified across engines):
  *
  *  - HARD (Viterbi) EM scores arcs with the quantized log-prob
  *    `qlp(piece) = qlog2(c_adj) − qlog2(total)` in 2^-16-bit units
  *    ([[Qlog.qlog2]] — the square-and-shift integer log2 both
  *    engines compute bit-identically). DP sums and comparisons are
  *    long arithmetic: exact, total-ordered, portable.
  *  - SOFT (forward-backward) EM needs products and SUMS of
  *    probabilities (log-sum-exp is transcendental), so it runs in
  *    block-floating-point: every mass is `m·2^e` with a 30-bit
  *    integer mantissa; multiply, add (align-truncate), normalize,
  *    and posterior division are shifts and integer ops only — the
  *    softmax-free exact-integer E-step.
  *
  * The algorithm, made deterministic:
  *  1. SEED: every substring of length ≤ `maxPieceLen` of every
  *     distinct word, frequency-weighted; vocab = ALL single
  *     characters (segmentability guarantee) + the top multi-char
  *     candidates by (count DESC, piece ASC in UTF-8 byte order — the
  *     collation Spark's ORDER BY and DuckDB's binary collation
  *     share; driver-side tie-breaks use [[Qlog.u8Less]] for the
  *     same reason).
  *  2. E-STEP: per distinct word, candidate substrings score via a
  *     BROADCAST HASH JOIN against the piece table, then a per-word
  *     DP over the word's own arc list, ENTIRELY in Catalyst
  *     higher-order functions — no UDF. Hard: Viterbi argmax, ties
  *     to the smallest split point (ascending-j scan, strict `>`).
  *     Soft: forward-backward posteriors, quantized to 2^-20
  *     occurrence units per arc.
  *  3. M-STEP: piece counts = (expected) segmentation occurrences
  *     weighted by word frequency — one keyed agg on the word table;
  *     new scores derived driver-side from the integer counts.
  *  4. PRUNE: drop multi-char pieces with zero mass, then shrink
  *     geometrically (keep top `max(target, ⌊0.6·current⌋)` by
  *     (count DESC, piece ASC)) until the target vocab size.
  *
  * Single characters are Laplace-smoothed (+1 occurrence unit) so no
  * TRAINING char ever gets probability zero; a char never seen in
  * training has no piece at all, and apply-time segmentation keeps
  * such a token's unsegmentable prefix whole — the deterministic
  * <unk> fallback (see [[segmented]]).
  *
  * Scale: seed counting explodes ≤ len·maxPieceLen substrings per
  * DISTINCT word (vocab-table-sized ×~100, not corpus-sized); each EM
  * round is one projection + one keyed agg over the word table and a
  * model-sized collect. At 100 TB the word table is Zipf-bounded —
  * millions of rows against a corpus of trillions of tokens — and the
  * trained model applies corpus-wide via [[encode]], a map-side
  * projection exactly like [[TextOps.bpeEncode]].
  */
object Unigram {

  /** Quantized −∞ sentinel for the hard DP (−2^61: adding any real
    * arc score cannot overflow, and no reachable path score ever
    * comes near it). The DuckDB oracle uses the same literal.
    */
  private[graft] val NegQ: Long = -(1L << 61)

  /** Occurrence unit of SOFT expected counts: 2^-20 of one
    * occurrence (so soft counts are longs; hard counts use unit 1).
    */
  private[graft] val SoftScale: Long = 1L << 20

  /** Distinct-word frequency table `(w, wf)` — the ONE corpus-shaped
    * aggregation; everything in training iterates over this.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))

  /** Frequency-weighted substring candidates `(piece, cnt)` of length
    * 1..maxPieceLen over the word table. Counts occurrences (every
    * start position), weighted by word frequency.
    */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("wf"), col("w"), length(col("w")).as("n"))
      .select(col("wf"), explode(flatten(
        transform(sequence(lit(1), col("n")), i =>
          transform(sequence(i, least(col("n"), i + maxPieceLen - 1)), j =>
            col("w").substr(i, j - i + 1))))).as("piece"))
      .groupBy("piece").agg(sum(col("wf")).as("cnt"))

  /** Seed-candidate selection, BOUNDED ENGINE-SIDE: single-char
    * seeds (alphabet-sized by construction) and the top
    * nTarget·seedMultiplier multi-char substrings under the
    * (cnt DESC, piece ASC) total order — selected with
    * orderBy+limit, which Spark plans as TakeOrderedAndProject
    * (per-partition top-k, then a k-row merge on the driver). The
    * previous formulation collected EVERY distinct substring of
    * length ≤ maxPieceLen before truncating — at web scale
    * (≳100 M distinct words) hundreds of millions of driver rows,
    * dwarfing the model-sized collects everything else here is
    * bounded to. The piece tie-break is Spark's string ORDER BY =
    * unsigned UTF-8 byte order, which is also DuckDB's binary
    * collation — the oracle replays it verbatim. (Java's
    * `String.compareTo` would differ on supplementary-plane text;
    * nothing driver-side uses it — see [[Qlog.u8Less]].)
    * Returns (charSeeds, topMulti); driver rows ≤ |alphabet| +
    * nTarget·seedMultiplier by construction.
    */
  private[graft] def seedCandidates(words: DataFrame, maxPieceLen: Int,
      vocabSize: Int, seedMultiplier: Int)
      : (Array[(String, Long)], Array[(String, Long)]) = {
    val subs = substringCounts(words, maxPieceLen).persist()
    try {
      val charSeeds = subs.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val nTarget = math.max(0, vocabSize - charSeeds.length)
      val topMulti = subs.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece"))
        .limit(nTarget * seedMultiplier)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (charSeeds, topMulti)
    } finally { subs.unpersist(); () }
  }

  /** (count DESC, piece ASC in UTF-8 byte order) — the driver-side
    * mirror of the engines' total order, used by every prune.
    */
  private def byCountDescPieceAsc(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && Qlog.u8Less(a._1, b._1))

  /** Quantized log-probabilities of a count table: qlp(p) =
    * qlog2(c_adj) − qlog2(Σ c_adj), c_adj = c + unit for single
    * chars (Laplace). `unit` is 1 for hard counts, [[SoftScale]]
    * for soft. All longs; the oracle recomputes the identical
    * integers with the [[Qlog]] recursive CTE.
    */
  private[graft] def qlogProbs(m: Map[String, Long], unit: Long): Map[String, Long] = {
    val adj = m.map { case (p, c) =>
      p -> (if (p.length == 1) c + unit else c) }
    val qt = Qlog.qlog2(adj.values.sum)
    adj.map { case (p, c) => p -> (Qlog.qlog2(c) - qt) }
  }

  /** The Viterbi DP table for word `w` given its ARC LIST (the
    * (i, j, lp) triples of in-vocab substrings, lp a quantized-long
    * score, sorted by (i, j) — see [[segmented]] for why arcs instead
    * of a map literal): array (1-indexed, position p at element p+1)
    * of `(s: best score to prefix p, b: split point)`. Nested
    * aggregate: outer over positions, inner over that position's
    * arcs; the ascending-j arc order plus the strict `>` keeps the
    * SMALLEST split point on ties — a fixed total order, exact on
    * longs.
    */
  private def dpExpr(w: Column, arcs: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("s"), lit(-1).as("b"))),
      (acc, i) => concat(acc, array(
        aggregate(
          filter(arcs, a => a.getField("i") === i),
          struct(lit(NegQ).as("s"), lit(-1).as("b")),
          (best, a) => {
            val cand = element_at(acc, a.getField("j") + 1).getField("s") +
              a.getField("lp")
            when(cand > best.getField("s"),
              struct(cand.as("s"), a.getField("j").as("b"))).otherwise(best)
          }))))

  /** Walk the DP table's split points back from the end of the word,
    * prepending pieces — at most length(w) steps, unrolled by one
    * aggregate pass. `dp` must be a BOUND column (materialized via
    * withColumn), not a re-inlined expression, so the DP runs once
    * per word.
    */
  private def piecesExpr(w: Column, dp: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).as("p"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val p = st.getField("p")
        val back = element_at(dp, p + 1).getField("b")
        when(p > 0,
          struct(back.as("p"),
            concat(array(w.substr(back + 1, p - back)), st.getField("ps"))
              .as("ps")))
          .otherwise(st)
      },
      st => st.getField("ps"))

  /** Candidate arcs of every distinct value of `wCol`:
    * `(_ug_w, i, j, piece)` rows, piece = substr(w, j+1, i−j),
    * 1 ≤ i−j ≤ maxPieceLen. The shared front half of both E-steps:
    * the arcs join the broadcast model table for O(1) per-arc scoring
    * (`element_at` on a map literal is a LINEAR scan of the map per
    * lookup — measured 23 s/EM round at 8k pieces before this
    * restructure).
    */
  private def candArcs(words: DataFrame, wCol: String,
      maxPieceLen: Int): DataFrame =
    words.select(col(wCol).as("_ug_w")).distinct()
      .select(col("_ug_w"), explode(flatten(
        transform(sequence(lit(1), length(col("_ug_w"))), i =>
          transform(sequence(greatest(lit(0), i - maxPieceLen), i - 1), j =>
            struct(i.as("i"), j.as("j"),
              col("_ug_w").substr(j + 1, i - j).as("piece")))))).as("a"))
      .select(col("_ug_w"), col("a.i").as("i"), col("a.j").as("j"),
        col("a.piece").as("piece"))

  /** Attach each word's sorted in-vocab arc list `_ug_arcs` via the
    * broadcast hash join; `mkVal` provides the per-arc model payload
    * columns from the joined model row (hard: `lp`; soft: `pm`/`pe`).
    */
  private def withArcsBy(words: DataFrame, wCol: String,
      modelDf: DataFrame, arcStructType: String,
      mkVal: Seq[Column], maxPieceLen: Int): DataFrame = {
    val cand = candArcs(words, wCol, maxPieceLen)
    val arcs = cand.join(broadcast(modelDf),
        cand("piece") === modelDf("_ug_piece"))
      .groupBy("_ug_w")
      .agg(array_sort(collect_list(
        struct(col("i") +: col("j") +: mkVal: _*))).as("_ug_arcs"))
    words.join(arcs, col(wCol) === col("_ug_w"), "left")
      .drop("_ug_w")
      .withColumn("_ug_arcs", coalesce(col("_ug_arcs"),
        array().cast(s"array<$arcStructType>")))
  }

  private def withArcs(words: DataFrame, wCol: String,
      lp: Map[String, Long], maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    withArcsBy(words, wCol, lp.toSeq.toDF("_ug_piece", "_ug_lp"),
      "struct<i:int,j:int,lp:bigint>",
      Seq(col("_ug_lp").as("lp")), maxPieceLen)
  }

  /** Best segmentation of every word in `words` under quantized
    * model `lp`: adds `_ug_pieces` (array<string>). The DP column is
    * materialized before backtracking so it evaluates once per word.
    *
    * A word containing a substring no piece covers (possible only in
    * APPLY data — training seeds every observed char) backtracks to
    * the `-1` sentinel and keeps its unsegmentable prefix WHOLE — the
    * deterministic <unk> fallback.
    */
  def segmented(words: DataFrame, wCol: String,
      lp: Map[String, Long], maxPieceLen: Int): DataFrame =
    withArcs(words, wCol, lp, maxPieceLen)
      .withColumn("_ug_dp", dpExpr(col(wCol), col("_ug_arcs")))
      .withColumn("_ug_pieces", piecesExpr(col(wCol), col("_ug_dp")))
      .drop("_ug_dp", "_ug_arcs")

  /** Train the unigram LM (hard/Viterbi EM): returns the final model
    * as `(piece, count, qlp)` rows, count DESC then piece ASC; qlp is
    * the quantized log2-prob ([[qlogProbs]]). The model is
    * driver-sized BY DESIGN (it IS the tokenizer artifact, like
    * [[TextOps.bpeTrain]]'s merge list); [[encode]] compiles it back
    * into a projection for corpus-scale application.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      iters: Int, maxPieceLen: Int = 6,
      seedMultiplier: Int = 4): Seq[(String, Long, Long)] = {
    require(vocabSize > 0 && iters > 0 && maxPieceLen >= 2)
    val words = wordTable(docs, textCol).localCheckpoint()
    val (charSeeds, topMulti) =
      seedCandidates(words, maxPieceLen, vocabSize, seedMultiplier)
    val nTarget = math.max(0, vocabSize - charSeeds.length)
    var counts: Map[String, Long] =
      (charSeeds ++ topMulti).map { case (p, c) => p -> c }.toMap
    for (round <- 1 to iters) {
      val seg = segmented(words, "w", qlogProbs(counts, 1L), maxPieceLen)
        .select(col("wf"), explode(col("_ug_pieces")).as("piece"))
        .groupBy("piece").agg(sum(col("wf")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // chars always survive (zero-count chars ride on the +1 smooth);
      // multi-char pieces must EARN their keep, then shrink toward
      // the target on the gradual schedule
      val chars = counts.keySet.filter(_.length == 1)
        .map(p => p -> seg.getOrElse(p, 0L))
      val multisNow = counts.keySet.filter(_.length > 1)
        .map(p => p -> seg.getOrElse(p, 0L)).filter(_._2 > 0L).toSeq
      val keep = math.max(nTarget,
        if (round == iters) nTarget else (multisNow.size * 6) / 10)
      val kept = multisNow.sortWith(byCountDescPieceAsc).take(keep)
      counts = (chars ++ kept).toMap
    }
    val lp = qlogProbs(counts, 1L)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortWith((a, b) => byCountDescPieceAsc((a._1, a._2), (b._1, b._2)))
  }

  // ---- SOFT (forward-backward) EM in BLOCK-FLOATING-POINT — the
  // real SentencePiece E-step with an all-integer arithmetic core:
  // probabilities and path masses are (m, e) pairs, value = m·2^e,
  // m = 0 or m ∈ [2^29, 2^30). Multiply = long multiply + normalize;
  // add = align-exponents (truncating the smaller) + add + normalize;
  // posterior = shift + floor division. Every op is exact integer
  // arithmetic with deterministic truncation, so the distributed sum
  // of per-arc expected counts is exact AND the whole run replays in
  // DuckDB with the same shifts (q_unigram_train_soft). ----

  private val MantBits = 30

  private def bZero: Column = struct(lit(0L).as("m"), lit(0).as("e"))

  private def shl(x: Column, n: Column): Column =
    call_function("shiftleft", x, n)
  private def shr(x: Column, n: Column): Column =
    call_function("shiftright", x, n)

  /** Normalize after a PRODUCT of two normalized mantissas: m1·m2 ∈
    * [2^58, 2^60), so the bit length is 59 or 60 — one comparison
    * instead of a generic bit-length. (The first cut computed bit
    * length via `length(bin(m))`, i.e. built a 60-char binary STRING
    * per multiply in the forward-backward hot path — measured 32 s
    * vs ~2 s per soft-EM round at the 10k-word probe vocab. The
    * branch computes the identical integers, so replica and oracle
    * are unchanged.)
    */
  private def bNormMul(m: Column, e: Column): Column =
    when(m >= lit(1L << 59),
      struct(shr(m, lit(30)).as("m"), (e + 30).as("e")))
      .otherwise(struct(shr(m, lit(29)).as("m"), (e + 29).as("e")))

  /** Normalize after the align-to-max SUM: the max-exponent term
    * contributes ≥ 2^29 and ≤ 16 terms contribute < 2^30 each, so
    * m ∈ [2^29, 2^34) — bit length via a 5-way threshold chain
    * (trainSoft requires maxPieceLen ≤ 16, far above any real
    * subword length).
    */
  private def bNormSum(m: Column, e: Column): Column = {
    val s = when(m >= lit(1L << 33), lit(4))
      .when(m >= lit(1L << 32), lit(3))
      .when(m >= lit(1L << 31), lit(2))
      .when(m >= lit(1L << 30), lit(1))
      .otherwise(lit(0))
    struct(shr(m, s).as("m"), (e + s).as("e"))
  }

  private def bMul(a: Column, b: Column): Column =
    when(a.getField("m") === 0L || b.getField("m") === 0L, bZero)
      .otherwise(bNormMul(a.getField("m") * b.getField("m"),
        a.getField("e") + b.getField("e")))

  /** ORDER-FREE k-ary add of a term list: every non-zero term's
    * mantissa shifts right to the group's maximum exponent (clamp 62
    * — both engines' shifts are only specified below the word size)
    * and the long sum renormalizes once. Align-to-max makes the
    * truncation a function of the term SET, not the visit order —
    * the addition is exactly associative/commutative, so no fold
    * order needs pinning anywhere (a sequential truncating add would
    * be order-dependent, and DuckDB 1.0's list_reduce additionally
    * mis-evaluates repeated accumulator subexpressions — measured,
    * see UnigramOracle). Sum headroom: ≤ maxPieceLen mantissas of
    * < 2^30 each, far under 2^62.
    */
  /** Let-bind an expression as a lambda variable (the 1-element
    * array transform trick): Catalyst re-inlines a captured
    * expression at EVERY reference inside a lambda body — for a term
    * list referenced from an aggregate's per-element lambda that
    * means re-evaluating every bfp multiply once per element
    * (measured: the first soft-EM cut spent ~10× the hard DP's time
    * here). A lambda VARIABLE is a slot read.
    */
  private def bind(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  private def bSum(terms: Column): Column = bind(terms) { ts =>
    // single pass over the BOUND term list: zero terms are excluded
    // from the max by an -inf sentinel and contribute 0 to the sum
    // (their mantissa is 0; the shift clamp keeps the amount legal)
    val sentinel = lit(Int.MinValue)
    val emax = array_max(transform(ts, t =>
      when(t.getField("m") === 0L, sentinel).otherwise(t.getField("e"))))
    val msum = aggregate(ts, lit(0L), (s, x) =>
      s + shr(x.getField("m"),
        greatest(least(emax - x.getField("e"), lit(62)), lit(0))))
    when(emax.isNull || emax === sentinel, bZero)
      .otherwise(bNormSum(msum, emax))
  }

  /** Driver-side bfp of c/ct (0 < c ≤ ct): mantissas truncate to 30
    * bits, quotient = floor((mc·2^29)/mt) then normalized. The SQL
    * twin computes the identical integers.
    */
  private[graft] def bfpDiv(c: Long, ct: Long): (Long, Int) = {
    def norm(m0: Long, e0: Int): (Long, Int) = {
      if (m0 == 0L) (0L, 0)
      else {
        val s = (64 - java.lang.Long.numberOfLeadingZeros(m0)) - MantBits
        (if (s >= 0) m0 >> s else m0 << -s, e0 + s)
      }
    }
    val (mc, ec) = norm(c, 0)
    val (mt, et) = norm(ct, 0)
    norm((mc << (MantBits - 1)) / mt, ec - et - (MantBits - 1))
  }

  private def withArcsSoft(words: DataFrame, wCol: String,
      probs: Map[String, (Long, Int)], maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val pDf = probs.toSeq.map { case (p, (m, e)) => (p, m, e) }
      .toDF("_ug_piece", "_ug_pm", "_ug_pe")
    withArcsBy(words, wCol, pDf,
      "struct<i:int,j:int,pm:bigint,pe:int>",
      Seq(col("_ug_pm").as("pm"), col("_ug_pe").as("pe")), maxPieceLen)
  }

  private def arcProb(a: Column): Column =
    struct(a.getField("pm").as("m"), a.getField("pe").as("e"))

  private def bOne: Column =
    struct(lit(1L << (MantBits - 1)).as("m"), lit(-(MantBits - 1)).as("e"))

  /** Forward masses: array, element p+1 = α[p] as bfp struct (total
    * probability mass of all segmentations of the prefix ending at
    * p) — the position's incoming-arc terms summed with the
    * order-free [[bSum]].
    */
  private def alphaExpr(w: Column, arcs: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(bOne),
      (acc, i) => concat(acc, array(
        bSum(transform(
          filter(arcs, a => a.getField("i") === i),
          a => bMul(element_at(acc, a.getField("j") + 1), arcProb(a)))))))

  /** Backward masses, built end-first: element m = β[n−m+1], so β[i]
    * sits at index n−i+1.
    */
  private def betaExpr(w: Column, arcs: Column): Column = {
    val n = length(w)
    aggregate(
      sequence(lit(1), n),
      array(bOne),
      (acc, k) => {
        val p = n - k
        concat(acc, array(
          bSum(transform(
            filter(arcs, a => a.getField("j") === p),
            a => bMul(arcProb(a), element_at(acc, n - a.getField("i") + 1))))))
      })
  }

  /** Per-arc posterior mass, quantized to [[SoftScale]] units:
    * q = floor( (α[j]·p·β[i] / Z) · 2^20 ) via shift-and-divide on
    * the bfp pair — num = (α[j]⊗p)⊗β[i], Z = α[n], t = e_num − e_Z
    * + 20, q = num.m·2^t / Z.m with the shift clamped at 33 (q ≤ ~2^21
    * by posterior ≤ 1, so the clamp is unreachable headroom, and
    * 2^30 << 33 stays in-range on both engines). Unsegmentable words
    * (Z = 0) contribute zero.
    */
  private def expectedArcCounts(w: Column, arcs: Column,
      alpha: Column, beta: Column): Column = {
    val n = length(w)
    val z = element_at(alpha, n + 1)
    transform(arcs, a =>
      // num is referenced four times in the quantization formula —
      // let-bind it (see [[bind]]) so the nested bfp multiplies run
      // once per arc, not once per reference
      bind(bMul(bMul(element_at(alpha, a.getField("j") + 1),
        arcProb(a)), element_at(beta, n - a.getField("i") + 1))) { num =>
        val t = (num.getField("e") - z.getField("e") + 20).cast("int")
        val q = when(num.getField("m") === 0L || z.getField("m") === 0L, lit(0L))
          .when(t >= 0,
            call_function("div", shl(num.getField("m"), least(t, lit(33))),
              z.getField("m")))
          .when(-t > 33, lit(0L))
          .otherwise(call_function("div", num.getField("m"),
            shl(z.getField("m"), -t)))
        struct(
          w.substr(a.getField("j") + 1, a.getField("i") - a.getField("j"))
            .as("piece"),
          q.as("q"))
      })
  }

  /** [[train]] with the FULL (soft) EM E-step: expected piece counts
    * over ALL segmentations via forward-backward — the actual
    * SentencePiece update rule (Kudo 2018, §3.2) — in the
    * block-floating-point integer arithmetic described on the
    * object: no floats anywhere, so the run is hash-oracle-exact.
    * Same seeding, same gradual prune, same Laplace smoothing (in
    * [[SoftScale]] units), same total orders; the per-round
    * distributed work is the same arc join plus two more HOF passes
    * (α, β) over each word's arcs. Counts are returned in 2^20
    * units; qlp is the quantized log2-prob of the final counts.
    */
  def trainSoft(docs: DataFrame, textCol: String, vocabSize: Int,
      iters: Int, maxPieceLen: Int = 6,
      seedMultiplier: Int = 4): Seq[(String, Long, Long)] = {
    require(vocabSize > 0 && iters > 0 && maxPieceLen >= 2)
    require(maxPieceLen <= 16,
      "bNormSum's mantissa headroom assumes <= 16 arcs per position")
    val words = wordTable(docs, textCol).localCheckpoint()
    val (charSeeds, topMulti) =
      seedCandidates(words, maxPieceLen, vocabSize, seedMultiplier)
    val nTarget = math.max(0, vocabSize - charSeeds.length)
    var counts: Map[String, Long] = (charSeeds ++ topMulti)
      .map { case (p, c) => p -> c * SoftScale }.toMap
    def probs(m: Map[String, Long]): Map[String, (Long, Int)] = {
      val adj = m.map { case (p, c) =>
        p -> (if (p.length == 1) c + SoftScale else c) }
      val total = adj.values.sum
      adj.map { case (p, c) => p -> bfpDiv(c, total) }
    }
    for (round <- 1 to iters) {
      val seg = withArcsSoft(words, "w", probs(counts), maxPieceLen)
        .withColumn("_ug_alpha", alphaExpr(col("w"), col("_ug_arcs")))
        .withColumn("_ug_beta", betaExpr(col("w"), col("_ug_arcs")))
        .select(col("wf"), explode(expectedArcCounts(col("w"),
          col("_ug_arcs"), col("_ug_alpha"), col("_ug_beta"))).as("pq"))
        .select(col("pq.piece").as("piece"),
          (col("pq.q") * col("wf")).as("qw"))
        .groupBy("piece").agg(sum(col("qw")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val chars = counts.keySet.filter(_.length == 1)
        .map(p => p -> seg.getOrElse(p, 0L))
      val multisNow = counts.keySet.filter(_.length > 1)
        .map(p => p -> seg.getOrElse(p, 0L)).filter(_._2 > 0L).toSeq
      val keep = math.max(nTarget,
        if (round == iters) nTarget else (multisNow.size * 6) / 10)
      counts = (chars ++
        multisNow.sortWith(byCountDescPieceAsc).take(keep)).toMap
    }
    val lp = qlogProbs(counts, SoftScale)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortWith((a, b) => byCountDescPieceAsc((a._1, a._2), (b._1, b._2)))
  }

  /** Per-token arc list built from a MAP LITERAL — the inline-lambda
    * encode path, where no join is possible. Linear map scan per
    * lookup: fine for tests and small models; corpus-scale encoding
    * goes through [[encodeDocs]]'s join instead.
    */
  private def arcsFromMap(w: Column, lp: Column, maxPieceLen: Int): Column =
    filter(flatten(
      transform(sequence(lit(1), length(w)), i =>
        transform(sequence(greatest(lit(0), i - maxPieceLen), i - 1), j =>
          struct(i.as("i"), j.as("j"),
            element_at(lp, w.substr(j + 1, i - j)).as("lp"))))),
      a => a.getField("lp").isNotNull)

  /** Column-level application of a trained model (quantized scores):
    * per token, its Viterbi segmentation — `array<array<string>>`,
    * the [[TextOps.bpeEncode]] output contract, as ONE expression.
    * Carries the model as a map literal whose lookups are linear
    * scans (and re-inlines the DP in backtracking — lambdas can't
    * materialize columns), so this is the SMALL-MODEL face; the
    * corpus-scale face is [[encodeDocs]], whose model lookup is the
    * same broadcast join [[segmented]] uses.
    */
  def encode(text: Column, model: Seq[(String, Long)],
      maxPieceLen: Int): Column = {
    val lpLit = typedLit(model.toMap)
    transform(TextOps.tokens(text), tok =>
      piecesExpr(tok, dpExpr(tok, arcsFromMap(tok, lpLit, maxPieceLen))))
  }

  /** Corpus-scale encode: every document's tokens segmented under the
    * trained model — `(idCol, pieces: array<array<string>>)`, the
    * [[encode]] output reached the scale-shaped way: posexplode
    * tokens (order preserved through the position), segment only the
    * DISTINCT tokens ([[segmented]]'s broadcast-join Viterbi — the
    * Zipf dedup means the DP runs per vocabulary word, not per
    * occurrence), then one keyed agg re-assembles documents in token
    * order. A token the model cannot cover keeps its unsegmentable
    * prefix whole (the [[segmented]] fallback). Token-less documents
    * yield an empty pieces array.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      model: Seq[(String, Long)], maxPieceLen: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("_ug_pos", "_ug_tok")))
    val segs = segmented(
        toks.select(col("_ug_tok").as("w")).distinct(), "w",
        model.toMap, maxPieceLen)
      .select(col("w").as("_ug_tok"), col("_ug_pieces"))
    val perDoc = toks.join(segs, Seq("_ug_tok"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("_ug_pos"), col("_ug_pieces")))).as("pw"))
      .select(col(idCol),
        transform(col("pw"), x => x.getField("_ug_pieces")).as("pieces"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("pieces"),
        array().cast("array<array<string>>")).as("pieces"))
  }
}
