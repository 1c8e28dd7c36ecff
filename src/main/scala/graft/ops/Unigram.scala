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
  * The algorithm, made deterministic (Viterbi hard-EM, the standard
  * tractable variant):
  *  1. SEED: every substring of length ≤ `maxPieceLen` of every
  *     distinct word, frequency-weighted; vocab = ALL single
  *     characters (segmentability guarantee: any word can always be
  *     split char-by-char) + the top multi-character candidates by
  *     (count DESC, piece ASC) — a total order, engine-portable.
  *  2. E-STEP: best segmentation of each distinct word under the
  *     current piece log-probabilities — candidate substrings score
  *     via a BROADCAST HASH JOIN against the piece table (the
  *     distributed model lookup; a map-literal element_at would scan
  *     the whole vocab per lookup), then a per-word Viterbi DP over
  *     the word's own arc list, expressed ENTIRELY in Catalyst
  *     higher-order functions — no UDF. Ties (equal scores) resolve
  *     to the SMALLEST split point — arcs scan in ascending-j order
  *     with a strict `>`, keeping the first maximum — a fixed total
  *     order.
  *  3. M-STEP: piece counts = segmentation occurrences weighted by
  *     word frequency (one keyed agg on the word table); new
  *     log-prob = ln(count / total), computed DRIVER-side with
  *     Math.log and shipped back as literals — within-engine
  *     deterministic, which is the contract (cross-engine ln() ulp
  *     drift is why q_unigram_train is rows-only + spec-pinned, the
  *     BPE precedent, rather than hash-oracled).
  *  4. PRUNE: drop multi-char pieces the Viterbi never used, then
  *     shrink geometrically (keep top `max(target, ⌊0.6·current⌋)`
  *     multi-char pieces per round by (count DESC, piece ASC)) until
  *     the target vocab size — SentencePiece's gradual-prune
  *     schedule, deterministically.
  *
  * Single characters are Laplace-smoothed (+1) so no TRAINING char
  * ever gets probability zero; a char never seen in training has no
  * piece at all, and apply-time segmentation keeps such a token's
  * unsegmentable prefix whole — the deterministic <unk> fallback
  * (see [[segmented]]).
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

  private val Neg = -1.0e18

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
    * bounded to. The selected set is bit-identical (same total
    * order, piece names distinct so the tie-break is total).
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

  /** The Viterbi DP table for word `w` given its ARC LIST (the
    * (i, j, lp) triples of in-vocab substrings, sorted by (i, j) —
    * see [[segmented]] for why arcs instead of a map literal): array
    * (1-indexed, position p at element p+1) of `(s: best score to
    * prefix p, b: split point)`. Nested aggregate: outer over
    * positions, inner over that position's arcs; the ascending-j arc
    * order plus the strict `>` keeps the SMALLEST split point on
    * ties — the documented total order.
    */
  private def dpExpr(w: Column, arcs: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0.0).as("s"), lit(-1).as("b"))),
      (acc, i) => concat(acc, array(
        aggregate(
          filter(arcs, a => a.getField("i") === i),
          struct(lit(Neg).as("s"), lit(-1).as("b")),
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

  /** Best segmentation of every word in `words` under model `lp`:
    * adds `_ug_pieces` (array<string>).
    *
    * The model lookup is a BROADCAST HASH JOIN, not a map literal:
    * `element_at` on a map literal is a LINEAR scan of the map per
    * lookup (O(vocab) each — measured 23 s/EM round at 8k pieces
    * against 10k words before this restructure), so the candidate
    * substrings (`(word, i, j, piece)` arcs — ≤ len·maxPieceLen per
    * word) explode map-side, join the broadcast piece table for O(1)
    * per-arc scoring, and collapse back to one sorted arc list per
    * word. The DP then runs over each word's own arcs. The DP column
    * is materialized before backtracking so it evaluates once per
    * word.
    *
    * A word containing a substring no piece covers (possible only in
    * APPLY data — training seeds every observed char) backtracks to
    * the `-1` sentinel and keeps its unsegmentable prefix WHOLE — the
    * deterministic <unk> fallback.
    */
  /** Attach each word's sorted in-vocab arc list `_ug_arcs`
    * (`array<struct<i,j,lp>>`, sorted by (i, j)) via the broadcast
    * hash join — the shared E-step front half of [[segmented]]
    * (Viterbi) and [[trainSoft]] (forward-backward).
    */
  private def withArcs(words: DataFrame, wCol: String,
      lp: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val lpDf = broadcast(lp.toSeq.toDF("_ug_piece", "_ug_lp"))
    val cand = words.select(col(wCol).as("_ug_w")).distinct()
      .select(col("_ug_w"), explode(flatten(
        transform(sequence(lit(1), length(col("_ug_w"))), i =>
          transform(sequence(greatest(lit(0), i - maxPieceLen), i - 1), j =>
            struct(i.as("i"), j.as("j"),
              col("_ug_w").substr(j + 1, i - j).as("piece")))))).as("a"))
      .select(col("_ug_w"), col("a.i").as("i"), col("a.j").as("j"),
        col("a.piece").as("piece"))
    val arcs = cand.join(lpDf, cand("piece") === lpDf("_ug_piece"))
      .groupBy("_ug_w")
      .agg(array_sort(collect_list(
        struct(col("i"), col("j"), col("_ug_lp").as("lp")))).as("_ug_arcs"))
    words.join(arcs, col(wCol) === col("_ug_w"), "left")
      .drop("_ug_w")
      .withColumn("_ug_arcs", coalesce(col("_ug_arcs"),
        array().cast("array<struct<i:int,j:int,lp:double>>")))
  }

  def segmented(words: DataFrame, wCol: String,
      lp: Map[String, Double], maxPieceLen: Int): DataFrame =
    withArcs(words, wCol, lp, maxPieceLen)
      .withColumn("_ug_dp", dpExpr(col(wCol), col("_ug_arcs")))
      .withColumn("_ug_pieces", piecesExpr(col(wCol), col("_ug_dp")))
      .drop("_ug_dp", "_ug_arcs")

  /** Train the unigram LM: returns the final model as
    * `(piece, count, logp)` rows, count DESC then piece ASC. The
    * model is driver-sized BY DESIGN (it IS the tokenizer artifact,
    * like [[TextOps.bpeTrain]]'s merge list); [[encode]] compiles it
    * back into a projection for corpus-scale application.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      iters: Int, maxPieceLen: Int = 6,
      seedMultiplier: Int = 4): Seq[(String, Long, Double)] = {
    require(vocabSize > 0 && iters > 0 && maxPieceLen >= 2)
    val words = wordTable(docs, textCol).localCheckpoint()
    val (charSeeds, topMulti) =
      seedCandidates(words, maxPieceLen, vocabSize, seedMultiplier)
    val nTarget = math.max(0, vocabSize - charSeeds.length)
    // state: (piece -> count); chars Laplace-smoothed below
    var counts: Map[String, Long] =
      (charSeeds ++ topMulti).map { case (p, c) => p -> c }.toMap
    def logProbs(m: Map[String, Long]): Map[String, Double] = {
      val adj = m.map { case (p, c) =>
        p -> (if (p.length == 1) c + 1L else c) }
      val total = adj.values.sum.toDouble
      adj.map { case (p, c) => p -> Math.log(c / total) }
    }
    for (round <- 1 to iters) {
      val seg = segmented(words, "w", logProbs(counts), maxPieceLen)
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
      val kept = multisNow.sortBy { case (p, c) => (-c, p) }.take(keep)
      counts = (chars ++ kept).toMap
    }
    val lp = logProbs(counts)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortBy { case (p, c, _) => (-c, p) }
  }

  // ---- SOFT (forward-backward) EM — the real SentencePiece E-step,
  // made deterministic by integer-quantizing each arc's expected
  // count before the distributed sum (the kmeans recipe applied to
  // posterior mass; double sums are partition-order-dependent,
  // quantized long sums are exact) ----

  /** Expected-count quantization: one unit = 2^-20 of an occurrence.
    * Σ over a word's arcs of its posterior mass is ≤ len(word), so
    * the rounding error per word is ≤ len·2^-21 occurrences —
    * invisible next to corpus-frequency scales.
    */
  private val SoftScale = 1L << 20

  /** log(e^a + e^b) with the −1e18 sentinel as −∞; max-shifted so it
    * is finite-safe. Evaluation order is fixed by the arc-list fold,
    * so the double result is engine-deterministic (and replicated
    * op-for-op by the plain-Scala spec pin).
    */
  private def lseMerge(a: Column, b: Column): Column =
    when(a === lit(Neg), b).otherwise(when(b === lit(Neg), a)
      .otherwise(greatest(a, b) +
        log(exp(a - greatest(a, b)) + exp(b - greatest(a, b)))))

  /** Forward log-masses: array, element p+1 = logα[p] (total log
    * probability of all segmentations of the prefix ending at p).
    */
  private def alphaExpr(w: Column, arcs: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(lit(0.0)),
      (acc, i) => concat(acc, array(
        aggregate(
          filter(arcs, a => a.getField("i") === i),
          lit(Neg),
          (s, a) => lseMerge(s,
            element_at(acc, a.getField("j") + 1) + a.getField("lp"))))))

  /** Backward log-masses, built end-first: element m = logβ[n−m+1],
    * so logβ[i] sits at index n−i+1 (available when needed — the
    * fold at position p = n−k only references i > p).
    */
  private def betaExpr(w: Column, arcs: Column): Column = {
    val n = length(w)
    aggregate(
      sequence(lit(1), n),
      array(lit(0.0)),
      (acc, k) => {
        val p = n - k
        concat(acc, array(
          aggregate(
            filter(arcs, a => a.getField("j") === p),
            lit(Neg),
            (s, a) => lseMerge(s,
              a.getField("lp") + element_at(acc, n - a.getField("i") + 1)))))
      })
  }

  /** Per-arc posterior mass, quantized: (piece, q) with
    * q = round(exp(α[j] + lp + β[i] − logZ) · 2^20) — a long, so the
    * downstream per-piece sum is exact and order-invariant.
    * Unsegmentable words (logZ = −∞) contribute zero.
    */
  private def expectedArcCounts(w: Column, arcs: Column,
      alpha: Column, beta: Column): Column = {
    val n = length(w)
    val logZ = element_at(alpha, n + 1)
    transform(arcs, a => struct(
      w.substr(a.getField("j") + 1, a.getField("i") - a.getField("j"))
        .as("piece"),
      when(logZ === lit(Neg), lit(0L)).otherwise(
        round(exp(element_at(alpha, a.getField("j") + 1) + a.getField("lp")
          + element_at(beta, n - a.getField("i") + 1) - logZ)
          * lit(SoftScale.toDouble)).cast("long")).as("q")))
  }

  /** [[train]] with the FULL (soft) EM E-step: expected piece counts
    * over ALL segmentations via forward-backward, instead of
    * Viterbi's single best path — the actual SentencePiece update
    * rule (Kudo 2018, §3.2). Same seeding, same gradual prune, same
    * Laplace smoothing (in quantized units), same total orders; the
    * per-round distributed work is the same arc join plus two more
    * HOF passes (α, β) over each word's arcs. Counts are returned in
    * 2^20 units. Determinism: the only double arithmetic (LSE,
    * posterior exp) happens INSIDE one row's fixed-order fold; the
    * cross-row aggregation sums quantized longs. TrainingSpec pins
    * the whole run against an independent plain-Scala
    * forward-backward; the `unigram_soft` probe records the
    * hard-vs-soft model and encode deltas.
    */
  def trainSoft(docs: DataFrame, textCol: String, vocabSize: Int,
      iters: Int, maxPieceLen: Int = 6,
      seedMultiplier: Int = 4): Seq[(String, Long, Double)] = {
    require(vocabSize > 0 && iters > 0 && maxPieceLen >= 2)
    val words = wordTable(docs, textCol).localCheckpoint()
    val (charSeeds, topMulti) =
      seedCandidates(words, maxPieceLen, vocabSize, seedMultiplier)
    val nTarget = math.max(0, vocabSize - charSeeds.length)
    var counts: Map[String, Long] = (charSeeds ++ topMulti)
      .map { case (p, c) => p -> c * SoftScale }.toMap
    def logProbs(m: Map[String, Long]): Map[String, Double] = {
      val adj = m.map { case (p, c) =>
        p -> (if (p.length == 1) c + SoftScale else c) }
      val total = adj.values.sum.toDouble
      adj.map { case (p, c) => p -> Math.log(c / total) }
    }
    for (round <- 1 to iters) {
      val seg = withArcs(words, "w", logProbs(counts), maxPieceLen)
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
        multisNow.sortBy { case (p, c) => (-c, p) }.take(keep)).toMap
    }
    val lp = logProbs(counts)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortBy { case (p, c, _) => (-c, p) }
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

  /** Column-level application of a trained model: per token, its
    * Viterbi segmentation — `array<array<string>>`, the
    * [[TextOps.bpeEncode]] output contract, as ONE expression.
    * Carries the model as a map literal whose lookups are linear
    * scans (and re-inlines the DP in backtracking — lambdas can't
    * materialize columns), so this is the SMALL-MODEL face; the
    * corpus-scale face is [[encodeDocs]], whose model lookup is the
    * same broadcast join [[segmented]] uses.
    */
  def encode(text: Column, model: Seq[(String, Double)],
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
      model: Seq[(String, Double)], maxPieceLen: Int): DataFrame = {
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
