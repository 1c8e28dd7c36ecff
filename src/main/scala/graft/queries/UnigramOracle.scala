package graft.queries

/** DuckDB oracle SQL for the unigram-LM tokenizer trainers
  * ([[graft.ops.Unigram]]) — the ENTIRE multi-round EM run unrolled
  * into CTEs, one block per round, so the driver's hash-compare
  * verifies training end-to-end (the q_quality_train unrolled-GD
  * recipe applied to EM).
  *
  * What makes the unroll possible is that the trainer has no
  * floating-point state: hard-EM arc scores are quantized integer
  * log2s ([[graft.ops.Qlog.qlog2]] — replayed here as a 16-step
  * recursive CTE of IEEE double squarings, bit-identical across
  * engines), and soft-EM masses are block-floating-point integer
  * pairs (30-bit mantissas; multiply/align-add/normalize/posterior
  * are shifts and integer division — replayed verbatim). The
  * per-word DPs (Viterbi; forward-backward) are recursive CTEs over
  * positions carrying the DP table as a LIST column; fold order is
  * the engines' shared ascending-(i, j) arc order, and string
  * tie-breaks are binary/UTF-8 collation on both sides.
  *
  * All SQL is GENERATED (iters/vocab/piece-length parameterized) —
  * the catalog entries pin the same constants the Spark faces use.
  */
object UnigramOracle {

  private val NegQ = "-2305843009213693952" // -(1L << 61), the hard DP −∞
  private val S2 = 1L << 20                 // soft-count occurrence unit

  /** Force every non-recursive CTE to MATERIALIZED: DuckDB inlines
    * CTEs by default, and a CTE referenced inside a recursive term
    * (arcs in the DP step, fin in the backtrack step) would re-expand
    * its whole upstream chain — including the parquet scan — once per
    * recursion step per reference, compounding across rounds
    * (measured: >20k open file handles before the fix). Recursive
    * CTEs (the only ones declared with a column list, `name(cols)
    * AS`) cannot be materialized and are left alone.
    */
  private def materialized(sql: String): String =
    sql.replaceAll("(\\b[a-z][a-z0-9_]*) AS \\(", "$1 AS MATERIALIZED (")

  /** Shared corpus front: tokens → distinct-word freqs → candidate
    * (end, start, piece) arcs (doubling as the seed substring
    * universe) → seed vocab (`vocab0`). `unit` scales seed counts
    * (1 hard, 2^20 soft).
    */
  private def prefix(vocabSize: Int, maxPieceLen: Int, seedMult: Int,
      unit: Long): String =
    s"""toks AS (SELECT doc_id,
          list_filter(string_split(trim(text), ' '), x -> x <> '') AS ts
        FROM documents),
      words AS (SELECT w, CAST(count(*) AS BIGINT) AS wf
        FROM (SELECT unnest(ts) AS w FROM toks) u GROUP BY w),
      cand AS (SELECT words.w AS w, i, j, substr(words.w, j+1, i-j) AS piece
        FROM words,
          unnest(range(1, length(words.w)+1)) t1(i),
          unnest(range(0, length(words.w))) t2(j)
        WHERE j < i AND i - j <= $maxPieceLen),
      subs AS (SELECT c.piece, CAST(sum(words.wf) AS BIGINT) AS cnt
        FROM cand c JOIN words ON words.w = c.w GROUP BY c.piece),
      chs AS (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
      ntv AS (SELECT greatest(0, $vocabSize - (SELECT count(*) FROM chs)) AS v),
      topm AS (SELECT piece, cnt FROM (SELECT piece, cnt,
          row_number() OVER (ORDER BY cnt DESC, piece) AS rk
          FROM subs WHERE length(piece) > 1) z
        WHERE rk <= (SELECT v FROM ntv) * $seedMult),
      vocab0 AS (SELECT piece, cnt * $unit AS cnt FROM chs
        UNION ALL SELECT piece, cnt * $unit AS cnt FROM topm)"""

  /** Laplace-adjusted counts + the [[graft.ops.Qlog]] recursive CTE
    * over this round's count values (and their total): emits
    * adj$r/tot$r/ql$r.
    */
  private def qlogBlock(r: Int, vocabPrev: String, unit: Long): String =
    s"""adj$r AS (SELECT piece, cnt +
          CASE WHEN length(piece) = 1 THEN $unit ELSE 0 END AS ca
        FROM $vocabPrev),
      tot$r AS (SELECT CAST(sum(ca) AS BIGINT) AS tv FROM adj$r),
      qn$r AS (SELECT DISTINCT c FROM (SELECT ca AS c FROM adj$r
        UNION ALL SELECT tv AS c FROM tot$r) u),
      qi$r(c, st, x, acc) AS (
        SELECT c, 0,
          CAST(c AS DOUBLE)/CAST((1::BIGINT << (length(bin(c))-1)) AS DOUBLE),
          CAST(length(bin(c))-1 AS BIGINT) FROM qn$r
        UNION ALL SELECT c, st+1,
          CASE WHEN x*x >= 2 THEN x*x/2 ELSE x*x END,
          acc*2 + CASE WHEN x*x >= 2 THEN 1 ELSE 0 END
        FROM qi$r WHERE st < 16),
      ql$r AS (SELECT c, acc AS ql FROM qi$r WHERE st = 16)"""

  /** Hard-EM round-r model: qlp = qlog2(c_adj) − qlog2(total). */
  private def hardModel(r: Int, vocabPrev: String, unit: Long): String =
    s"""${qlogBlock(r, vocabPrev, unit)},
      model$r AS (SELECT a.piece, qa.ql - qt.ql AS qlp
        FROM adj$r a JOIN ql$r qa ON qa.c = a.ca
        CROSS JOIN (SELECT q.ql AS ql FROM ql$r q
          JOIN tot$r t ON q.c = t.tv) qt)"""

  /** Viterbi DP + backtrack for round r over model$r: emits
    * arcs$r/dp$r/fin$r/bt$r; terminal bt rows (p ≤ 0) carry each
    * word's piece list. Mirrors [[graft.ops.Unigram]]'s dpExpr
    * semantics exactly: max candidate wins only above the −∞
    * sentinel, ties keep the smallest split point, an unsegmentable
    * prefix (backpointer −1; unreachable in training) is kept whole.
    */
  private def viterbiBlock(r: Int): String = {
    val mx = s"list_max(list_transform(list_filter(a.arcs, " +
      s"x -> x.i = d.p+1), x -> d.sl[x.j+1] + x.lp))"
    s"""arcs$r AS (SELECT c.w,
          list(struct_pack(i := c.i, j := c.j, lp := m.qlp)
            ORDER BY c.i, c.j) AS arcs
        FROM cand c JOIN model$r m ON m.piece = c.piece GROUP BY c.w),
      dp$r(w, n, p, sl, bl) AS (
        SELECT w, length(w), 0, [0::BIGINT], [CAST(-1 AS BIGINT)] FROM words
        UNION ALL
        SELECT d.w, d.n, d.p+1,
          list_append(d.sl, CASE WHEN $mx IS NULL OR $mx <= $NegQ
            THEN $NegQ ELSE $mx END),
          list_append(d.bl, CASE WHEN $mx IS NULL OR $mx <= $NegQ
            THEN CAST(-1 AS BIGINT)
            ELSE list_min(list_transform(list_filter(a.arcs,
              x -> x.i = d.p+1 AND d.sl[x.j+1] + x.lp = $mx), x -> x.j)) END)
        FROM dp$r d JOIN arcs$r a ON a.w = d.w WHERE d.p < d.n),
      fin$r AS (SELECT w, n, sl, bl FROM dp$r WHERE p = n),
      bt$r(w, p, ps) AS (
        SELECT w, n, []::VARCHAR[] FROM fin$r
        UNION ALL
        SELECT b.w, f.bl[b.p+1],
          list_prepend(CASE WHEN f.bl[b.p+1] = -1 THEN substr(b.w, 1, b.p)
            ELSE substr(b.w, f.bl[b.p+1]+1, b.p - f.bl[b.p+1]) END, b.ps)
        FROM bt$r b JOIN fin$r f ON f.w = b.w WHERE b.p > 0)"""
  }

  /** Gradual prune for round r over this round's mstep$r expected
    * counts (hard: Viterbi occurrences; soft: quantized posterior
    * mass): emits vocab$r.
    */
  private def pruneBlock(r: Int, isLast: Boolean): String =
    s"""chars$r AS (SELECT v.piece, coalesce(m.cnt, 0::BIGINT) AS cnt
        FROM vocab${r - 1} v LEFT JOIN mstep$r m ON m.piece = v.piece
        WHERE length(v.piece) = 1),
      multi0$r AS (SELECT v.piece, m.cnt AS cnt
        FROM vocab${r - 1} v JOIN mstep$r m ON m.piece = v.piece
        WHERE length(v.piece) > 1 AND m.cnt > 0),
      keep$r AS (SELECT CASE WHEN ${if (isLast) "TRUE" else "FALSE"}
          THEN (SELECT v FROM ntv)
          ELSE greatest((SELECT v FROM ntv),
            (SELECT count(*) FROM multi0$r) * 6 // 10) END AS k),
      multi$r AS (SELECT piece, cnt FROM (SELECT piece, cnt,
          row_number() OVER (ORDER BY cnt DESC, piece) AS rk FROM multi0$r) z
        WHERE rk <= (SELECT k FROM keep$r)),
      vocab$r AS (SELECT piece, cnt FROM chars$r
        UNION ALL SELECT piece, cnt FROM multi$r)"""

  private def hardMstep(r: Int): String =
    s"""mstep$r AS (SELECT s.piece, CAST(sum(words.wf) AS BIGINT) AS cnt
        FROM (SELECT w, unnest(ps) AS piece FROM bt$r WHERE p <= 0) s
        JOIN words ON words.w = s.w GROUP BY s.piece)"""

  /** Full hard-EM (Viterbi) training oracle: (piece, cnt, qlp). */
  def hardSql(vocabSize: Int, iters: Int, maxPieceLen: Int,
      seedMult: Int = 4): String = materialized {
    val rounds = (1 to iters).map { r =>
      s"""${hardModel(r, s"vocab${r - 1}", 1L)},
      ${viterbiBlock(r)},
      ${hardMstep(r)},
      ${pruneBlock(r, r == iters)}"""
    }.mkString(",\n      ")
    val f = iters + 1
    s"""WITH RECURSIVE ${prefix(vocabSize, maxPieceLen, seedMult, 1L)},
      $rounds,
      ${qlogBlock(f, s"vocab$iters", 1L)}
      SELECT v.piece AS piece, v.cnt AS cnt, qa.ql - qt.ql AS qlp
      FROM vocab$iters v JOIN adj$f a ON a.piece = v.piece
      JOIN ql$f qa ON qa.c = a.ca
      CROSS JOIN (SELECT q.ql AS ql FROM ql$f q JOIN tot$f t ON q.c = t.tv) qt
      ORDER BY cnt DESC, piece"""
  }

  // ---- soft (forward-backward, block-floating-point) blocks ----

  /** Textual bfp macros over SQL subexpressions. NORM repeats its
    * mantissa argument, so callers keep arguments to short column
    * references; the staged posterior CTEs exist for exactly that
    * reason.
    */
  private def norm(m: String, e: String): String =
    s"""CASE WHEN ($m) = 0 THEN struct_pack(m := 0::BIGINT, e := 0::BIGINT)
       ELSE struct_pack(
         m := CASE WHEN length(bin($m)) - 30 > 0 THEN ($m) >> (length(bin($m)) - 30)
                   WHEN length(bin($m)) - 30 < 0 THEN ($m) << -(length(bin($m)) - 30)
                   ELSE ($m) END,
         e := ($e) + length(bin($m)) - 30) END"""

  private def bmul(a: String, b: String): String =
    s"""CASE WHEN ($a).m = 0 OR ($b).m = 0
       THEN struct_pack(m := 0::BIGINT, e := 0::BIGINT)
       ELSE ${norm(s"($a).m * ($b).m", s"($a).e + ($b).e")} END"""

  private val bZero = "struct_pack(m := 0::BIGINT, e := 0::BIGINT)"
  private val bOne = "struct_pack(m := 536870912::BIGINT, e := -29::BIGINT)"

  /** Soft round-r model: piece probability c_adj/total as a
    * normalized (pm, pe) mantissa/exponent pair — floor divisions
    * and shifts only.
    */
  private def softModel(r: Int, vocabPrev: String): String =
    s"""adj$r AS (SELECT piece, cnt +
          CASE WHEN length(piece) = 1 THEN $S2 ELSE 0 END AS ca
        FROM $vocabPrev),
      tot$r AS (SELECT CAST(sum(ca) AS BIGINT) AS tv FROM adj$r),
      mn$r AS (SELECT piece,
          CASE WHEN sc > 0 THEN ca >> sc WHEN sc < 0 THEN ca << -sc
               ELSE ca END AS mc, sc AS ec
        FROM (SELECT piece, ca, length(bin(ca)) - 30 AS sc FROM adj$r) z),
      tn$r AS (SELECT
          CASE WHEN st > 0 THEN tv >> st WHEN st < 0 THEN tv << -st
               ELSE tv END AS mt, st AS et
        FROM (SELECT tv, length(bin(tv)) - 30 AS st FROM tot$r) z),
      md$r AS (SELECT piece, (mc << 29) // mt AS m0, ec - et - 29 AS e0
        FROM mn$r CROSS JOIN tn$r),
      model$r AS (SELECT piece,
          CASE WHEN s0 > 0 THEN m0 >> s0 WHEN s0 < 0 THEN m0 << -s0
               ELSE m0 END AS pm, e0 + s0 AS pe
        FROM (SELECT piece, m0, e0, length(bin(m0)) - 30 AS s0 FROM md$r) z)"""

  /** Order-free k-ary bfp sum of a term-list SQL expression: align
    * every non-zero term's mantissa to the group's max exponent, sum
    * as longs, renormalize once ([[graft.ops.Unigram]]'s bSum). No
    * sequential fold — DuckDB 1.0's list_reduce mis-evaluates
    * repeated accumulator subexpressions (measured: the exponent
    * field of a struct result computed from a STALE accumulator while
    * the mantissa used the current one, thread-count-dependent), and
    * align-to-max needs none: list_max + list_sum are order-blind.
    */
  private def bsum(terms: String): String = {
    val zf = s"list_filter($terms, t -> t.m <> 0)"
    val emax = s"list_max(list_transform($zf, t -> t.e))"
    val msum = s"CAST(list_sum(list_transform($zf, " +
      s"t -> t.m >> least($emax - t.e, 62))) AS BIGINT)"
    s"""CASE WHEN len($zf) = 0 THEN $bZero ELSE ${norm(msum, emax)} END"""
  }

  /** Forward-backward + staged posterior for round r: emits
    * arcs$r/alpha$r/beta$r/…/mstep$r (expected counts in 2^20
    * units). Per-position sums are the order-free [[bsum]] over the
    * position's arc terms.
    */
  private def softEstep(r: Int): String = {
    val alphaTerm = bmul("d.al[x.j+1]", "struct_pack(m := x.pm, e := x.pe)")
    val betaTerm = bmul("struct_pack(m := x.pm, e := x.pe)", "d.be[d.n - x.i + 1]")
    s"""arcs$r AS (SELECT c.w,
          list(struct_pack(i := c.i, j := c.j, pm := m.pm, pe := m.pe)
            ORDER BY c.i, c.j) AS arcs
        FROM cand c JOIN model$r m ON m.piece = c.piece GROUP BY c.w),
      alpha$r(w, n, p, al) AS (
        SELECT w, length(w), 0, [$bOne] FROM words
        UNION ALL
        SELECT d.w, d.n, d.p+1, list_append(d.al,
          ${bsum(s"list_transform(list_filter(a.arcs, x -> x.i = d.p+1), x -> $alphaTerm)")})
        FROM alpha$r d JOIN arcs$r a ON a.w = d.w WHERE d.p < d.n),
      beta$r(w, n, k, be) AS (
        SELECT w, length(w), 0, [$bOne] FROM words
        UNION ALL
        SELECT d.w, d.n, d.k+1, list_append(d.be,
          ${bsum(s"list_transform(list_filter(a.arcs, x -> x.j = d.n - (d.k+1)), x -> $betaTerm)")})
        FROM beta$r d JOIN arcs$r a ON a.w = d.w WHERE d.k < d.n),
      px$r AS (SELECT u.w, f.n, (u.x).i AS i, (u.x).j AS j,
          (u.x).pm AS pm, (u.x).pe AS pe, f.al, bb.be
        FROM (SELECT w, unnest(arcs) AS x FROM arcs$r) u
        JOIN (SELECT w, n, al FROM alpha$r WHERE p = n) f ON f.w = u.w
        JOIN (SELECT w, be FROM beta$r WHERE k = n) bb ON bb.w = u.w),
      p1$r AS (SELECT w, n, i, j, pm, pe, al, be,
          al[j+1].m AS am, al[j+1].e AS ae FROM px$r),
      p2$r AS (SELECT w, n, i, j, al, be,
          CASE WHEN am = 0 OR pm = 0 THEN 0 ELSE am * pm END AS um0,
          ae + pe AS ue0 FROM p1$r),
      p3$r AS (SELECT w, n, i, j, al, be,
          CASE WHEN um0 = 0 THEN 0 WHEN s1 > 0 THEN um0 >> s1
               WHEN s1 < 0 THEN um0 << -s1 ELSE um0 END AS um,
          CASE WHEN um0 = 0 THEN 0 ELSE ue0 + s1 END AS ue
        FROM (SELECT *, length(bin(um0)) - 30 AS s1 FROM p2$r) z),
      p4$r AS (SELECT w, n, i, j, al, um, ue,
          be[n - i + 1].m AS bm, be[n - i + 1].e AS bex FROM p3$r),
      p5$r AS (SELECT w, n, i, j, al,
          CASE WHEN vm0 = 0 THEN 0 WHEN s2 > 0 THEN vm0 >> s2
               WHEN s2 < 0 THEN vm0 << -s2 ELSE vm0 END AS vm,
          CASE WHEN vm0 = 0 THEN 0 ELSE ve0 + s2 END AS ve
        FROM (SELECT *, length(bin(vm0)) - 30 AS s2 FROM
          (SELECT w, n, i, j, al,
            CASE WHEN um = 0 OR bm = 0 THEN 0 ELSE um * bm END AS vm0,
            ue + bex AS ve0 FROM p4$r) y) z),
      p6$r AS (SELECT w, substr(w, j+1, i-j) AS piece,
          CASE WHEN vm = 0 OR zm = 0 THEN 0
               WHEN t >= 0 THEN (vm << least(t, 33)) // zm
               WHEN -t > 33 THEN 0
               ELSE vm // (zm << -t) END AS q
        FROM (SELECT *, al[n+1].m AS zm,
            ve - al[n+1].e + 20 AS t FROM p5$r) z),
      mstep$r AS (SELECT p.piece, CAST(sum(p.q * words.wf) AS BIGINT) AS cnt
        FROM p6$r p JOIN words ON words.w = p.w GROUP BY p.piece)"""
  }

  /** Full soft-EM training oracle: (piece, cnt, qlp), cnt in 2^20
    * units, qlp the quantized log2-prob of the final counts.
    */
  def softSql(vocabSize: Int, iters: Int, maxPieceLen: Int,
      seedMult: Int = 4): String = materialized {
    val rounds = (1 to iters).map { r =>
      s"""${softModel(r, s"vocab${r - 1}")},
      ${softEstep(r)},
      ${pruneBlock(r, r == iters)}"""
    }.mkString(",\n      ")
    val f = iters + 1
    s"""WITH RECURSIVE ${prefix(vocabSize, maxPieceLen, seedMult, S2)},
      $rounds,
      ${qlogBlock(f, s"vocab$iters", S2)}
      SELECT v.piece AS piece, v.cnt AS cnt, qa.ql - qt.ql AS qlp
      FROM vocab$iters v JOIN adj$f a ON a.piece = v.piece
      JOIN ql$f qa ON qa.c = a.ca
      CROSS JOIN (SELECT q.ql AS ql FROM ql$f q JOIN tot$f t ON q.c = t.tv) qt
      ORDER BY cnt DESC, piece"""
  }

  /** Corpus-encode oracle: replays hard training, scores the final
    * model, segments every distinct word once more (round iters+1's
    * Viterbi block), then reassembles documents in token order —
    * (doc_id, n_words, n_pieces, first_word_pieces), the
    * q_unigram_encode face.
    */
  def encodeSql(vocabSize: Int, iters: Int, maxPieceLen: Int,
      seedMult: Int = 4): String = materialized {
    val rounds = (1 to iters).map { r =>
      s"""${hardModel(r, s"vocab${r - 1}", 1L)},
      ${viterbiBlock(r)},
      ${hardMstep(r)},
      ${pruneBlock(r, r == iters)}"""
    }.mkString(",\n      ")
    val f = iters + 1
    s"""WITH RECURSIVE ${prefix(vocabSize, maxPieceLen, seedMult, 1L)},
      $rounds,
      ${hardModel(f, s"vocab$iters", 1L)},
      ${viterbiBlock(f)},
      seg AS (SELECT w, ps FROM bt$f WHERE p <= 0),
      docpos AS (SELECT t.doc_id, i AS pos, t.ts[i] AS tok
        FROM toks t, unnest(range(1, len(t.ts)+1)) u(i)),
      perdoc AS (SELECT d.doc_id,
          CAST(count(*) AS BIGINT) AS nw,
          CAST(sum(len(s.ps)) AS BIGINT) AS np
        FROM docpos d JOIN seg s ON s.w = d.tok GROUP BY d.doc_id),
      firstw AS (SELECT d.doc_id, array_to_string(s.ps, '|') AS fp
        FROM docpos d JOIN seg s ON s.w = d.tok WHERE d.pos = 1)
      SELECT doc.doc_id AS doc_id,
        coalesce(p.nw, 0::BIGINT) AS n_words,
        coalesce(p.np, 0::BIGINT) AS n_pieces,
        f2.fp AS first_word_pieces
      FROM (SELECT doc_id FROM documents) doc
      LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
      LEFT JOIN firstw f2 ON f2.doc_id = doc.doc_id
      ORDER BY doc_id"""
  }
}
