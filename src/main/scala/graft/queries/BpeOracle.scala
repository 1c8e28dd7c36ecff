package graft.queries

/** DuckDB oracle SQL for BPE tokenizer training/encoding
  * ([[graft.ops.TextOps.bpeTrain]] family) — the merge loop unrolled
  * into CTEs, one block per merge round, so the driver hash-verifies
  * the trainers end-to-end (the trainers were always all-integer;
  * the missing piece was the unroll).
  *
  * The only non-trivial translation is the greedy left-to-right
  * single-pass merge application (`applyMerge`'s fold). Set-at-a-time
  * equivalent: mark every position whose (sym, next sym) equals the
  * merge pair, group CONSECUTIVE marks into runs (consecutive marks
  * can only occur when a = b), and merge the positions at EVEN
  * offsets within each run — exactly the fold's "a merged pair
  * cannot re-merge with the next input symbol" semantics ("aaa"
  * under (a,a) → [aa, a]). Positions directly after a merged one are
  * consumed; the symbol list reassembles ordered by position.
  *
  * The batched trainer's per-round greedy disjoint-accept scan (top
  * candidates in (cnt DESC, pair ASC) order, skip any candidate
  * touching a used symbol, cap at the round's room) is a recursive
  * CTE over candidate rank carrying the used-symbol and accepted
  * lists. Rounds are unrolled to the worst case (one accept per
  * round); completed rounds degrade to no-ops via the room guard.
  *
  * Every non-recursive CTE is MATERIALIZED (the [[UnigramOracle]]
  * lesson: DuckDB inlines CTEs, and chained per-round references
  * would re-expand the whole upstream pipeline combinatorially).
  */
object BpeOracle {

  private def materialized(sql: String): String =
    sql.replaceAll("(\\b[a-z][a-z0-9_]*) AS \\(", "$1 AS MATERIALIZED (")

  /** Corpus front: distinct-word freqs + initial char-symbol lists. */
  private val prefix: String =
    s"""toks AS (SELECT doc_id,
          list_filter(string_split(trim(text), ' '), x -> x <> '') AS ts
        FROM documents),
      words AS (SELECT w, CAST(count(*) AS BIGINT) AS wf
        FROM (SELECT unnest(ts) AS w FROM toks) u GROUP BY w),
      syms0 AS (SELECT w,
          list_transform(range(1, length(w)+1), i -> substr(w, i, 1)) AS syms
        FROM words)"""

  /** Position table of a symbol list: (w, i, sy, sy2) with sy2 NULL
    * at the last position.
    */
  private def posBlock(tag: String, prevSyms: String): String =
    s"""pos$tag AS (SELECT s.w, i, s.syms[i] AS sy, s.syms[i+1] AS sy2
        FROM $prevSyms s, unnest(range(1, len(s.syms)+1)) t(i))"""

  /** Apply ONE merge (a/b given as scalar-subquery SQL) to pos$tag,
    * emitting syms$out — the run-parity formulation above. A NULL
    * merge (exhausted best/batch slot) marks nothing: identity.
    */
  private def applyBlock(tag: String, aSql: String, bSql: String,
      out: String): String =
    s"""m$tag AS (SELECT p.w, p.i, p.sy,
          CASE WHEN p.sy = ($aSql) AND p.sy2 = ($bSql)
            THEN 1 ELSE 0 END AS mt
        FROM pos$tag p),
      rn$tag AS (SELECT *, CASE WHEN mt = 1
          THEN i - row_number() OVER (PARTITION BY w, mt ORDER BY i) END AS rid
        FROM m$tag),
      mg$tag AS (SELECT *, CASE WHEN mt = 1
          AND (i - min(i) OVER (PARTITION BY w, rid)) % 2 = 0
          THEN 1 ELSE 0 END AS mg
        FROM rn$tag),
      dr$tag AS (SELECT *,
          coalesce(lag(mg) OVER (PARTITION BY w ORDER BY i), 0) AS pm
        FROM mg$tag),
      $out AS (SELECT w,
          list(CASE WHEN mg = 1 THEN ($aSql) || ($bSql) ELSE sy END
            ORDER BY i) AS syms
        FROM dr$tag WHERE pm = 0 GROUP BY w)"""

  /** Weighted adjacent-pair counts of syms$prev's position table. */
  private def pairsBlock(tag: String): String =
    s"""pairs$tag AS (SELECT sy || ' ' || sy2 AS pair,
          CAST(sum(words.wf) AS BIGINT) AS cnt
        FROM pos$tag p JOIN words ON words.w = p.w
        WHERE sy2 IS NOT NULL GROUP BY pair)"""

  /** One EXACT merge round: argmax pair (cnt DESC, pair ASC), apply. */
  private def exactRound(r: Int): String =
    s"""${posBlock(s"$r", s"syms${r - 1}")},
      ${pairsBlock(s"$r")},
      best$r AS (SELECT pair, cnt, split_part(pair, ' ', 1) AS a,
          split_part(pair, ' ', 2) AS b
        FROM pairs$r ORDER BY cnt DESC, pair LIMIT 1),
      ${applyBlock(s"$r", s"SELECT a FROM best$r", s"SELECT b FROM best$r",
        s"syms$r")}"""

  /** Exact-BPE training oracle: (merge_rank, pair, cnt). */
  def trainSql(nMerges: Int): String = materialized {
    val rounds = (1 to nMerges).map(exactRound).mkString(",\n      ")
    val out = (1 to nMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, pair, cnt FROM best$r")
      .mkString("\n        UNION ALL ")
    s"""WITH RECURSIVE $prefix,
      $rounds
      SELECT merge_rank, pair, cnt FROM (
        $out) u
      ORDER BY merge_rank"""
  }

  /** One BATCHED round r: rank 4·batchSize candidates, greedy-accept
    * pairwise-disjoint ones up to the round's room (recursive scan
    * carrying used/accepted), fall back to the plain argmax if every
    * candidate conflicted, then apply the batch sequentially through
    * `batchSize` guarded apply blocks.
    */
  private def batchedRound(r: Int, nMerges: Int, batchSize: Int): String = {
    val over = batchSize * 4
    val dn =
      if (r == 1) "SELECT CAST(0 AS BIGINT) AS dn"
      else s"SELECT (SELECT dn FROM dn${r - 1}) + " +
        s"(SELECT CAST(len(batch) AS BIGINT) FROM bf${r - 1}) AS dn"
    val accept = s"len(d.batch) < (SELECT rm FROM room$r) " +
      s"AND NOT list_contains(d.used, t.a) AND NOT list_contains(d.used, t.b)"
    val applies = (1 to batchSize).map { k =>
      val prev = if (k == 1) s"syms${r - 1}" else s"bs${r}x${k - 1}"
      val out = if (k == batchSize) s"syms$r" else s"bs${r}x$k"
      s"""${posBlock(s"${r}x$k", prev)},
      ${applyBlock(s"${r}x$k",
        s"SELECT batch[$k].a FROM bf$r", s"SELECT batch[$k].b FROM bf$r",
        out)}"""
    }.mkString(",\n      ")
    s"""${posBlock(s"p$r", s"syms${r - 1}")},
      ${pairsBlock(s"p$r")},
      dn$r AS ($dn),
      room$r AS (SELECT least($batchSize, $nMerges - (SELECT dn FROM dn$r)) AS rm),
      top$r AS (SELECT * FROM (SELECT pair, cnt,
          split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
          row_number() OVER (ORDER BY cnt DESC, pair) AS rk
        FROM pairsp$r) z WHERE rk <= $over),
      acc$r(rk, used, batch) AS (
        SELECT 0, []::VARCHAR[], []::STRUCT(a VARCHAR, b VARCHAR, cnt BIGINT)[]
        UNION ALL
        SELECT t.rk,
          CASE WHEN $accept
            THEN list_concat(d.used, [t.a, t.b, t.a || t.b]) ELSE d.used END,
          CASE WHEN $accept
            THEN list_append(d.batch,
              struct_pack(a := t.a, b := t.b, cnt := t.cnt))
            ELSE d.batch END
        FROM acc$r d JOIN top$r t ON t.rk = d.rk + 1),
      ac$r AS (SELECT batch FROM acc$r ORDER BY rk DESC LIMIT 1),
      bf$r AS (SELECT CASE WHEN len(batch) = 0
            AND (SELECT count(*) FROM top$r) > 0
            AND (SELECT rm FROM room$r) > 0
          THEN [(SELECT struct_pack(a := a, b := b, cnt := cnt)
                 FROM top$r WHERE rk = 1)]
          ELSE batch END AS batch FROM ac$r),
      $applies"""
  }

  /** Batched-BPE training oracle: (merge_rank, pair, cnt). Rounds
    * unrolled to nMerges (worst case: one accept per round).
    */
  def trainBatchedSql(nMerges: Int, batchSize: Int): String = materialized {
    val rounds = (1 to nMerges).map(batchedRound(_, nMerges, batchSize))
      .mkString(",\n      ")
    val out = (1 to nMerges).map(r =>
      s"""SELECT $r AS rnd, k, batch[k].a AS a, batch[k].b AS b,
          batch[k].cnt AS cnt
        FROM bf$r, unnest(range(1, len(batch)+1)) t(k)""")
      .mkString("\n        UNION ALL ")
    s"""WITH RECURSIVE $prefix,
      $rounds
      SELECT CAST(row_number() OVER (ORDER BY rnd, k) AS BIGINT) AS merge_rank,
        a || ' ' || b AS pair, cnt
      FROM (
        $out) u
      ORDER BY merge_rank"""
  }

  /** Prune-and-re-encode oracle ([[graft.ops.TextOps.bpePrune]]):
    * replay exact training, count each merged symbol's corpus
    * occurrences in the FINAL symbol state (vocab symbols weighted by
    * word frequency == corpus occurrences), keep merge r iff
    * `occ(a||b) * 1e6 >= ppm * total_syms` (the same integer
    * decision), then RE-ENCODE from the char alphabet through the
    * kept merges only — a dropped slot is a NULL merge, which the
    * apply block treats as identity (the batched rounds' guard).
    * Output shape == [[encodeSql]].
    */
  def pruneEncodeSql(nMerges: Int, ppm: Long): String = materialized {
    val rounds = (1 to nMerges).map(exactRound).mkString(",\n      ")
    val keeps = (1 to nMerges).map { r =>
      val kept = s"coalesce((SELECT c FROM occ WHERE sym = " +
        s"(SELECT a FROM best$r) || (SELECT b FROM best$r)), 0) " +
        s"* 1000000 >= $ppm * (SELECT t FROM tot)"
      s"""keep$r AS (SELECT
          CASE WHEN $kept THEN (SELECT a FROM best$r) END AS a,
          CASE WHEN $kept THEN (SELECT b FROM best$r) END AS b)"""
    }.mkString(",\n      ")
    val reenc = (1 to nMerges).map { r =>
      val prev = if (r == 1) "syms0" else s"ksyms${r - 1}"
      s"""${posBlock(s"k$r", prev)},
      ${applyBlock(s"k$r", s"SELECT a FROM keep$r",
        s"SELECT b FROM keep$r", s"ksyms$r")}"""
    }.mkString(",\n      ")
    s"""WITH RECURSIVE $prefix,
      $rounds,
      occ AS (SELECT sym, CAST(sum(words.wf) AS BIGINT) AS c
          FROM (SELECT w, unnest(syms) AS sym FROM syms$nMerges) u
          JOIN words ON words.w = u.w GROUP BY sym),
      tot AS (SELECT CAST(sum(len(s.syms) * words.wf) AS BIGINT) AS t
          FROM syms$nMerges s JOIN words ON words.w = s.w),
      $keeps,
      $reenc,
      docpos AS (SELECT t.doc_id, i AS pos, t.ts[i] AS tok
        FROM toks t, unnest(range(1, len(t.ts)+1)) u(i)),
      perdoc AS (SELECT d.doc_id,
          CAST(count(*) AS BIGINT) AS nw,
          CAST(sum(len(s.syms)) AS BIGINT) AS ns,
          array_to_string(
            flatten(list(s.syms ORDER BY d.pos) FILTER (WHERE d.pos <= 3)),
            ' ') AS sample
        FROM docpos d JOIN ksyms$nMerges s ON s.w = d.tok
        GROUP BY d.doc_id)
      SELECT doc.doc_id AS doc_id,
        coalesce(p.nw, 0::BIGINT) AS n_words,
        coalesce(p.ns, 0::BIGINT) AS n_syms,
        coalesce(p.sample, '') AS sample
      FROM (SELECT doc_id FROM documents) doc
      LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
      ORDER BY doc_id"""
  }

  /** Corpus-encode oracle: replay exact training (the final round's
    * symbol state IS the encoding of every distinct word — pinned
    * equivalence in TrainingSpec), reassemble documents in token
    * order: (doc_id, n_words, n_syms, sample).
    */
  def encodeSql(nMerges: Int): String = materialized {
    val rounds = (1 to nMerges).map(exactRound).mkString(",\n      ")
    s"""WITH RECURSIVE $prefix,
      $rounds,
      docpos AS (SELECT t.doc_id, i AS pos, t.ts[i] AS tok
        FROM toks t, unnest(range(1, len(t.ts)+1)) u(i)),
      perdoc AS (SELECT d.doc_id,
          CAST(count(*) AS BIGINT) AS nw,
          CAST(sum(len(s.syms)) AS BIGINT) AS ns,
          array_to_string(
            flatten(list(s.syms ORDER BY d.pos) FILTER (WHERE d.pos <= 3)),
            ' ') AS sample
        FROM docpos d JOIN syms$nMerges s ON s.w = d.tok GROUP BY d.doc_id)
      SELECT doc.doc_id AS doc_id,
        coalesce(p.nw, 0::BIGINT) AS n_words,
        coalesce(p.ns, 0::BIGINT) AS n_syms,
        coalesce(p.sample, '') AS sample
      FROM (SELECT doc_id FROM documents) doc
      LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
      ORDER BY doc_id"""
  }
}
