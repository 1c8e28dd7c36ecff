package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inverted-index text retrieval — BM25 top-k in the engine's
  * exact-integer discipline (Robertson & Zaragoza 2009 for the
  * scoring shape; cf. the reference's keyed lookups, which stop at
  * point access — ranked retrieval is an extension face).
  *
  * Why a training-data engine needs it: dataset curation retrieves —
  * eval-set decontamination by QUERY (not just n-gram overlap),
  * targeted-domain mining ("find docs like these seeds"), and
  * retrieval-augmented dedup review all reduce to "top-k docs for a
  * term set" over corpus-scale text.
  *
  * Determinism contract (the qlog2/dyadic discipline of
  * [[Dsir]]/[[NgramLm]]): every score is an exact long, so ranking
  * replays hash-identically in any engine —
  *
  *  - idf is QUANTIZED: iq(t) = floor(log2(2(N−df)+1)) −
  *    floor(log2(2df+1)), computed as length(bin(x))−1 — the integer
  *    rendering of BM25's ln((N−df+0.5)/(df+0.5)) (absorbing the +0.5
  *    smoothing into the 2x+1 odd shift; negative for df > ~N/2,
  *    exactly like the float original);
  *  - the tf saturation k1=1.2, b=0.75 is EXACT RATIONAL with a
  *    quantized average doc length: with a = floorDiv(L, N) (the only
  *    corpus-scale statistic, two scalars collected),
  *    tf_part = tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/a)
  *            = 22·tf·a / (10·tf·a + 3·a + 9·dl)   — integers —
  *    scaled by 2^scaleBits and floor-divided (positive operands, so
  *    Spark `div` == DuckDB `//`);
  *  - term score = iq · tf_part_scaled; doc score = Σ over the
  *    query's distinct terms; top-k by (score DESC, doc_id ASC).
  *
  * Overflow headroom: the scaled numerator is 22·tf·a·2^scaleBits —
  * per-DOC quantities only (nothing grows with corpus size), bounded
  * by 2^63 while tf·a < 2^(58−scaleBits); at the default 20 bits that
  * is tf·avgdl < 2.7e11, far above any real corpus (a pathological
  * million-token doc in a million-token-average corpus would need
  * tf·a ≈ 1e12 — raise nothing, shrink scaleBits).
  *
  * Scale shape: postings/df/dl are one tokenize pass + map-side
  * partial aggs; N and L are a 1-row collect; the query term set
  * broadcasts and the candidate set is the INVERTED-INDEX equality
  * join — only docs sharing ≥1 query term are scored (the point of
  * the index; no |Q|·|C| cross join anywhere); the final top-k is a
  * window over the already-sparse candidate table.
  */
object Retrieval {

  /** floor(log2 x) for x ≥ 1 as exact integer ops (the
    * [[Dsir]] qlog2 recipe — length(bin(x)) − 1).
    */
  private def qlog2(c: org.apache.spark.sql.Column) =
    (length(bin(c)) - 1).cast("long")

  /** The persistable inverted-index artifact (the
    * [[NgramLm.backoffTables]] decomposition applied to retrieval):
    * postings (doc_id, term, tf), per-term df, per-doc dl — three
    * plain tables a production layout writes ONCE (partitioned/
    * bucketed by term for the postings) — plus the two corpus
    * scalars. Build cost is one tokenize pass + map-side partial
    * aggs, amortized over every query; [[bm25Query]] serves any
    * number of query sets against the frozen artifact.
    */
  final case class Bm25Index(postings: DataFrame, df: DataFrame,
      dl: DataFrame, nDocs: Long, avgdl: Long)

  /** Tokenize `docs` once and derive the index tables + scalars. */
  def buildIndex(docs: DataFrame, docIdCol: String = "doc_id",
      textCol: String = "text"): Bm25Index = {
    val toks = docs.select(col(docIdCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("ts"))
    val posting = toks
      .select(col("doc_id"), explode(col("ts")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = posting.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum("dl").as("l")).head()
    val nDocs = st.getLong(0)
    require(nDocs > 0, "buildIndex needs a non-empty corpus " +
      "(sum(dl) is null on empty input)")
    Bm25Index(posting, dfT, dl, nDocs,
      Math.floorDiv(st.getLong(1), nDocs))
  }

  /** BM25 top-`k` docs per query against a frozen [[Bm25Index]].
    * `queries`: (queryIdCol, textCol) — each query's DISTINCT tokens
    * form its term set. Returns (query_id, rank, doc_id, score) with
    * rank 1..k by (score DESC, doc_id ASC). `excludeSelf` drops the
    * candidate whose doc_id equals the query_id (for doc-as-query
    * related-document retrieval).
    */
  def bm25Query(idx: Bm25Index, queries: DataFrame, k: Int,
      queryIdCol: String = "query_id", textCol: String = "text",
      scaleBits: Int = 20, excludeSelf: Boolean = false,
      maxDfPpm: Long = 1000000L): DataFrame = {
    val scored = bm25Scores(idx, queries, queryIdCol, textCol,
      scaleBits, excludeSelf, maxDfPpm)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }

  /** The full (query_id, doc_id, score) candidate table behind
    * [[bm25Query]] — sparse by construction (only docs sharing ≥1
    * query term appear). Use directly when the consumer is a
    * THRESHOLD rather than a top-k: decontamination flags every doc
    * whose score clears a cut, however many per query.
    */
  def bm25Scores(idx: Bm25Index, queries: DataFrame,
      queryIdCol: String = "query_id", textCol: String = "text",
      scaleBits: Int = 20, excludeSelf: Boolean = false,
      maxDfPpm: Long = 1000000L): DataFrame = {
    require(scaleBits > 0 && scaleBits < 40, "scaleBits must leave headroom")
    require(maxDfPpm > 0 && maxDfPpm <= 1000000L,
      "maxDfPpm is parts-per-million of nDocs")
    val qt0 = queries.select(col(queryIdCol).cast("long").as("query_id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    // STOPWORD PRE-PRUNE (measured in Probe bm25_index): a term in
    // ~every doc makes the postings join admit ~every doc — the
    // scoring ranks it away (negative quantized idf), but the join
    // already paid. Drop query terms whose df exceeds the ceiling
    // BEFORE the postings join; the df side of this semi-filter is
    // the model-sized per-term table, joined against the (tiny)
    // query term set. Default ceiling 1e6 ppm = keep everything.
    val qt = if (maxDfPpm >= 1000000L) qt0
      else qt0.join(idx.df.filter(
          col("df") * lit(1000000L) <= lit(maxDfPpm * idx.nDocs)),
        Seq("term"), "left_semi")
    val cand0 = idx.postings.join(broadcast(qt), Seq("term"))
      .join(idx.df, Seq("term")).join(idx.dl, Seq("doc_id"))
    val cand = if (excludeSelf)
      cand0.filter(col("doc_id") =!= col("query_id")) else cand0
    val iq = qlog2(lit(2L) * (lit(idx.nDocs) - col("df")) + lit(1L)) -
      qlog2(lit(2L) * col("df") + lit(1L))
    val s = 1L << scaleBits
    val termScore = cand
      .withColumn("num", lit(22L * idx.avgdl * s) * col("tf"))
      .withColumn("den", lit(10L * idx.avgdl) * col("tf") +
        lit(3L * idx.avgdl) + lit(9L) * col("dl"))
      .withColumn("ts", iq * expr("num div den"))
    termScore.groupBy("query_id", "doc_id")
      .agg(sum(col("ts")).as("score"))
  }

  /** One-shot convenience: [[buildIndex]] + [[bm25Query]]. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      docIdCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", scaleBits: Int = 20,
      excludeSelf: Boolean = false): DataFrame =
    bm25Query(buildIndex(docs, docIdCol, textCol), queries, k,
      queryIdCol, textCol, scaleBits, excludeSelf)

  /** EXACT index merge — the incremental-maintenance path a growing
    * corpus needs (the [[NgramLm.mergeCounts]] shard-and-sum
    * discipline applied to retrieval): index each shard
    * independently, then merge the ARTIFACTS, never re-tokenize.
    * Shards must have disjoint doc ids (a doc lives in exactly one
    * shard), so postings/dl merge by UNION and df by full-outer SUM;
    * N and L add. The merged index is value-identical to one built
    * on the union corpus — merge(build(A), build(B)) == build(A∪B) —
    * because every statistic here is a sum over docs. (avgdl is
    * re-derived from the merged totals, so keep totalLen when
    * persisting: the case class stores the floor-divided avgdl plus
    * what reconstruction needs.)
    */
  def mergeIndex(a: Bm25Index, aLen: Long, b: Bm25Index,
      bLen: Long): Bm25Index = {
    val postings = a.postings.unionByName(b.postings)
    val dfT = a.df.withColumnRenamed("df", "dfa")
      .join(b.df.withColumnRenamed("df", "dfb"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("dfa"), lit(0L)) + coalesce(col("dfb"), lit(0L)))
          .as("df"))
    val dl = a.dl.unionByName(b.dl)
    val n = a.nDocs + b.nDocs
    Bm25Index(postings, dfT, dl, n,
      Math.floorDiv(aLen + bLen, math.max(n, 1L)))
  }

  /** Total token count of an index's corpus (Σ dl) — the second
    * scalar [[mergeIndex]] needs; persist it next to nDocs.
    */
  def totalLen(idx: Bm25Index): Long =
    idx.dl.agg(sum("dl")).head().getLong(0)

  /** RECIPROCAL-RANK FUSION (Cormack et al., SIGIR'09) — hybrid
    * retrieval's standard combiner, in the exact-integer discipline:
    * each input list contributes floorDiv(2^scaleBits, rrfK + rank)
    * per (query, doc), an exact long, so the fused ranking is
    * engine-portable without touching either retriever's score units
    * (the whole point of RRF: ranks compose where raw BM25 longs and
    * cosine doubles cannot). Inputs are already-ranked lists
    * (query_id, rank, doc_id) — pass [[bm25Query]]'s top-k and a
    * dense kNN's top-k (rename neighbor_id → doc_id) for classic
    * lexical+dense hybrid search. Union is list-count-bounded per
    * (query, doc); the fusion agg is map-side partial; the final
    * top-k windows the already-tiny fused table.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60,
      scaleBits: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(scaleBits > 0 && scaleBits < 40, "scaleBits must leave headroom")
    val s = 1L << scaleBits
    val contribs = lists.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      expr(s"$s div ($rrfK + rank)").as("c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id").agg(sum("c").as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf")
  }
}
