package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Similarity, TextOps}

/** Corpus-analytics queries for the training-data pipeline: embedding
  * centroids, collocation mining, and composite (Gopher-style) quality
  * gates — each a one-shuffle grouped aggregation or a pure map-side
  * pass, with a DuckDB oracle mirroring the exact arithmetic.
  */
object CorpusQ {

  /** Per-label embedding centroids (long form, one row per (label,
    * dim)) — quantized-integer exact sums so the result is
    * partitioning-independent and engine-portable (see
    * [[Similarity.centroids]] for the numeric contract).
    */
  val qEmbedCentroid = Q(
    "q_embed_centroid",
    (spark, dir) =>
      Similarity.centroids(Tables.embeddings(spark, dir))
        .orderBy("label", "pos"),
    Some("""WITH e AS (SELECT label,
          unnest(list_transform(range(1, len(embedding) + 1),
            i -> {'pos': i - 1,
                  'q': CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                       AS BIGINT)})) AS u
        FROM embeddings)
      SELECT label, CAST(u.pos AS BIGINT) AS pos,
        CAST(sum(u.q) AS DOUBLE) / (count(*) * 1000000) AS centroid,
        count(*) AS n
      FROM e GROUP BY label, u.pos ORDER BY label, pos""")
  )

  private val MinPairCount = 5
  private val TopCollocations = 100

  /** Collocation mining: corpus-wide bigram counts joined to unigram
    * counts, scored with the Dice coefficient 2·c(ab)/(c(a)+c(b)) —
    * rational on exact integer counts, so the score (and the top-k
    * cut) is bit-identical across engines. Shape: two explode→partial
    * -agg passes over the corpus plus two narrow equality joins on the
    * (bounded-vocabulary) count tables; the final top-k is
    * TakeOrderedAndProject, never a full sort.
    */
  val qCollocations = Q(
    "q_collocations",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val toks = TextOps.tokens(col("text"))
      // the unigram count table feeds BOTH join sides (c_a, c_b) —
      // without a cut the corpus tokenize+explode+agg plans twice
      // (same pruning-defeats-reuse shape as Bars.resampleFfill);
      // the cut materializes the (bounded-vocabulary) table once,
      // dropping corpus passes from three to two
      val uni = docs.select(explode(toks).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_w"))
        .localCheckpoint(false)
      val pairs = docs.select(explode(TextOps.bigrams(toks)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= MinPairCount)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
      pairs
        .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
        .withColumn("dice",
          (lit(2) * col("c_ab")).cast("double") / (col("c_a") + col("c_b")))
        .select("bigram", "c_ab", "c_a", "c_b", "dice")
        .orderBy(col("dice").desc, col("bigram"))
        .limit(TopCollocations)
    },
    Some(s"""WITH toks AS (SELECT doc_id,
          list_filter(string_split(trim(text), ' '), x -> x <> '') AS ts
        FROM documents),
        bgl AS (SELECT CASE WHEN len(ts) >= 2
            THEN list_transform(range(1, len(ts)),
                 i -> ts[i] || ' ' || ts[i+1])
            ELSE CAST([] AS VARCHAR[]) END AS bgs FROM toks),
        pc AS (SELECT bg AS bigram, count(*) AS c_ab
          FROM (SELECT unnest(bgs) AS bg FROM bgl)
          GROUP BY bg HAVING count(*) >= $MinPairCount),
        uc AS (SELECT w, count(*) AS c_w
          FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w)
      SELECT p.bigram, p.c_ab, a.c_w AS c_a, b.c_w AS c_b,
        CAST(2 * p.c_ab AS DOUBLE) / (a.c_w + b.c_w) AS dice
      FROM pc p
      JOIN uc a ON string_split(p.bigram, ' ')[1] = a.w
      JOIN uc b ON string_split(p.bigram, ' ')[2] = b.w
      ORDER BY dice DESC, bigram LIMIT $TopCollocations""")
  )

  // private[queries]: shared with the multi-signal ensemble gate
  // (PipelineQ q_quality_ensemble), whose rule leg must agree with
  // q_quality_gopher threshold-for-threshold.
  private[queries] val MinWords = 20
  private[queries] val MaxWords = 90
  private[queries] val MeanLenMin = 4.0
  private[queries] val MeanLenMax = 5.0
  private[queries] val StopFracMin = 0.03

  /** The gopher conjunction as ONE boolean Column over a text column
    * — map-side, zero shuffles; token-less docs fail the word-count
    * band so the null ratio legs never decide (false && null = false
    * in both engines). Shared by q_quality_gopher's semantics and the
    * ensemble gate's rule leg.
    */
  private[queries] def gopherPass(text: Column): Column = {
    val ts = TextOps.tokens(text)
    val n = size(ts)
    n.cast("long").between(MinWords, MaxWords) &&
      when(n > 0, TextOps.totalTokenChars(ts).cast("double") / n)
        .between(MeanLenMin, MeanLenMax) &&
      when(n > 0, TextOps.stopwordHits(ts).cast("double") / n) >= StopFracMin
  }

  /** Composite Gopher-style quality gate (Rae et al. 2021 §A1.1
    * class of rules, thresholds tuned to this corpus): word-count
    * bounds, mean-word-length band, minimum stopword fraction, and the
    * conjunction as the keep decision. Pure map-side column math —
    * ratios are double-on-exact-integers, so flags and pass agree
    * bit-for-bit with the oracle. Zero shuffles at any scale.
    */
  val qQualityGopher = Q(
    "q_quality_gopher",
    (spark, dir) => {
      val ts = TextOps.tokens(col("text"))
      val n = size(ts)
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          n.cast("long").as("n_words"),
          when(n > 0, TextOps.totalTokenChars(ts).cast("double") / n)
            .as("mean_word_len"),
          when(n > 0, TextOps.stopwordHits(ts).cast("double") / n)
            .as("stop_frac"))
        .withColumn("flag_words", col("n_words").between(MinWords, MaxWords))
        .withColumn("flag_word_len",
          col("mean_word_len").between(MeanLenMin, MeanLenMax))
        .withColumn("flag_stop", col("stop_frac") >= StopFracMin)
        .withColumn("pass",
          col("flag_words") && col("flag_word_len") && col("flag_stop"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (SELECT doc_id,
          list_filter(string_split(trim(text), ' '), x -> x <> '') AS ts
        FROM documents),
        m AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_words,
          CASE WHEN len(ts) > 0 THEN
            CAST(list_reduce(list_transform(ts, w -> len(w)),
                 (a, b) -> a + b) AS DOUBLE) / len(ts) END AS mean_word_len,
          CASE WHEN len(ts) > 0 THEN
            CAST(len(list_filter(ts, w -> w IN
              ('the','a','of','and','in','to','is','on'))) AS DOUBLE)
              / len(ts) END AS stop_frac
        FROM toks)
      SELECT doc_id, n_words, mean_word_len, stop_frac,
        (n_words BETWEEN $MinWords AND $MaxWords) AS flag_words,
        (mean_word_len BETWEEN $MeanLenMin AND $MeanLenMax) AS flag_word_len,
        (stop_frac >= $StopFracMin) AS flag_stop,
        ((n_words BETWEEN $MinWords AND $MaxWords)
          AND (mean_word_len BETWEEN $MeanLenMin AND $MeanLenMax)
          AND (stop_frac >= $StopFracMin)) AS pass
      FROM m ORDER BY doc_id""")
  )

  /** Unicode NFC normalization (see
    * [[org.apache.spark.sql.graftbridge.NfcNormalize]] — native
    * codegen expression, already-normalized fast path): the
    * canonicalization every multilingual pipeline runs before
    * hashing, exercised on a corpus that provably NEEDS it (the
    * q_dedup_canon pattern): the ASCII corpus is perturbed in-query
    * into decomposed sequences keyed on doc_id (e → e+U+0301,
    * a → a+U+030A), reproduced exactly by the oracle, and normalized
    * back to composed forms by Java NFC on the Spark side vs DuckDB's
    * nfc_normalize on the oracle side — two independent Unicode
    * implementations hash-compared. Map-side only.
    */
  val qNormalizeNfc = Q(
    "q_normalize_nfc",
    (spark, dir) => {
      val pert = when(col("doc_id") % 3 === 0,
          replace(col("text"), lit("e"), lit("e\u0301")))
        .when(col("doc_id") % 3 === 1,
          replace(col("text"), lit("a"), lit("a\u030A")))
        .otherwise(col("text"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), pert.as("_t"))
        .select(col("doc_id"),
          graft.functions.TextExprs.nfcNormalize(col("_t")).as("text_nfc"),
          (graft.functions.TextExprs.nfcNormalize(col("_t")) =!= col("_t"))
            .as("changed"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769))
               WHEN doc_id % 3 = 1 THEN replace(text, 'a', 'a' || chr(778))
               ELSE text END AS t
        FROM documents)
      SELECT doc_id, nfc_normalize(t) AS text_nfc,
        nfc_normalize(t) <> t AS changed
      FROM p ORDER BY doc_id""")
  )

  /** NFC-keyed exact dedup — [[qNormalizeNfc]] composed into the
    * dedup path on a corpus that provably needs it: every document
    * spawns a COMPOSED variant (e → U+00E9) and a DECOMPOSED variant
    * (e → e+U+0301) — byte-different, canonically equivalent. Hashing
    * `md5(nfc(text))` collapses each pair to ONE group (n_groups ==
    * n_docs, every n_dups == 2 — TrainingSpec pins that skipping NFC
    * yields ~2× the groups), which is exactly why multilingual
    * pipelines normalize before hashing. ASCII-stripping
    * [[graft.ops.TextOps.canonicalize]] cannot express this (it
    * deletes the non-ASCII chars outright); NFC is the
    * content-preserving normalization. Same single-shuffle shape as
    * q_dedup_exact; the normalize is a map-side native expression.
    */
  val qDedupNfc = Q(
    "q_dedup_nfc",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val composed = docs.select((col("doc_id") * 2).as("doc_id"),
        replace(col("text"), lit("e"), lit("\u00e9")).as("text"))
      // explicit escape: a raw decomposed literal would be silently
      // composed by any NFC-normalizing editor/formatter (the
      // ExtensionsSpec source-encoding-proof rule)
      val decomposed = docs.select((col("doc_id") * 2 + 1).as("doc_id"),
        replace(col("text"), lit("e"), lit("e\u0301")).as("text"))
      graft.ops.Dedup.exact(
        composed.unionByName(decomposed)
          .withColumn("text",
            graft.functions.TextExprs.nfcNormalize(col("text"))),
        "doc_id", "text")
        .orderBy("rep_id")
    },
    Some("""WITH corpus AS (
        SELECT doc_id * 2 AS doc_id,
          replace(text, 'e', chr(233)) AS text FROM documents
        UNION ALL
        SELECT doc_id * 2 + 1,
          replace(text, 'e', 'e' || chr(769)) FROM documents),
      n AS (SELECT doc_id, nfc_normalize(text) AS t FROM corpus)
      SELECT md5(t) AS text_hash, min(doc_id) AS rep_id,
        count(*) AS n_dups
      FROM n GROUP BY md5(t) ORDER BY rep_id""")
  )

  def all: Seq[Q] = Seq(qEmbedCentroid, qCollocations, qQualityGopher,
    qNormalizeNfc, qDedupNfc)
}
