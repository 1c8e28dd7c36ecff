package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — the five verified stages run
  * as ONE declarative plan (q_pipeline_e2e is the oracle-checked
  * face; Probe's pipeline_e2e is the scale evidence): exact-dedup
  * keep list → quality gate → decontamination against the benchmark
  * slice → per-source cap → sliding-window chunking. Composing in
  * one plan (rather than materializing between stages) lets Catalyst
  * collapse the doc_id semi-joins and keeps every stage's scan
  * pruned to the columns it reads.
  *
  * Scale shape is the sum of its parts, each documented on its
  * operator: one md5 shuffle (dedup), map-side gates (quality), a
  * broadcast shingle join (decon), one window shuffle (cap), a
  * map-side explode (chunk).
  */
object Corpus {

  /** `docs` needs (doc_id, source, text, n_chars). Returns chunks of
    * the surviving, capped corpus: (doc_id, chunk_id, chunk,
    * n_tokens, source).
    */
  def pipeline(docs: DataFrame, benchmarkMod: Int, capPerSource: Int,
      chunkMax: Int, chunkOverlap: Int): DataFrame = {
    val kept1 = Dedup.applyKeep(docs, "doc_id", "text")
      .filter(col("kept")).select("doc_id")
    val qual = docs
      .withColumn("ts", TextOps.tokens(col("text")))
      .withColumn("n_words", size(col("ts")).cast("long"))
      .withColumn("avg_wlen",
        TextOps.totalTokenChars(col("ts")).cast("double") / size(col("ts")))
      .withColumn("stop_ratio",
        TextOps.stopwordHits(col("ts")).cast("double") / size(col("ts")))
      .filter(col("n_words") >= 5 && col("n_words") <= 10000 &&
        col("avg_wlen") >= 2.0 && col("avg_wlen") <= 12.0 &&
        col("stop_ratio") >= 0.05)
      .select("doc_id")
    val sh = docs.select(col("doc_id"),
      explode(TextOps.shingleSet(col("text"))).as("s"))
    val bench = sh.filter(col("doc_id") % benchmarkMod === 0)
      .select("s").distinct()
    val contaminated = sh.join(broadcast(bench), Seq("s"))
      .select("doc_id").distinct()
    val survivors = docs.filter(col("doc_id") % benchmarkMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(kept1, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
    val capped = Sample.capPerGroup(survivors, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id")), capPerSource)
    TextOps.chunk(capped, "doc_id", "text",
        maxTokens = chunkMax, overlap = chunkOverlap)
      .join(capped.select("doc_id", "source"), Seq("doc_id"))
  }
}
