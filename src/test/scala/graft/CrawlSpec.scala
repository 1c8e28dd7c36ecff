package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bloom, TextOps}

/** Pins for the crawl-curation family (graft.queries.CrawlQ): the
  * three synthetic fetch variants collapse to ONE canonical URL, the
  * Bloom-gated blocklist equals the plain anti-join bit-for-bit,
  * latest-crawl-wins keeps the max-doc_id fetch, and the e2e face's
  * quarantine drops exactly the unparseable fetches.
  */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("all three fetch variants canonicalize to the same URL") {
    import spark.implicits._
    val raws = Seq(
      "http://h3.example.com/p/45",
      "HTTP://WWW.H3.Example.COM:80/p/45/#s",
      "http://h3.example.com/p/45?utm_campaign=x&gclid=9")
    val got = raws.toDF("u")
      .select(TextOps.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got.forall(_ == "http://h3.example.com/p/45"), got)
    // an unparseable fetch is NULL — the quarantine contract
    val bad = Seq("not a url 7").toDF("u")
      .select(TextOps.normalizeUrl(col("u"))).head()
    assert(bad.isNullAt(0))
  }

  test("q_dedup_url keeps the latest fetch per canonical URL") {
    val out = graft.queries.CrawlQ.qDedupUrl
      .run(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nPages = docs.select((col("doc_id") % 211).as("p"))
      .distinct().count()
    assert(out.length == nPages)
    assert(out.map(_.getLong(4)).sum == nDocs, "every fetch accounted")
    // winner is the max doc_id in its page group
    out.foreach { r =>
      val url = r.getString(0)
      val page = url.split("/p/").last.toLong
      val winner = r.getLong(1)
      assert(winner % 211 == page)
    }
  }

  test("Bloom blocklist gate == plain anti-join on hosts") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, sf)
      .withColumn("host",
        concat(lit("h"), (col("doc_id") % 211) % 17, lit(".example.com")))
    val blocked = Seq("h0.example.com", "h1.example.com",
      "h2.example.com").toDF("bhost")
    val viaBloom = Bloom.antiJoin(docs, col("host"), blocked,
        col("bhost"), expectedItems = 16)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val plain = docs.join(blocked, col("host") === col("bhost"),
        "left_anti")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaBloom == plain)
    assert(viaBloom.nonEmpty && viaBloom.size < docs.count())
  }

  test("q_crawl_curate quarantines unparseable fetches and gates blocked hosts") {
    val out = graft.queries.CrawlQ.qCrawlCurate.run(spark, sf).collect()
    val hosts = out.map(_.getString(0)).toSeq
    assert(hosts.forall(h => !Set("h0.example.com", "h1.example.com",
      "h2.example.com").contains(h)), "blocked host leaked through")
    val docs = graft.io.Tables.documents(spark, sf)
    val expected = docs
      .filter(col("doc_id") % 19 =!= 0)
      .filter(((col("doc_id") % 211) % 17) >= 3)
      .count()
    assert(out.map(_.getLong(2)).sum == expected,
      "kept fetch count != parseable ∧ unblocked fetches")
  }

  test("site-line counts merge exactly across document-disjoint batches " +
      "(the q_stream_boilerplate sum-merge contract)") {
    // the streaming index appends PER-BATCH distinct-doc counts and
    // reads fold with one more sum per key; exact iff each document
    // lands in exactly one batch. Pin: 3-way doc-disjoint split,
    // summed per-batch counts == global counts, row for row.
    import graft.ops.Dedup
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("host", concat(lit("h"), col("doc_id") % 5))
    val lines = Dedup.siteLineTable(docs, "doc_id", "text", "host", " ")
    val global = Dedup.siteLineCounts(lines)
    val summed = (0 until 3)
      .map(i => Dedup.siteLineCounts(
        lines.filter(col("_sb_id") % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy("_sb_site", "_sb_h")
      .agg(sum(col("_sb_nd")).as("_sb_nd"))
    assert(global.join(summed, Seq("_sb_site", "_sb_h"), "full")
      .filter(!(global("_sb_nd") <=> summed("_sb_nd"))).count() == 0)
    // and the contract's boundary: a doc SPLIT across batches double
    // counts — the per-line granularity would break it, pinned so the
    // contract stays documented by a failing counter-example shape
    val splitByLine = (0 until 3)
      .map(i => Dedup.siteLineCounts(
        lines.filter(col("_sb_idx") % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy("_sb_site", "_sb_h")
      .agg(sum(col("_sb_nd")).as("_sb_nd"))
    assert(global.join(splitByLine, Seq("_sb_site", "_sb_h"), "inner")
      .filter(!(global("_sb_nd") <=> splitByLine("_sb_nd"))).count() > 0,
      "line-granularity split unexpectedly merged exactly — the " +
        "one-batch-per-document contract would be vacuous")
  }
}
