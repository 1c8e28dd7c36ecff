package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Similarity, TextOps}

class TrainingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles produce consecutive k-grams; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextOps.shingles(TextOps.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("exact dedup groups identical texts, min id representative") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("rep_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard finds permuted near-dups, not unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "also the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words about spark query engines here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("ppjoin == cap-free ngram jaccard on a mixed corpus, and the " +
      "prefix filter actually prunes candidates") {
    // near-dup pairs, a shared-boilerplate cluster, and singletons:
    // every doc shares the common trigram, so the naive candidate set
    // is all pairs; prefixes are built from the RARE trigrams
    val common = "the shared boilerplate header line"
    val docs = (1L to 30L).map { i =>
      val body =
        if (i <= 10) s"u${i} v${i} w${i} x${i} y${i} z${i}" // singletons
        else if (i <= 20) s"dup a dup b dup c tail${i % 2}" // 2 groups
        else s"p q r s t u${i}"                             // near-dups
      (i, s"$common $body")
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e12))).sortBy(x => (x._1, x._2)).toSeq
    val exact = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5))
    val pp = canon(Dedup.ppjoinPairs(docs, "doc_id", "text", 1, 2))
    assert(pp == exact)
    assert(pp.nonEmpty, "gate is vacuous — no qualifying pairs")
    // completeness at a high threshold too (fewer, tighter pairs)
    assert(canon(Dedup.ppjoinPairs(docs, "doc_id", "text", 4, 5)) ==
      canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8)))
    // pruning: candidates ⊂ all 30·29/2 pairs even though every pair
    // shares the boilerplate trigrams
    val cand = Dedup.ppjoinCandidatePairs(docs, "doc_id", "text", 1, 2)
      .count()
    assert(cand < 30L * 29 / 2,
      s"prefix filter pruned nothing ($cand candidates)")
    assert(cand >= pp.length)
  }

  test("ppjoin rejects invalid thresholds and handles shingle-less docs") {
    val docs = Seq((1L, "a b"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.ppjoinPairs(docs, "doc_id", "text", 5, 4))
    intercept[IllegalArgumentException](
      Dedup.ppjoinPairs(docs, "doc_id", "text", 0, 4))
    // doc 1 has <3 tokens (no shingles): never a candidate, never
    // breaks the plan; docs 2/3 are identical
    val out = Dedup.ppjoinPairs(docs, "doc_id", "text", 4, 5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq((2L, 3L, 1.0)))
  }

  test("minhash LSH: identical docs share all bands, est_jaccard 1.0") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 4L))
    assert(r.getDouble(3) == 1.0)
  }

  test("simhash: identical token sets share a bucket") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo")
    ).toDF("doc_id", "text")
    val out = Dedup.simhashBuckets(docs, "doc_id", "text", 16)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == out(1).getString(1))
    assert(out(0).getLong(3) >= 2)
  }

  test("narrow-join LSH pairs equal a driver-side banded reference on random docs") {
    // guards the band-key-only candidate join + est_jaccard rejoin
    // rewrite: same (i, j, n_shared_bands, est_jaccard) set as a direct
    // computation over the collected signatures
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 25).map(i => s"w$i")
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 80).foreach { i =>
      if (i % 5 == 4 && texts.nonEmpty) {
        // seed genuine near-dups: copy the previous doc, tweak the tail
        val prev = texts.last.split(" ")
        texts += (prev.dropRight(1) :+ vocab(rnd.nextInt(vocab.length))).mkString(" ")
      } else
        texts += Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      .toSeq.toDF("doc_id", "text")
    val bands = 4; val rpb = 2; val numHashes = bands * rpb
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", bands, rpb)
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val sigs = Dedup.withMinhashSignature(docs, "doc_id", "text", numHashes)
      .collect().map(r => r.getLong(0) -> (0 until numHashes).map(j => r.getLong(j + 1))).toMap
    val ids = sigs.keys.toSeq.sorted
    val want = for {
      ii <- ids; jj <- ids if ii < jj
      si = sigs(ii); sj = sigs(jj)
      shared = (0 until bands).count(b =>
        (0 until rpb).forall(r => si(b * rpb + r) == sj(b * rpb + r)))
      if shared >= 1
    } yield (ii, jj, shared.toLong,
      (0 until numHashes).count(k => si(k) == sj(k)).toDouble / numHashes)
    assert(got.nonEmpty, "test corpus produced no candidate pairs — weaken the dup seeding")
    assert(got == want)
  }

  test("fused packed-vote simhash equals the unfused column formulation") {
    // the reference pipeline the codegen kernel replaced: md5 hex →
    // conv 8-hex chunks to longs → per-bit shift/and ±1 vote sums
    val bits = 16
    val docs = (1L to 60L).map(i =>
      (i, (0 until (3 + (i % 7)).toInt).map(k => s"w${(i * 13 + k * 7) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    def unfused(features: String): Seq[(Long, String)] = {
      val feats = features match {
        case "tokens" => array_distinct(TextOps.tokens(col("text")))
        case "shingles" => TextOps.shingleSet(col("text"))
      }
      val tok = docs.select(col("doc_id"), explode(feats).as("t"))
        .withColumn("h", md5(col("t").cast("binary")))
        .withColumn("_c0", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
        .withColumn("_c1", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
      val votes = (0 until bits).map { k =>
        val shift = (7 - k % 8) * 4 + 3
        sum(shiftright(col(s"_c${k / 8}"), shift).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$k")
      }
      tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), concat((0 until bits).map(k =>
          when(col(s"v$k") > 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    for (f <- Seq("tokens", "shingles")) {
      val fused = Dedup.simhashSignature(docs, "doc_id", "text", bits, f)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(fused == unfused(f), s"features=$f")
    }
  }

  test("simhash Hamming pairs: pigeonhole candidates find every pair within distance (vs all-pairs reference)") {
    // enough docs that blocks genuinely prune, pseudo-random texts
    val docs = (1L to 40L).map { i =>
      val words = (0 until 8).map(w => s"w${(i * 7 + w * w * 13) % 23}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(docs, "doc_id", "text", bits = 16, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // all-pairs reference over the same (shingle-featured) signatures
    val sigs = Dedup.simhashSignature(docs, "doc_id", "text", 16, features = "shingles")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = (for {
      (i, si) <- sigs; (j, sj) <- sigs if i < j
      d = si.zip(sj).count { case (a, b) => a != b } if d <= 2
    } yield (i, j, d.toLong)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "test data should produce at least one close pair")
  }

  test("knn brute force: nearest vector by cosine, self excluded") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(vecs.filter(col("vec_id") === 1), vecs, 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 3L, 4L))
    assert(out(0).getDouble(3) > 0.99)
    assert(out(2).getDouble(3) == -1.0)
  }

  test("sign-LSH buckets put sign-identical vectors together") {
    val vecs = Seq(
      (1L, Seq(0.5f, -0.5f, 0.1f, 0.1f)),
      (2L, Seq(0.4f, -0.6f, 0.2f, 0.1f)),
      (3L, Seq(-0.5f, 0.5f, 0.1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshCosinePairs(vecs, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("winnow fingerprint invariant to duplicate tail, sensitive to change") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val out = docs.select(
      TextOps.winnowFingerprint(TextOps.shingles(TextOps.tokens(col("text")), 3), 5))
      .collect().map(_.getString(0))
    assert(out(0) == out(1) && out(0) != out(2))
  }

  test("applyKeep: one kept doc per group, lineage to min-id rep") {
    val docs = Seq(
      (3L, "same text"), (1L, "same text"), (2L, "other"), (7L, "same text")
    ).toDF("doc_id", "text")
    val out = Dedup.applyKeep(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, true, 3L), (2L, 2L, true, 1L),
      (3L, 1L, false, 3L), (7L, 1L, false, 3L)))
  }

  test("dupNgramCoverage: shared span counted per position; short docs 0/NULL") {
    // docs 1 and 2 share the 4-token prefix -> 2 shared trigram
    // positions each; doc 1 has 3 positions total (5 tokens), doc 2
    // has 2 (4 tokens, all shared); doc 3 is unique; doc 4 too short.
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox"),
      (3L, "entirely different words here"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 2L), (2L, 2L, 2L), (3L, 2L, 0L), (4L, 0L, 0L)))
    assert(out(1).getDouble(3) === 1.0)
    assert(out(3).isNullAt(3))
  }

  test("spanDedup excises non-first duplicated spans; first copy survives verbatim") {
    // k=3. Doc 2 embeds doc 1's "a b c d e" region: its three
    // duplicated 3-windows cover positions 3..7, excising the whole
    // region while doc 1 (the first occurrence) is untouched. Doc 3
    // is an exact span copy -> emptied. Doc 4 duplicates a span
    // WITHIN itself -> the second copy goes, the first stays. Doc 5
    // is shorter than k -> no spans, untouched.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d e z"),
      (3L, "a b c"),
      (4L, "p q r p q r"),
      (5L, "u v")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", k = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 0L, "a b c d e f"),
      (2L, 8L, 5L, "x y z"),
      (3L, 3L, 3L, ""),
      (4L, 6L, 3L, "p q r"),
      (5L, 2L, 0L, "u v")))
  }

  test("knnQuantized: per-vector scale makes code dots magnitude-blind; exact int ties break by id") {
    // q=(1,0) codes (127,0). a=(0.8,0.6) -> s=.8 -> (127, 95);
    // c=(1,0.1) -> (127, 12); both dot 127*127=16129 (scale dropped,
    // like cosine) -> tie broken by id (a=1 before c=3); b=(0,1)
    // codes (0,127) -> dot 0, last.
    val mk = (id: Long, x: Double, y: Double) =>
      (id, Array(x.toFloat, y.toFloat))
    val corpus = Seq(mk(1L, 0.8, 0.6), mk(2L, 0.0, 1.0), mk(3L, 1.0, 0.1))
      .toDF("vec_id", "embedding")
    val queries = Seq(mk(100L, 1.0, 0.0)).toDF("vec_id", "embedding")
    val out = Similarity.knnQuantized(queries, corpus, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1L, 16129L), (2, 3L, 16129L), (3, 2L, 0L)))
    // exact scalar multiples get identical codes => identical dots
    val scaled = Seq(mk(1L, 0.4, 0.3), mk(2L, 0.8, 0.6))
      .toDF("vec_id", "embedding")
    val dots = Similarity.knnQuantized(queries, scaled, k = 2)
      .collect().map(_.getLong(3)).toSet
    assert(dots.size == 1)
  }

  test("NFC-keyed exact dedup collapses composed/decomposed variants; without NFC they split") {
    val docs = Seq((1L, "new era"), (2L, "tree line"), (3L, "dry input"))
      .toDF("doc_id", "text")
    val composed = docs.select((col("doc_id") * 2).as("doc_id"),
      replace(col("text"), lit("e"), lit("\u00e9")).as("text"))
    val decomposed = docs.select((col("doc_id") * 2 + 1).as("doc_id"),
      replace(col("text"), lit("e"), lit("e\u0301")).as("text"))
    val corpus = composed.unionByName(decomposed)
    val withNfc = Dedup.exact(
      corpus.withColumn("text",
        graft.functions.TextExprs.nfcNormalize(col("text"))),
      "doc_id", "text").collect()
    // every (composed, decomposed) pair lands in one group of 2
    assert(withNfc.length == 3 && withNfc.forall(_.getLong(2) == 2L))
    // skipping NFC: e-bearing docs split into byte-distinct variants
    val without = Dedup.exact(corpus, "doc_id", "text").collect()
    assert(without.length == 5) // docs 1,2 split; doc 3 (no 'e') still collapses
  }

  test("bpeMergePairs: frequency-weighted adjacent-char counts; single-char words contribute nothing") {
    // words: ab(wf2), b(wf1), abc(wf1), aa(wf1)
    // "a b": 2 (from ab) + 1 (from abc) = 3; "b c": 1; "a a": 1
    val docs = Seq((1L, "ab b abc"), (2L, "ab aa")).toDF("doc_id", "text")
    val out = TextOps.bpeMergePairs(docs, "text")
      .orderBy(col("cnt").desc, col("pair"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a b", 3L), ("a a", 1L), ("b c", 1L)))
  }

  test("bpeTrain: hand-computed merge sequence; greedy left-to-right merge semantics") {
    // words: aaab(wf3), ab(wf2)
    // r1: "a a" 6 vs "a b" 5 -> (a a, 6); aaab->[aa,a,b], ab->[a,b]
    // r2: "aa a" 3, "a b" 5 -> (a b, 5); aaab->[aa,ab], ab->[ab]
    // r3: "aa ab" 3 -> (aa ab, 3)
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, "text", nMerges = 5)
    assert(merges == Seq(("a a", 6L), ("a b", 5L), ("aa ab", 3L)))
    // early stop: every word collapsed to one symbol after 3 merges
    assert(merges.size == 3)
    // encode applies the same merges in order
    val enc = Seq((1L, "aaab ab aaa"))
      .toDF("doc_id", "text")
      .select(TextOps.bpeEncode(col("text"),
        merges.map { case (p, _) =>
          val Array(a, b) = p.split(" ", 2); (a, b) }).as("e"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toSeq)
    // "aaa" under (a,a) then (a,b), (aa,ab): [aa, a] — greedy, no re-merge
    assert(enc == Seq(Seq("aaab"), Seq("ab"), Seq("aa", "a")))
  }

  test("collapseRepeats: hand-computed blocks — chains, phases, n=1 adjacency, no-op") {
    def run(text: String, n: Int): (Long, String) = {
      val r = TextOps.collapseRepeats(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", n)
        .head()
      (r.getLong(1), r.getString(2))
    }
    // chain: "AB AB AB" — blocks at 3 AND 5 (each equals its ORIGINAL
    // predecessor), union deletes {3..6}, one pass, no rescan
    assert(run("A B A B A B", 2) == (4L, "A B"))
    // mid-document single repeat
    assert(run("x a b a b y", 2) == (2L, "x a b y"))
    // n=1 reduces to adjacent-duplicate-token dedup
    assert(run("a a a b b a", 1) == (3L, "a b a"))
    // order matters: "b a" after "a b" is NOT a repeat
    assert(run("a b b a", 2) == (0L, "a b b a"))
    // shorter than 2n: nothing can repeat
    assert(run("a b c", 2) == (0L, "a b c"))
    assert(run("", 2) == (0L, ""))
  }

  test("bpePrune: hand-computed thresholds; non-vacuous on the oracle corpus; order-preserving subsequence") {
    // words: aaab(wf3), ab(wf2) -> merges (a,a),(a,b),(aa,ab); final
    // state aaab->[aaab] x3, ab->[ab] x2 => total syms 5,
    // occ(aa)=0 (consumed), occ(ab)=2, occ(aaab)=3
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, "text", nMerges = 5)
      .map { case (p, _) => val Array(a, b) = p.split(" ", 2); (a, b) }
    // 400000 ppm of 5 = 2: "ab" (2 occ) survives, "aa" (0) prunes,
    // "aaab" (3) survives — but its input "aa" no longer forms, so
    // re-encode leaves aaab as [a, ab, ... wait, chars a,a,a,b under
    // (a,b) only -> [a, a, ab]
    val pruned = TextOps.bpePrune(docs, "text", merges, ppm = 400000L)
    assert(pruned == Seq(("a", "b"), ("aa", "ab")), s"pruned=$pruned")
    val enc = docs.filter(col("doc_id") === 1L)
      .select(TextOps.bpeEncode(col("text"), pruned).as("e"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toSeq)
    // kept merge (aa,ab) never fires: its producer (a,a) was pruned
    assert(enc == Seq(Seq("a", "a", "ab"), Seq("a", "a", "ab"),
      Seq("ab")))
    // non-vacuity at the ORACLE corpus and the face's exact params:
    // the cataloged ppm must prune some of the 10 merges and keep
    // some, at the spec's sf (the cross-SF sweep covers the others)
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val rm = TextOps.bpeTrain(real, "text", nMerges = 10)
      .map { case (p, _) => val Array(a, b) = p.split(" ", 2); (a, b) }
    val rp = TextOps.bpePrune(real, "text", rm, ppm = 3000L)
    assert(rp.nonEmpty && rp.size < rm.size,
      s"vacuous prune: ${rp.size} of ${rm.size} kept")
    assert(rm.filter(rp.contains) == rp, "pruned list must be an " +
      "order-preserving subsequence of the trained list")
  }

  test("bpePrune at realistic vocab size (nMerges >= 100): engine == plain-Scala replica, non-vacuous split") {
    // The cataloged q_bpe_prune face runs at nMerges ~ 10 because its
    // DuckDB oracle UNROLLS the merge list; this is the round-17
    // large-vocab pin the verdict asked for — engine-vs-model like
    // the GD trainer, no SQL. The real sf0.001 corpus has only 31
    // unique words (merges dry up near 80), so a deterministic
    // generated tail rides along to put the trainer firmly in the
    // >= 100-merge regime.
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val gen = (0 until 120).map { i =>
      (100000L + i, (0 until 5).map { j =>
        val k = i * 5 + j
        (0 until 7).map(d => ('a' + (k / math.pow(5, d).toInt) % 5)
          .toChar).mkString + ('p' + k % 11).toChar
      }.mkString(" "))
    }.toDF("doc_id", "text")
    val docs = real.unionByName(gen)
    val merges = TextOps.bpeTrainBatched(docs, "text",
        nMerges = 120, batchSize = 20)
      .map { case (p, _) => val Array(a, b) = p.split(" ", 2); (a, b) }
    assert(merges.size >= 100, s"trainer dried up at ${merges.size}")
    // plain-Scala replica of the whole prune decision: greedy
    // in-order merge application per word (the bpeEncode kernel's
    // semantics), final-symbol counts weighted by word frequency,
    // the exact integer ppm rule — including the spelling-keyed
    // collision semantics (counts keyed by the merged string)
    val wordFreq = docs.select("text").collect()
      .flatMap(_.getString(0).trim.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    def encode(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      for ((a, b) <- merges) {
        val nb = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms)
          if (nb.nonEmpty && nb.last == a && s == b) nb(nb.size - 1) = a + b
          else nb += s
        syms = nb.toVector
      }
      syms
    }
    val occ = scala.collection.mutable.Map.empty[String, Long]
    var total = 0L
    for ((w, f) <- wordFreq; s <- encode(w)) {
      occ(s) = occ.getOrElse(s, 0L) + f; total += f
    }
    def replicaKeep(ppm: Long): Seq[(String, String)] =
      merges.filter { case (a, b) =>
        occ.getOrElse(a + b, 0L) * 1000000L >= ppm * total }
    // pin across the ppm range — and require a genuine three-way
    // split somewhere (some pruned, some kept), or the pin is vacuous
    val ppms = Seq(500L, 3000L, 20000L, 100000L)
    ppms.foreach { ppm =>
      assert(TextOps.bpePrune(docs, "text", merges, ppm) ==
        replicaKeep(ppm), s"engine != replica at ppm=$ppm")
    }
    assert(ppms.exists { ppm =>
      val k = replicaKeep(ppm).size; k > 0 && k < merges.size
    }, "no ppm in the pinned range splits the merge table — vacuous")
  }

  test("bpeTrain matches an independent plain-Scala BPE reference on a generated corpus") {
    def refBpe(words: Map[String, Long], n: Int): Seq[(String, Long)] = {
      var vocab = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var stop = false
      while (out.size < n && !stop) {
        val stats = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; i <- 0 until syms.size - 1)
          stats((syms(i), syms(i + 1))) =
            stats.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (stats.isEmpty) stop = true
        else {
          val ((a, b), c) = stats.minBy { case ((x, y), c) => (-c, x + " " + y) }
          out += ((a + " " + b, c))
          vocab = vocab.map { case (syms, f) =>
            val nb = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms)
              if (nb.nonEmpty && nb.last == a && s == b)
                nb(nb.size - 1) = a + b
              else nb += s
            (nb.toVector, f)
          }
        }
      }
      out.toSeq
    }
    val texts = (0 until 40).map { i =>
      (0 until 6).map(j => s"${('a' + (i * 7 + j) % 5).toChar}" * ((i + j) % 3 + 1) +
        s"${('a' + (i * 3 + j) % 4).toChar}").mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wordFreq = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    assert(TextOps.bpeTrain(docs, "text", 8) == refBpe(wordFreq, 8))
  }

  test("bpeTrainBatched: batchSize=1 equals the exact trainer; batched merges stay exact-count and disjoint") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainBatched(docs, "text", 5, batchSize = 1) ==
      TextOps.bpeTrain(docs, "text", 5))
    val gen = (0 until 40).map { i =>
      (i.toLong, (0 until 6).map(j =>
        s"${('a' + (i * 7 + j) % 5).toChar}" * ((i + j) % 3 + 1) +
        s"${('a' + (i * 3 + j) % 4).toChar}").mkString(" "))
    }.toDF("doc_id", "text")
    assert(TextOps.bpeTrainBatched(gen, "text", 8, batchSize = 1) ==
      TextOps.bpeTrain(gen, "text", 8))
    // batched mode: requested count honored, every batch's accepted
    // pairs have pairwise-disjoint symbols (the exact-count invariant)
    val batched = TextOps.bpeTrainBatched(gen, "text", 8, batchSize = 4)
    assert(batched.size == 8)
    assert(batched.map(_._1).distinct.size == 8)
  }

  test("bpeTrainBatched: every accepted merge's recorded count is EXACT under sequential replay (the per-round pair-stat oracle)") {
    // The disjointness rule claims each accepted pair's round-start
    // count equals its true count at the moment it is applied (earlier
    // in-batch merges can't create or destroy its adjacencies). Verify
    // the claim, don't trust it: replay the batched merge list one
    // merge at a time through an independent plain-Scala state and
    // recount each pair just before applying it.
    val texts = (0 until 40).map { i =>
      (0 until 6).map(j => s"${('a' + (i * 7 + j) % 5).toChar}" * ((i + j) % 3 + 1) +
        s"${('a' + (i * 3 + j) % 4).toChar}").mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wordFreq = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    for (bs <- Seq(2, 4)) {
      val merges = TextOps.bpeTrainBatched(docs, "text", 8, batchSize = bs)
      assert(merges.size == 8)
      var vocab: Map[Vector[String], Long] = wordFreq
        .map { case (w, f) => (w.map(_.toString).toVector, f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      for ((pair, cnt) <- merges) {
        val Array(a, b) = pair.split(" ", 2)
        val trueCnt = vocab.iterator.map { case (syms, f) =>
          f * (0 until syms.size - 1).count(i => syms(i) == a && syms(i + 1) == b)
        }.sum
        assert(trueCnt == cnt,
          s"batchSize=$bs: merge '$pair' recorded $cnt but replay counts $trueCnt")
        vocab = vocab.toSeq.map { case (syms, f) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (nb.nonEmpty && nb.last == a && s == b) nb(nb.size - 1) = a + b
            else nb += s
          (nb.toVector, f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
  }

  test("fused shingle-set kernel equals the composed HOF pipeline (incl. whitespace edges)") {
    val edge = Seq(
      "a b c d", "  leading spaces a b c", "trail b c d   ",
      "multi   space  a b c", "a\tb c d e", // tab stays inside a token
      "a b", "", "   ", "x y z x y z x y z" // dup shingles
    )
    val rand = (1L to 60L).map { i =>
      (0 until (i % 11).toInt).map(t => s"w${(i * 13 + t * 5) % 17}")
        .mkString(if (i % 3 == 0) "  " else " ")
    }
    val df = (edge ++ rand).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.shingleSet(col("text")).as("s")).orderBy("doc_id")
      .collect().map(_.getSeq[String](1))
    val want = df.select(col("doc_id"),
        TextOps.shingleSetComposed(col("text")).as("s")).orderBy("doc_id")
      .collect().map(_.getSeq[String](1))
    assert(got.toSeq == want.toSeq)
    // the positional (duplicates-kept) variant against ITS composed form
    val gotL = df.select(col("doc_id"),
        TextOps.shingleList(col("text"), 3).as("s")).orderBy("doc_id")
      .collect().map(_.getSeq[String](1))
    val wantL = df.select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("s")).orderBy("doc_id")
      .collect().map(_.getSeq[String](1))
    assert(gotL.toSeq == wantL.toSeq)
  }

  test("fused minhash kernel equals the unfused explode/groupBy formulation") {
    // random-ish docs incl. a too-short doc (no signature row) and
    // duplicate texts (identical signatures)
    val docs = (1L to 40L).map { i =>
      val n = (i % 13 + 1).toInt // 1..13 tokens — some below shingle size
      (i, (1 to n).map(t => s"w${(i * 7 + t * 3) % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val fused = Dedup.withMinhashSignature(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val unfused = Dedup.withMinhashSignatureUnfused(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fused.nonEmpty && fused == unfused)
  }

  test("chunk: overlap stitches back to the original; every doc yields a chunk") {
    val doc = (1 to 150).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id").collect()
    val c1 = out.filter(_.getLong(0) == 1L).map(_.getString(2))
    // 150 tokens, stride 48: chunks at 0, 48, 96 → ceil((150-64)/48)+1 = 3
    assert(c1.length == 3)
    // dropping the first `overlap` tokens of every later chunk and
    // concatenating reconstructs the document exactly
    val stitched = (c1.head +: c1.tail.map(_.split(" ").drop(16).mkString(" ")))
      .mkString(" ")
    assert(stitched == doc)
    // short and empty docs still yield exactly one chunk
    assert(out.filter(_.getLong(0) == 2L).map(r =>
      (r.getString(2), r.getLong(3))).toSeq == Seq(("a b", 2L)))
    assert(out.filter(_.getLong(0) == 3L).map(r =>
      (r.getString(2), r.getLong(3))).toSeq == Seq(("", 0L)))
  }

  test("lmScore: common-token docs outscore rare-token gibberish; quantization exact") {
    val docs = ((1 to 20).map(i => (i.toLong, "the cat sat")) :+
      (99L, "zxq glorp wibble")).toDF("doc_id", "text")
    val out = TextOps.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // every common token appears 20×: floor(log2 20) = 4, mass 12, score 4.0
    assert(out(1L) == ((3L, 12L, 4.0)))
    // gibberish tokens appear once: floor(log2 1) = 0 ⇒ the filter floor
    assert(out(99L) == ((3L, 0L, 0.0)))
    assert(out(99L)._3 < out(1L)._3)
  }

  test("temperatureMixSqrt: smallest source kept whole, larger damped to sqrt share") {
    // sizes 100 and 400: rates are exactly 1.0 and sqrt(100/400) = 0.5
    val docs = ((1 to 100).map(i => (i.toLong, "small")) ++
      (101 to 500).map(i => (i.toLong, "big"))).toDF("doc_id", "source")
    val kept = graft.ops.Sample.temperatureMixSqrt(
        docs, col("doc_id"), col("source"), seed = "t")
      .select("doc_id", "source", "keep_rate").collect()
    val bySrc = kept.groupBy(_.getString(1))
    assert(bySrc("small").length == 100, "smallest source must be kept whole")
    assert(bySrc("small").forall(_.getDouble(2) == 1.0))
    assert(bySrc("big").forall(_.getDouble(2) == 0.5))
    // deterministic md5 filter at rate 0.5 over 400 keys: binomial
    // mean 200, sd 10 — a fixed outcome, gated at ±5 sd
    val nBig = bySrc("big").length
    assert(math.abs(nBig - 200) <= 50, s"big-source kept count $nBig far from 200")
    // replayable: the same seed gives the identical sample
    val again = graft.ops.Sample.temperatureMixSqrt(
        docs, col("doc_id"), col("source"), seed = "t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_.getLong(0)).toSet)
  }

  test("assignNearest: each centroid's own vector lands in its cluster at cosine 1") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (5L, Seq(0.9f, 0.1f, 0.0f)),  // near cluster 0
      (6L, Seq(0.1f, 0.9f, 0.0f))   // near cluster 1
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val out = Similarity.assignNearest(vecs, cents).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 0L), (1L, 1L), (5L, 0L), (6L, 1L)))
    assert(out(0)._3 === 1.0 && out(1)._3 === 1.0)
  }

  test("semDedup: lowest id in each near-dup group kept; cross-cluster twins both survive") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),        // centroid 0
      (1L, Seq(0.0f, 1.0f)),        // centroid 1
      (4L, Seq(2.0f, 0.0f)),        // dup of 0 (cosine 1) in cluster 0
      (7L, Seq(3.0f, 0.01f)),       // near-dup in cluster 0, higher id
      (9L, Seq(0.0f, 5.0f))         // dup of 1, but lives in cluster 1
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val out = Similarity.semDedup(vecs, cents, threshold = 0.99)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, true),   // first of the cluster-0 dup group
      (1L, 1L, true),   // first of the cluster-1 dup group
      (4L, 0L, false), (7L, 0L, false),
      (9L, 1L, false)))
  }

  test("kmeans: planted clusters recovered, centroids at the exact quantized means") {
    // two tight planted clusters; seeds (ids 0,1) start one in each
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.2f)), (4L, Seq(0.6f, 0.4f)),
      (1L, Seq(0.0f, 1.0f)), (3L, Seq(0.2f, 0.8f)), (5L, Seq(0.4f, 0.6f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(vecs, k = 2, iters = 3)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(cents.map(_._1).toSeq == Seq(0L, 1L))
    // fixpoint means of {(1,0),(.8,.2),(.6,.4)} and {(0,1),(.2,.8),(.4,.6)}
    assert(cents(0)._2 == Seq(0.8, 0.2))
    assert(cents(1)._2 == Seq(0.2, 0.8))
  }

  test("kmeans: empty cluster keeps its previous centroid") {
    // every vector lies on one ray ⇒ cosine 1 to BOTH centroids for
    // all of them, tie-break sends all to cluster 0, cluster 1 goes
    // empty and must retain its seed centroid (the Lloyd fallback)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)),
      (2L, Seq(3.0f, 0.0f)), (3L, Seq(4.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(vecs, k = 2, iters = 2)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(cents(0)._2 == Seq(2.5, 0.0), "cluster 0 mean wrong")
    assert(cents(1)._2 == Seq(2.0, 0.0), "empty cluster lost its centroid")
  }

  test("canonicalize collapses case/space/punct variants; raw exact dedup provably misses them") {
    // three surface variants of one content + one genuinely different doc
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "The  Quick   Brown Fox!!"),
      (3L, "  the quick, brown fox.  "),
      (4L, "a different document")
    ).toDF("doc_id", "text")
    val canon = Dedup.exactCanonical(docs, "doc_id", "text").collect()
    assert(canon.length == 2, "canonical dedup must find 2 groups")
    assert(canon.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 3L), (4L, 1L)))
    // the un-canonicalized twin finds NO duplicates on the same corpus
    val raw = Dedup.exact(docs, "doc_id", "text").collect()
    assert(raw.length == 4, "raw exact dedup must see 4 distinct texts")
    // canonicalize semantics: lowercase, strip punct/non-ascii, collapse ws
    val c = docs.filter(col("doc_id") === 2)
      .select(TextOps.canonicalize(col("text"))).head().getString(0)
    assert(c == "the quick brown fox")
  }

  test("temperatureMixQuantized: rate within one grid step below pow, min source whole, rational T") {
    val docs = ((1 to 100).map(i => (i.toLong, "s1")) ++
      (101 to 400).map(i => (i.toLong, "s2")) ++
      (401 to 1300).map(i => (i.toLong, "s3"))).toDF("doc_id", "source")
    val sizes = Map("s1" -> 100.0, "s2" -> 300.0, "s3" -> 900.0)
    for ((tn, td) <- Seq((3, 1), (3, 2), (4, 1), (1, 1))) {
      val kept = graft.ops.Sample.temperatureMixQuantized(
          docs, col("doc_id"), col("source"), seed = "tq",
          tNum = tn, tDen = td)
        .select("source", "keep_rate").distinct().collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
      // smallest source: rate exactly 1.0 (t = 2^32 exactly)
      assert(kept("s1") == 1.0, s"T=$tn/$td smallest source rate ${kept("s1")}")
      for ((s, n) <- sizes) {
        val real = math.pow(100.0 / n, td.toDouble / tn)
        val q = kept(s)
        // quantized rate is the floor on the 2^-32 grid: within one
        // grid step at or below the true pow rate
        assert(q <= real + 1e-15 && real - q < 2.0 / 4294967296.0,
          s"T=$tn/$td source $s quantized $q vs real $real")
      }
    }
    // replayable: same seed, same sample
    val a = graft.ops.Sample.temperatureMixQuantized(
      docs, col("doc_id"), col("source"), "tq", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Sample.temperatureMixQuantized(
      docs, col("doc_id"), col("source"), "tq", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // empty input flows through as an empty result (same as the sqrt
    // face), not an empty.min crash
    val none = graft.ops.Sample.temperatureMixQuantized(
      docs.filter(lit(false)), col("doc_id"), col("source"), "tq", 3)
    assert(none.columns.contains("keep_rate") && none.count() == 0)
  }

  test("knnGraphMultiProbe: probes=1 == knnGraph; more probes never rank worse edges") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getDouble(4)))
        .toSeq
    val single = edges(Similarity.knnGraph(emb, cents, k = 3))
    val mp1 = edges(Similarity.knnGraphMultiProbe(emb, cents, k = 3, probes = 1))
    assert(mp1 == single && mp1.nonEmpty)
    // probes=2 candidates are a superset: at every (vector, rank) the
    // selected edge's cosine can only improve
    val mp2 = Similarity.knnGraphMultiProbe(emb, cents, k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(4)).toMap
    val worse = single.filter { case (v, rank, _, cos) =>
      mp2.get((v, rank)).exists(_ < cos) }
    assert(worse.isEmpty, s"multi-probe lost edges: $worse")
  }

  // ---- independent plain-Scala replica of Unigram's Viterbi-EM
  // trainer (no Spark; same seed/tie-break/prune/smoothing recipe,
  // same quantized-integer scoring — qlog2 reimplemented from its
  // square-and-shift spec, not imported) ----
  private def refQlog2(n: Long): Long = {
    require(n > 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = n.toDouble / (1L << e).toDouble
    var acc = e.toLong
    for (_ <- 0 until 16) {
      val y = x * x
      if (y >= 2.0) { acc = acc * 2 + 1; x = y / 2 }
      else { acc = acc * 2; x = y }
    }
    acc
  }
  private def refU8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < math.min(x.length, y.length)) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
  private def refPieceOrd(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && refU8Less(a._1, b._1))
  private def refQlogProbs(m: Map[String, Long], unit: Long): Map[String, Long] = {
    val adj = m.map { case (p, c) =>
      p -> (if (p.length == 1) c + unit else c) }
    val qt = refQlog2(adj.values.sum)
    adj.map { case (p, c) => p -> (refQlog2(c) - qt) }
  }
  private def refWordsAndSeeds(docs: Seq[String], vocabSize: Int,
      maxPieceLen: Int, seedMultiplier: Int)
      : (Map[String, Long], Seq[(String, Long)], Seq[(String, Long)], Int) = {
    val words: Map[String, Long] = docs
      .flatMap(_.trim.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val subCounts = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    words.foreach { case (w, wf) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(w.length, i + maxPieceLen))
        subCounts(w.substring(i, j)) += wf
    }
    val (charSeeds, multiSeeds) = subCounts.toSeq.partition(_._1.length == 1)
    val nTarget = math.max(0, vocabSize - charSeeds.length)
    val topMulti = multiSeeds.sortWith(refPieceOrd)
      .take(nTarget * seedMultiplier)
    (words, charSeeds, topMulti, nTarget)
  }
  private def plainUnigramTrain(docs: Seq[String], vocabSize: Int,
      iters: Int, maxPieceLen: Int,
      seedMultiplier: Int = 4): Seq[(String, Long, Long)] = {
    val NegQ = -(1L << 61)
    val (words, charSeeds, topMulti, nTarget) =
      refWordsAndSeeds(docs, vocabSize, maxPieceLen, seedMultiplier)
    var counts: Map[String, Long] = (charSeeds ++ topMulti).toMap
    def viterbi(w: String, lp: Map[String, Long]): List[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(NegQ)
      val back = Array.fill(n + 1)(-1)
      best(0) = 0L
      for (i <- 1 to n; j <- math.max(0, i - maxPieceLen) until i) {
        val cand = best(j) + lp.getOrElse(w.substring(j, i), NegQ)
        if (cand > best(i)) { best(i) = cand; back(i) = j }
      }
      var p = n
      val ps = scala.collection.mutable.ListBuffer[String]()
      while (p > 0) { val b = back(p); w.substring(b, p) +=: ps; p = b }
      ps.toList
    }
    for (round <- 1 to iters) {
      val lp = refQlogProbs(counts, 1L)
      val seg = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      words.foreach { case (w, wf) =>
        viterbi(w, lp).foreach(p => seg(p) += wf) }
      val chars = counts.keySet.filter(_.length == 1).map(p => p -> seg(p))
      val multisNow = counts.keySet.filter(_.length > 1)
        .map(p => p -> seg(p)).filter(_._2 > 0L).toSeq
      val keep = math.max(nTarget,
        if (round == iters) nTarget else (multisNow.size * 6) / 10)
      counts = (chars ++
        multisNow.sortWith(refPieceOrd).take(keep)).toMap
    }
    val lp = refQlogProbs(counts, 1L)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortWith((a, b) => refPieceOrd((a._1, a._2), (b._1, b._2)))
  }

  // soft-EM replica: same seed/prune/smoothing as the hard replica,
  // E-step = forward-backward expected counts in the same
  // block-floating-point integer arithmetic as Unigram.trainSoft
  // (30-bit mantissas, align-truncate add, shift-and-divide
  // posterior quantized to 2^20 units) — reimplemented from spec
  private def plainUnigramTrainSoft(docs: Seq[String], vocabSize: Int,
      iters: Int, maxPieceLen: Int,
      seedMultiplier: Int = 4): Seq[(String, Long, Long)] = {
    val S2 = 1L << 20
    type B = (Long, Int) // (mantissa, exponent); m = 0 or m in [2^29, 2^30)
    def norm(m0: Long, e0: Int): B =
      if (m0 == 0L) (0L, 0)
      else {
        val s = (64 - java.lang.Long.numberOfLeadingZeros(m0)) - 30
        (if (s >= 0) m0 >> s else m0 << -s, e0 + s)
      }
    def bmul(a: B, b: B): B =
      if (a._1 == 0L || b._1 == 0L) (0L, 0)
      else norm(a._1 * b._1, a._2 + b._2)
    // order-free k-ary add: align every term to the max exponent,
    // sum mantissas, renormalize once (matches Unigram.bSum)
    def bsum(ts: Seq[B]): B = {
      val zf = ts.filter(_._1 != 0L)
      if (zf.isEmpty) (0L, 0)
      else {
        val emax = zf.map(_._2).max
        norm(zf.map(x => x._1 >> math.min(emax - x._2, 62)).sum, emax)
      }
    }
    def bdiv(c: Long, ct: Long): B = {
      val (mc, ec) = norm(c, 0)
      val (mt, et) = norm(ct, 0)
      norm((mc << 29) / mt, ec - et - 29)
    }
    val one: B = (1L << 29, -29)
    val (words, charSeeds, topMulti, nTarget) =
      refWordsAndSeeds(docs, vocabSize, maxPieceLen, seedMultiplier)
    var counts: Map[String, Long] =
      (charSeeds ++ topMulti).map { case (p, c) => p -> c * S2 }.toMap
    def probs(m: Map[String, Long]): Map[String, B] = {
      val adj = m.map { case (p, c) =>
        p -> (if (p.length == 1) c + S2 else c) }
      val total = adj.values.sum
      adj.map { case (p, c) => p -> bdiv(c, total) }
    }
    for (round <- 1 to iters) {
      val pr = probs(counts)
      val seg = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      words.foreach { case (w, wf) =>
        val n = w.length
        val arcs = for (i <- 1 to n;
                        j <- math.max(0, i - maxPieceLen) until i;
                        p <- pr.get(w.substring(j, i))) yield (i, j, p)
        val alpha = Array.fill[B](n + 1)((0L, 0))
        alpha(0) = one
        for (i <- 1 to n)
          alpha(i) = bsum(arcs.collect { case (`i`, j, p) => bmul(alpha(j), p) })
        val beta = Array.fill[B](n + 1)((0L, 0))
        beta(n) = one
        for (pp <- n - 1 to 0 by -1)
          beta(pp) = bsum(arcs.collect { case (i, `pp`, p) => bmul(p, beta(i)) })
        val z = alpha(n)
        for ((i, j, p) <- arcs) {
          val num = bmul(bmul(alpha(j), p), beta(i))
          val q =
            if (num._1 == 0L || z._1 == 0L) 0L
            else {
              val t = num._2 - z._2 + 20
              if (t >= 0) (num._1 << math.min(t, 33)) / z._1
              else if (-t > 33) 0L
              else num._1 / (z._1 << -t)
            }
          if (q != 0L) seg(w.substring(j, i)) += q * wf
        }
      }
      val chars = counts.keySet.filter(_.length == 1).map(p => p -> seg(p))
      val multisNow = counts.keySet.filter(_.length > 1)
        .map(p => p -> seg(p)).filter(_._2 > 0L).toSeq
      val keep = math.max(nTarget,
        if (round == iters) nTarget else (multisNow.size * 6) / 10)
      counts = (chars ++
        multisNow.sortWith(refPieceOrd).take(keep)).toMap
    }
    val lp = refQlogProbs(counts, S2)
    counts.toSeq.map { case (p, c) => (p, c, lp(p)) }
      .sortWith((a, b) => refPieceOrd((a._1, a._2), (b._1, b._2)))
  }

  test("unigram trainSoft == independent plain-Scala forward-backward EM") {
    import graft.ops.Unigram
    val docs =
      Seq.fill(6)("interest internal international internet") ++
      Seq.fill(4)("station nation nationalism rational") ++
      Seq.fill(3)("the cat sat on the mat") ++
      Seq("zq")
    val got = Unigram.trainSoft(docs.toDF("text"), "text",
      vocabSize = 40, iters = 3, maxPieceLen = 5)
    val want = plainUnigramTrainSoft(docs, vocabSize = 40, iters = 3,
      maxPieceLen = 5)
    assert(got == want)
    // soft EM spreads mass across ALL segmentations: some piece's
    // expected count must be a non-integer number of units (a pure
    // Viterbi count is always a whole-occurrence multiple of 2^20)
    assert(got.exists { case (_, c, _) => c % (1L << 20) != 0L },
      "no fractional expected counts — this is not a soft E-step")
  }

  test("unigram encode: Viterbi picks the higher-probability segmentation") {
    import graft.ops.Unigram
    // quantized log2-probs (2^-16-bit units): ab ≈ .4, a/b/c ≈ .2 —
    // "ab" as one piece beats "a"+"b"
    val model = Seq(
      "ab" -> -86633L, "a" -> -152169L,
      "b" -> -152169L, "c" -> -152169L)
    val out = Seq("abc ab cab").toDF("text")
      .select(Unigram.encode(col("text"), model, maxPieceLen = 2).as("e"))
      .head().getSeq[Seq[String]](0)
    // "abc": ab+c (log .4 + log .2) beats a+b+c; "cab": c+ab likewise
    assert(out == Seq(Seq("ab", "c"), Seq("ab"), Seq("c", "ab")))
  }

  test("unigram train == independent plain-Scala Viterbi-EM; stems learned; encode compresses") {
    import graft.ops.Unigram
    val docs =
      Seq.fill(6)("interest internal international internet") ++
      Seq.fill(4)("station nation nationalism rational") ++
      Seq.fill(3)("the cat sat on the mat") ++
      Seq("zq")
    val df = docs.toDF("text")
    val got = Unigram.train(df, "text", vocabSize = 40, iters = 3,
      maxPieceLen = 5)
    val want = plainUnigramTrain(docs, vocabSize = 40, iters = 3,
      maxPieceLen = 5)
    assert(got == want)
    val pieces = got.map(_._1).toSet
    // every single char survives; a shared stem earned a slot
    assert("interna".forall(c => pieces.contains(c.toString)))
    assert(pieces.exists(p => p.length >= 3 && "international".contains(p)),
      s"no stem learned: $pieces")
    // the trained model compresses: fewer pieces than chars
    val enc = df.select(
        Unigram.encode(col("text"), got.map(t => (t._1, t._3)), 5).as("e"))
      .select(explode(col("e")).as("w"))
      .select(size(col("w")).as("np"),
        length(concat_ws("", col("w"))).as("nc"))
      .agg(sum("np"), sum("nc")).head()
    assert(enc.getLong(0) < enc.getLong(1),
      s"no compression: ${enc.getLong(0)} pieces vs ${enc.getLong(1)} chars")
    // corpus-scale face == column face, order preserved
    val ided = df.withColumn("doc_id", monotonically_increasing_id())
    val viaDocs = Unigram.encodeDocs(ided, "doc_id", "text",
        got.map(t => (t._1, t._3)), 5)
      .orderBy("doc_id").collect()
      .map(_.getSeq[Seq[String]](1)).toSeq
    val viaCol = ided.orderBy("doc_id")
      .select(Unigram.encode(col("text"), got.map(t => (t._1, t._3)), 5))
      .collect().map(_.getSeq[Seq[String]](0)).toSeq
    assert(viaDocs == viaCol)
  }

  // ---- independent plain-Scala replica of Classify's integer
  // fixed-point hard-sigmoid trainer (no Spark, no SQL) ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hval(tok: String): Long =
    java.lang.Long.parseLong(md5hex("w|" + tok).substring(0, 8), 16)

  private def plainTrain(docs: Seq[(Long, String)], buckets: Int,
      iters: Int): Array[Long] = {
    val s4 = 4L << 16
    val s8 = 8L << 16
    val toks = docs.map { case (_, t) =>
      t.trim.split(" ", -1).toSeq.filter(_.nonEmpty) }
    val labels = toks.map(ts =>
      if (ts.map(t => hval(t) % 2001 - 1000).sum > 0) 1L else 0L)
    val feats: Seq[Map[Long, Long]] = toks.map(ts =>
      ts.groupBy(t => hval(t) % buckets).map { case (b, g) =>
        b -> g.size.toLong })
    val k = 8L * docs.size
    var w = Array.fill(buckets)(0L)
    for (_ <- 1 to iters) {
      val grads = Array.fill(buckets)(0L)
      feats.zip(labels).foreach { case (f, y) =>
        val z = f.map { case (b, c) => c * w(b.toInt) }.sum
        val rn = math.max(0L, math.min(s8, s4 + z)) - s8 * y
        f.foreach { case (b, c) => grads(b.toInt) += rn * c }
      }
      w = w.zipWithIndex.map { case (wv, b) =>
        wv - Math.floorDiv(grads(b), k) }
    }
    w
  }

  test("trainHashedLogistic == independent plain-Scala trainer; model beats base rate") {
    // one dominant token per doc (repeated), plus noise tokens — the
    // learnable structure: a bucket's weight should converge to the
    // majority stand-in-score sign of the tokens hashing into it
    val docs = (0 until 80).map { i =>
      val main = s"tok$i " * (5 + i % 7)
      val noise = s"x${i % 11} y${i % 13}"
      (i.toLong, main + noise)
    }
    val df = docs.toDF("doc_id", "text")
    val label = TextOps.hashedLinearScore(TextOps.tokens(col("text"))) > 0
    val got = graft.ops.Classify.trainHashedLogistic(
      df, "doc_id", "text", label, buckets = 64, iters = 3)
    val want = plainTrain(docs, buckets = 64, iters = 3)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_ != 0L), "training moved no weight at all")
    // the learned model predicts its own supervision labels better
    // than the always-majority baseline
    val scored = graft.ops.Classify.scoreHashedLogistic(
        df, "doc_id", "text", got, 64)
      .join(df.select(col("doc_id"), label.as("y")), Seq("doc_id"))
      .select((col("keep") === col("y")).cast("int").as("hit"),
        col("y").cast("int").as("yi"))
      .collect()
    val acc = scored.map(_.getInt(0)).sum.toDouble / scored.length
    val pos = scored.map(_.getInt(1)).sum.toDouble / scored.length
    val baseRate = math.max(pos, 1 - pos)
    assert(acc > baseRate && acc >= 0.7,
      s"no learning: accuracy $acc vs base rate $baseRate")
  }

  test("hashedLogisticMargin expression == join-based scorer on every doc") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"tok$i x${i % 5} tok${i % 7} y${i % 3}"))
      .toDF("doc_id", "text")
    val label = TextOps.hashedLinearScore(TextOps.tokens(col("text"))) > 0
    val w = graft.ops.Classify.trainHashedLogistic(
      docs, "doc_id", "text", label, buckets = 32, iters = 2)
    val viaJoin = graft.ops.Classify.scoreHashedLogistic(
        docs, "doc_id", "text", w, 32)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val viaExpr = docs.select(col("doc_id"),
        graft.ops.Classify.hashedLogisticMargin(
          TextOps.tokens(col("text")), w, 32).as("z"))
      .withColumn("keep", col("z") > 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(viaExpr == viaJoin && viaExpr.nonEmpty)
  }

  test("trainHashedLogistic: token-less docs count in N but move no gradient") {
    val withEmpty = Seq((1L, "aa aa aa"), (2L, "   "), (3L, "bb bb")).toDF("doc_id", "text")
    val label = TextOps.hashedLinearScore(TextOps.tokens(col("text"))) > 0
    val w = graft.ops.Classify.trainHashedLogistic(
      withEmpty, "doc_id", "text", label, buckets = 8, iters = 2)
    val want = plainTrain(
      Seq((1L, "aa aa aa"), (2L, "   "), (3L, "bb bb")), 8, 2)
    assert(w.toSeq == want.toSeq)
    // scoring the empty doc yields margin 0, keep = false
    val empty = graft.ops.Classify.scoreHashedLogistic(
        withEmpty, "doc_id", "text", w, 8)
      .filter(col("doc_id") === 2L).head()
    assert(empty.getLong(1) == 0L && !empty.getBoolean(2))
  }

  test("unigram seedCandidates: engine-side top-k == full-collect reference, driver rows bounded by the seed budget") {
    import graft.ops.Unigram
    // vocabulary with a BIG substring universe relative to the seed
    // budget: 400 distinct words of length 8 over 26 letters
    val rnd = new scala.util.Random(0x5eedL)
    val docs = (1 to 400).map(_ =>
      (1 to 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")
    val words = Unigram.wordTable(Seq(docs).toDF("text"), "text")
      .localCheckpoint()
    val vocabSize = 40
    val mult = 4
    val (chars, multi) = Unigram.seedCandidates(words, 6, vocabSize, mult)
    // reference: the old formulation — collect EVERYTHING, sort, take
    val all = Unigram.substringCounts(words, 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (refChars, refMulti) = all.partition(_._1.length == 1)
    val nTarget = math.max(0, vocabSize - refChars.length)
    val refTop = refMulti.sortBy { case (p, c) => (-c, p) }
      .take(nTarget * mult)
    assert(chars.toMap == refChars.toMap, "char seeds differ")
    assert(multi.sortBy { case (p, c) => (-c, p) }.toSeq == refTop.toSeq,
      "engine-side top-k selected a different multi-char seed set")
    // the scale contract: collected rows are seed-budget-sized even
    // though the substring universe is ~50x larger
    val budget = refChars.length + nTarget * mult
    assert(chars.length + multi.length <= budget)
    assert(all.length > 10 * budget,
      s"test corpus too small to exercise the bound (universe ${all.length} vs budget $budget)")
    // and the selection plans the per-partition top-k, not a global sort
    val plan = Unigram.substringCounts(words, 6)
      .filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(nTarget * mult)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit should plan TakeOrderedAndProject:\n$plan")
  }
}
