package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Bars, Similarity, TextOps}

/** Unit semantics for the market-bar and corpus-analytics ops: the
  * oracle gate proves engine parity on the test corpus; these pin the
  * EDGE semantics the corpus doesn't exercise (ties, zero weights,
  * empty docs, quantization).
  */
class MarketCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ohlc: open/close tie-break on (ts, id), bucket boundaries") {
    // sym A: two ticks at the SAME ts in bucket 0 — id breaks the tie;
    // one tick exactly on the next bucket boundary goes to bucket 1000
    val df = Seq(
      ("A", 10L, 2L, 5.0), ("A", 10L, 1L, 3.0), ("A", 999L, 3L, 9.0),
      ("A", 1000L, 4L, 7.0),
      ("B", 5L, 5L, 1.0)
    ).toDF("sym", "ts_ms", "event_id", "value")
    val bars = Bars.ohlc(df, Seq("sym"), "ts_ms", "event_id", "value", 1000L)
      .orderBy("sym", "bucket_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(bars === Array(
      ("A", 0L, 3.0, 9.0, 3.0, 9.0, 3L),   // open=id1's 3.0, close=ts999's 9.0
      ("A", 1000L, 7.0, 7.0, 7.0, 7.0, 1L),
      ("B", 0L, 1.0, 1.0, 1.0, 1.0, 1L)))
  }

  test("vwap: exact weighted mean; zero-weight bucket yields NULL not NaN") {
    val df = Seq(
      ("A", 0L, 10.0, 3L), ("A", 1L, 20.0, 1L),   // (30+20)/4 = 12.5
      ("B", 0L, 5.0, 0L)                          // zero total weight
    ).toDF("sym", "ts_ms", "value", "w")
    val out = Bars.vwap(df, Seq("sym"), "ts_ms", "value", "w", 1000L)
      .orderBy("sym").collect()
    assert(out(0).getAs[Double]("vwap") === 12.5)
    assert(out(0).getAs[Long]("sum_weight") === 4L)
    assert(out(1).isNullAt(out(1).fieldIndex("vwap")))
  }

  test("ohlc: a tie-breaker outside [0, TiePack) raises instead of silently colliding") {
    val df = Seq(("A", 0L, Bars.TiePack, 1.0)) // tie == 10^6: packed ordinal
      .toDF("sym", "ts_ms", "event_id", "value") // would collide with ts+1
    val e = intercept[Exception] {
      Bars.ohlc(df, Seq("sym"), "ts_ms", "event_id", "value", 1000L).collect()
    }
    assert(e.getMessage.contains("tie-breaker out of"))
  }

  test("vwap: NULL weights (corrupt/missing props) drop from sums but count as ticks") {
    val df = Seq(
      ("A", 0L, 10.0, Some(3L)), ("A", 1L, 99.0, None), ("A", 2L, 20.0, Some(1L))
    ).toDF("sym", "ts_ms", "value", "w")
    val out = Bars.vwap(df, Seq("sym"), "ts_ms", "value", "w", 1000L).collect()
    assert(out(0).getAs[Double]("vwap") === 12.5)   // (30+20)/4 — 99.0 excluded
    assert(out(0).getAs[Long]("sum_weight") === 4L)
    assert(out(0).getAs[Long]("n_ticks") === 3L)    // but the tick IS counted
  }

  test("centroids: empty vectors contribute no rows (posexplode drop)") {
    val df = Seq((0, Seq(1.0f, 3.0f)), (0, Seq.empty[Float]))
      .toDF("label", "embedding")
    val out = Similarity.centroids(df).orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out === Array((0L, 1.0, 1L), (1L, 3.0, 1L))) // n=1: empty vec absent
  }

  test("centroids: quantized exact mean, long-form rows per (label, dim)") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(0.5f, 0.25f))
    ).toDF("label", "embedding")
    val out = Similarity.centroids(df).orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out === Array(
      (0, 0L, 2.0, 2L), (0, 1L, 1.0, 2L), (1, 0L, 0.5, 1L), (1, 1L, 0.25, 1L)))
  }

  test("centroids: partitioning cannot perturb the result (exact int sums)") {
    val vals = (0 until 64).map(i => (i % 7, Seq.tabulate(4)(d =>
      ((i * 31 + d * 17) % 997 / 997.0f) - 0.5f)))
    val one = Similarity.centroids(vals.toDF("label", "embedding").repartition(1))
      .orderBy("label", "pos").collect().map(_.getDouble(2)).toSeq
    val many = Similarity.centroids(vals.toDF("label", "embedding").repartition(13))
      .orderBy("label", "pos").collect().map(_.getDouble(2)).toSeq
    assert(one === many)
  }

  test("maskDigits/digitCount: full masking, zero-digit passthrough") {
    val out = Seq("Customer#000123", "nodigits", "9")
      .toDF("s")
      .select(TextOps.maskDigits(col("s")).as("m"),
        TextOps.digitCount(col("s")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out === Array(("Customer#######", 6), ("nodigits", 0), ("#", 1)))
  }

  test("bigrams: ordered, non-distinct; empty below 2 tokens") {
    val out = Seq("a b a b", "solo", "")
      .toDF("t")
      .select(TextOps.bigrams(TextOps.tokens(col("t"))).as("bg"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b", "b a", "a b"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("resampleFfill: per-key spine, forward fill across gaps, gap flags") {
    // key A observed at buckets 0 and 3000 — 1000/2000 are gaps filled
    // with 1.0; key B is a single bucket (spine of one, no gaps)
    val bars = Seq(("A", 0L, 1.0), ("A", 3000L, 4.0), ("B", 5000L, 9.0))
      .toDF("sym", "bucket_ms", "close")
    val out = Bars.resampleFfill(bars, Seq("sym"), "bucket_ms", 1000L, "close")
      .orderBy("sym", "bucket_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out === Array(
      ("A", 0L, 1.0, false), ("A", 1000L, 1.0, true), ("A", 2000L, 1.0, true),
      ("A", 3000L, 4.0, false), ("B", 5000L, 9.0, false)))
  }

  test("ohlc property: agrees with a brute-force reference on random ticks") {
    // deterministic pseudo-random ticks with INTENTIONAL ts collisions
    // (small time domain) — exactly where open/close tie-breaks matter
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val ticks = (0 until 200).map { i =>
        (s"S${rnd.nextInt(3)}", rnd.nextInt(40).toLong, i.toLong,
          (rnd.nextInt(999) + 1) / 10.0)
      }
      val expected = ticks.groupBy(t => (t._1, t._2 - t._2 % 10)).map {
        case ((sym, b), ts) =>
          val sorted = ts.sortBy(t => (t._2, t._3))
          (sym, b, sorted.head._4, ts.map(_._4).max, ts.map(_._4).min,
            sorted.last._4, ts.size.toLong)
      }.toSeq.sortBy(t => (t._1, t._2))
      val got = Bars.ohlc(ticks.toDF("sym", "ts_ms", "event_id", "value"),
        Seq("sym"), "ts_ms", "event_id", "value", 10L)
        .orderBy("sym", "bucket_ms").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("vwap property: agrees with a brute-force reference on random ticks") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed + 100)
      val ticks = (0 until 150).map { i =>
        (s"S${rnd.nextInt(3)}", rnd.nextInt(30).toLong,
          (rnd.nextInt(999) + 1) / 10.0, rnd.nextInt(5).toLong)
      }
      val expected = ticks.groupBy(t => (t._1, t._2 - t._2 % 10)).map {
        case ((sym, b), ts) =>
          val sw = ts.map(_._4).sum
          val vw = ts.map(t => BigDecimal(t._3) * t._4).sum
          // mirror the engine: exact decimal sums, ONE double division
          (sym, b, ts.size.toLong,
            if (sw == 0) None else Some(vw.toDouble / sw.toDouble), sw)
      }.toSeq.sortBy(t => (t._1, t._2))
      val got = Bars.vwap(ticks.toDF("sym", "ts_ms", "value", "w"),
        Seq("sym"), "ts_ms", "value", "w", 10L)
        .orderBy("sym", "bucket_ms").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
        .toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("gopher gate: flags and conjunction on boundary values") {
    val df = Seq(
      (1L, Array.fill(20)("word").mkString(" ")),      // 20 words, len 4.0 — all pass
      (2L, Array.fill(19)("word").mkString(" ")),      // too few words
      (3L, Array.fill(20)("xx").mkString(" "))         // mean len 2 < 4
    ).toDF("doc_id", "text")
    val ts = TextOps.tokens(col("text"))
    val n = size(ts)
    val out = df.select(col("doc_id"),
        n.cast("long").as("n_words"),
        (TextOps.totalTokenChars(ts).cast("double") / n).as("mwl"))
      .withColumn("flag_words", col("n_words").between(20, 90))
      .withColumn("flag_len", col("mwl").between(4.0, 5.0))
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(3) && out(0).getBoolean(4))
    assert(!out(1).getBoolean(3))
    assert(!out(2).getBoolean(4))
  }

  test("moveVol: diffs cross bucket boundaries; <2 moves yields NULL vol") {
    // sym A ticks 10, 13, 11, 11 — moves +3, -2, 0; the last tick sits
    // in bucket 1000 so its move (vs ts=2's 11.0) crosses the boundary.
    val df = Seq(
      ("A", 0L, 1L, 10.0), ("A", 1L, 2L, 13.0), ("A", 2L, 3L, 11.0),
      ("A", 1000L, 4L, 11.0),
      ("B", 0L, 5L, 5.0)                       // single tick: no moves
    ).toDF("sym", "ts_ms", "event_id", "value")
    val out = Bars.moveVol(df, Seq("sym"), "ts_ms", "event_id", "value", 1000L)
      .orderBy("sym", "bucket_ms").collect()
    // A bucket 0: n=2 (+3, -2), mean 0.5, sample var = 12.5
    assert((out(0).getString(0), out(0).getLong(1), out(0).getLong(2)) === (("A", 0L, 2L)))
    assert(out(0).getDouble(3) === 0.5)
    assert(out(0).getDouble(4) === math.sqrt(12.5))
    // A bucket 1000: one move (0.0) — mean 0, vol NULL (not NaN)
    assert(out(1).getLong(2) === 1L && out(1).getDouble(3) === 0.0)
    assert(out(1).isNullAt(4))
    // B: zero moves — NULL mean and vol
    assert(out(2).getLong(2) === 0L && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("ohlcMulti: one-scan grouping-sets bars equal per-width ohlc runs") {
    val df = Seq(
      ("A", 0L, 1L, 10.0), ("A", 400L, 2L, 13.0), ("A", 999L, 3L, 11.0),
      ("A", 1500L, 4L, 9.0), ("B", 100L, 5L, 5.0), ("B", 2100L, 6L, 6.0)
    ).toDF("sym", "ts_ms", "event_id", "value")
    val widths = Seq(1000L, 500L)
    val multi = Bars.ohlcMulti(df, Seq("sym"), "ts_ms", "event_id", "value", widths)
    val singles = widths.map { wMs =>
      Bars.ohlc(df, Seq("sym"), "ts_ms", "event_id", "value", wMs)
        .withColumn("granularity_ms", lit(wMs))
        .select("sym", "granularity_ms", "bucket_ms",
          "open", "high", "low", "close", "n_ticks", "sum_value")
    }.reduce(_ unionAll _)
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getLong(1), r.getLong(2))
    val m = multi.collect().map(r => key(r) -> r.toSeq).toMap
    val s = singles.collect().map(r => key(r) -> r.toSeq).toMap
    assert(m === s)
    assert(m.size === 4 + 5) // 4 bars at 1000ms, 5 at 500ms
  }

  test("moveVol: tick-order determinism — same-ms ties broken by id") {
    val df = Seq(
      ("A", 0L, 2L, 20.0), ("A", 0L, 1L, 10.0), ("A", 1L, 3L, 15.0)
    ).toDF("sym", "ts_ms", "event_id", "value")
    val out = Bars.moveVol(df, Seq("sym"), "ts_ms", "event_id", "value", 1000L)
      .collect()
    // ordered series is 10, 20, 15 -> moves +10, -5: mean 2.5
    assert(out(0).getLong(2) === 2L && out(0).getDouble(3) === 2.5)
  }

  test("twap: burst-robust — a same-ms quote storm cannot move the average") {
    // bucket [0, 1000): price 10 holds ms 0-499, price 20 holds 500-999
    // ⇒ twap 15 regardless of how many times each price is re-quoted.
    // A tick-count average of the bursty series would be ~10.9.
    val calm = Seq(("A", 0L, 1L, 10.0), ("A", 500L, 2L, 20.0))
    val burst = calm ++ (3L to 10L).map(i => ("A", 0L, i, 10.0))
    def twapOf(rows: Seq[(String, Long, Long, Double)]): (Double, Long, Long) = {
      val out = Bars.twap(rows.toDF("sym", "ts_ms", "event_id", "value"),
        Seq("sym"), "ts_ms", "event_id", "value", bucketMs = 1000L).collect()(0)
      (out.getAs[Double]("twap"), out.getAs[Long]("held_ms"),
        out.getAs[Long]("n_ticks"))
    }
    val (tCalm, heldCalm, nCalm) = twapOf(calm)
    val (tBurst, heldBurst, nBurst) = twapOf(burst)
    assert(tCalm === 15.0 && heldCalm === 1000L && nCalm === 2L)
    // burst re-quotes hold for 0 ms each — the average is unmoved
    assert(tBurst === 15.0 && heldBurst === 1000L && nBurst === 10L)
  }

  test("twap: coverage starts at first tick; lone tick holds to bucket end") {
    // first tick lands mid-bucket: held_ms exposes the partial span
    val out = Bars.twap(
      Seq(("A", 400L, 1L, 10.0)).toDF("sym", "ts_ms", "event_id", "value"),
      Seq("sym"), "ts_ms", "event_id", "value", bucketMs = 1000L).collect()(0)
    assert(out.getAs[Double]("twap") === 10.0)
    assert(out.getAs[Long]("held_ms") === 600L)
  }

  test("ewma: hand-computed fold, tie order by id, lone tick is its own ewma") {
    // sym A bucket 0: ordered by (ts, id) → 10, 20, 40:
    //   y0=10, y1=.875·10+.125·20=11.25, y2=.875·11.25+.125·40=14.84375
    // the two ts=5 ticks are deliberately id-inverted in input order
    val df = Seq(
      ("A", 5L, 2L, 40.0), ("A", 0L, 1L, 10.0), ("A", 5L, 1L, 20.0),
      ("B", 3L, 1L, 7.0)
    ).toDF("sym", "ts_ms", "event_id", "value")
    val out = graft.ops.Bars.ewma(df, Seq("sym"), "ts_ms", "event_id",
      "value", bucketMs = 1000L).orderBy("sym").collect()
    assert(out(0).getAs[Double]("ewma") === 14.84375)
    assert(out(0).getAs[Long]("n_ticks") === 3L)
    assert(out(1).getAs[Double]("ewma") === 7.0)
  }

  test("capPerGroup: keeps k best per group; small groups whole; total order respected") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 300L), ("s1", 3L, 300L), ("s1", 4L, 200L),
      ("s2", 5L, 50L)
    ).toDF("source", "doc_id", "n_chars")
    val out = graft.ops.Sample.capPerGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id")), k = 2)
      .orderBy("doc_id").collect().map(_.getLong(1))
    // s1 keeps the two longest (tie 300/300 → ids 2,3); s2 keeps its one
    assert(out.toSeq == Seq(2L, 3L, 5L))
  }
}
