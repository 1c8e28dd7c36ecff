package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The closed-form moment expressions in q_stats_moments / q_zscore
  * (exact-decimal power sums → fixed IEEE tree) must agree with
  * Spark's own streaming-moment aggregates (var_pop, stddev_pop,
  * corr) to floating tolerance — same math, different summation
  * order, so exact equality is NOT expected (that's the whole reason
  * the queries use power sums: Welford accumulation order varies with
  * partitioning, power sums don't).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("closed-form moments agree with Spark var_pop/stddev_pop/corr") {
    // ts_ms is ORIGIN-SHIFTED, exactly like q_stats_moments shifts the
    // epoch: with raw ~1.7e12 epochs the closed form n·Σt² − (Σt)²
    // cancels catastrophically in double (that's why the query shifts)
    val df = (1 to 4).flatMap { g =>
      (1 to 200).map { i =>
        val x = ((i * 37 + g * 11) % 500) / 100.0 + 0.01
        val t = i * 1000L + g
        (s"g$g", x, t)
      }
    }.toDF("grp", "value", "ts_ms")

    val x = col("value").cast("decimal(12,2)")
    val t = col("ts_ms").cast("decimal(19,0)")
    val ours = df.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(x * x).cast("double").as("sxx"),
        sum(t).cast("double").as("st"), sum(t * t).cast("double").as("stt"),
        sum(x * t).cast("double").as("sxt"))
      .select(col("grp"),
        ((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n").cast("double") * col("n"))).as("var_v"),
        ((col("n") * col("sxt") - col("sx") * col("st")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("stt") - col("st") * col("st")))).as("corr_vt"))
    val spk = df.groupBy("grp")
      .agg(var_pop(col("value")).as("var_v"),
        corr(col("value"), col("ts_ms").cast("double")).as("corr_vt"))
    val j = ours.join(spk.withColumnRenamed("var_v", "var_s")
      .withColumnRenamed("corr_vt", "corr_s"), Seq("grp")).collect()
    assert(j.length == 4)
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("var_v") - r.getAs[Double]("var_s")) < 1e-9,
        s"var mismatch in ${r.getAs[String]("grp")}")
      assert(math.abs(r.getAs[Double]("corr_vt") - r.getAs[Double]("corr_s")) < 1e-6,
        s"corr mismatch in ${r.getAs[String]("grp")}")
    }
  }

  test("z-score normalization has zero mean and unit variance per group") {
    val df = (1 to 3).flatMap { g =>
      (1 to 150).map(i => (s"t$g", i.toLong + g * 1000, ((i * 13 + g) % 300) / 100.0 + 0.5))
    }.toDF("event_type", "event_id", "value")
    val x = col("value").cast("decimal(12,2)")
    val stats = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sxx"))
      .select(col("event_type"),
        (col("sx") / col("n")).as("mean_v"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n").cast("double") * col("n"))).as("std_v"))
    val z = df.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean_v")) / col("std_v"))
    val byGrp = z.groupBy("event_type")
      .agg(avg(col("z")).as("m"), var_pop(col("z")).as("v")).collect()
    byGrp.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-9)
    }
  }

  test("median/MAD robust gate is skew-immune where mean/std is not") {
    // 20 values clustered at 10..29 plus ONE extreme point. The
    // mean/std gate at the same multiplier stops flagging the cluster
    // edge once the outlier inflates sigma; median/MAD barely move.
    val vals = (0 until 20).map(i => (i.toLong, 10.0 + i)) :+ (99L, 100000.0)
    val df = vals.toDF("id", "v")
    val med = df.agg(percentile(col("v"), lit(0.5)).as("med"))
    val dev = df.crossJoin(broadcast(med)).withColumn("dev", col("v") - col("med"))
    val mad = dev.agg(percentile(abs(col("dev")), lit(0.5)).as("mad"))
      .collect()(0).getDouble(0)
    val medV = med.collect()(0).getDouble(0)
    // median sits inside the cluster, MAD is cluster-scaled: the
    // extreme point is far outside 2.5 MAD, the cluster body is not
    assert(medV >= 10.0 && medV <= 29.0)
    assert(mad > 0 && mad < 20)
    val flagged = dev.filter(abs(col("dev")) > lit(2.5) * lit(mad))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(99L))
    // contrast: the single point inflates sigma ~1000× (std > 20k on a
    // spread-20 cluster), so the classical z of the outlier collapses
    // to ~4.6 while its robust z is ~10⁴ — one more such point and the
    // z-gate saturates; MAD does not move
    val std = df.agg(stddev_pop(col("v")).as("s")).collect()(0).getDouble(0)
    assert(std > 20000 && (100000.0 - medV) / mad > 1000)
  }
}
