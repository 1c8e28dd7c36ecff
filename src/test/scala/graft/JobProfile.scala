package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-JOB decomposition of a catalog face's driver job chain — the
  * measurement behind the round-17 mutation-face optimization: a
  * ForgetStore ingest/forget costs what its SEQUENTIAL job chain
  * costs (bench_floor.json shows build ≫ exec for every mutation
  * face), so the lever is fewer/cheaper jobs, and this harness shows
  * exactly which jobs those are.
  *
  * Usage: Test/runMain graft.JobProfile q_ingest_snapshot[,name...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  * Prints one line per Spark job (start-offset, duration, #stages,
  * callsite) plus the wall total; prestage hooks run untimed, as in
  * Bench. Test tree like [[Probe]]: measurement harness, not engine.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(sys.error("usage: JobProfile q_name[,q_name...]"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROFILE_CONF="k=v;k=v" — session-conf overrides for
    // A/B experiments (e.g. AQE on/off) without touching face code
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    final case class J(id: Int, t0: Long, var t1: Long = -1L,
      var stages: Int = 0, var site: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val j = J(js.jobId, System.nanoTime())
        j.stages = js.stageInfos.size
        j.site = Option(js.properties).map { p =>
          Seq("callSite.short", "spark.job.description",
            "spark.sql.execution.id")
            .flatMap(k => Option(p.getProperty(k)).map(v =>
              v.linesIterator.next().take(80)))
            .mkString(" | ")
        }.getOrElse("")
        jobs.put(js.jobId, j); order.add(js.jobId); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = System.nanoTime())
      }
    })

    // optional per-stage task-skew stats (SPARK_GRAFT_PROFILE_STAGES=1):
    // max vs median task duration per stage — the §2.5 skew signal —
    // plus task counts and shuffle-read bytes, for the exec-bound faces
    // where the job chain alone says nothing
    if (sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")) {
      val taskDur = new java.util.concurrent.ConcurrentHashMap[
        Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          taskDur.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(Option(te.taskInfo).map(_.duration).getOrElse(0L))
          ()
        }
        override def onStageCompleted(
            sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          import scala.jdk.CollectionConverters._
          val ds = Option(taskDur.get(si.stageId))
            .map(_.asScala.toSeq.sorted).getOrElse(Nil)
          if (ds.nonEmpty && ds.max >= 200) {
            val med = ds(ds.length / 2)
            val sr = si.taskMetrics.shuffleReadMetrics.totalBytesRead
            val sw = si.taskMetrics.shuffleWriteMetrics.bytesWritten
            println(f"    stage ${si.stageId}%4d tasks=${ds.length}%3d " +
              f"med=${med}ms max=${ds.max}ms shufR=${sr / 1024}KB " +
              f"shufW=${sw / 1024}KB  ${si.name.take(60)}")
          }
        }
      })
    }

    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator(n)
      }.fold(0L)(_ + _)

    // one warm pass (JIT + codegen) at the smallest SF, like Bench
    names.foreach { n =>
      try {
        graft.queries.Catalog.prestages.get(n)
          .foreach(_(spark, "/root/testdata/sf0.001"))
        force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      } catch { case _: Throwable => () }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try graft.queries.Catalog.prestages.get(name)
        .foreach(_(spark, sfDir))
      catch { case t: Throwable =>
        System.err.println(s"[profile] prestage($name) failed: $t") }
      jobs.clear(); order.clear()
      val w0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val wBuild = System.nanoTime()
      val rows = force(df)
      val w1 = System.nanoTime()
      println(f"== $name rows=$rows build=${(wBuild - w0) / 1e9}%.3f exec=${(w1 - wBuild) / 1e9}%.3f total=${(w1 - w0) / 1e9}%.3f s")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
      val gaps = js.sliding(2).collect {
        case Seq(a, b) if b.t0 > a.t1 && a.t1 > 0 => (b.t0 - a.t1) / 1e9
      }.sum
      js.foreach { j =>
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        println(f"  job ${j.id}%4d  +${(j.t0 - w0) / 1e9}%7.3f  ${dur}%7.3f s  stages=${j.stages}%2d  ${j.site}")
      }
      println(f"  -- ${js.size} jobs, sum=${js.map(j => if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else 0.0).sum}%.3f s, inter-job gaps=${gaps}%.3f s")
    }
    spark.stop()
  }
}
