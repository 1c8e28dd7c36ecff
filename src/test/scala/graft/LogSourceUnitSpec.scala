package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level pins for the log source's bookkeeping: segment/offset
  * math and the pro-rata admission allocation — the parts where an
  * off-by-one silently drops or re-reads records at scale.
  */
class LogSourceUnitSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("log_unit").toString

  test("offset JSON round-trips in Kafka shape, sorted by partition") {
    val off = LogOffset(Map(2 -> 7L, 0 -> 12L, 10 -> 0L))
    assert(off.json() == """{"0":12,"2":7,"10":0}""")
    assert(LogOffset.parse(off.json()) == off)
    assert(LogOffset.parse("{}") == LogOffset(Map.empty))
  }

  test("segments carry cumulative base offsets; appends name by partition end") {
    val dir = tmp()
    LogSource.append(dir, 0, Seq("a", "b", "c"))
    LogSource.append(dir, 0, Seq("d", "e"))
    LogSource.append(dir, 3, Seq("x"))
    val segs = LogSource.segments(Paths.get(dir, "p=0"))
    assert(segs.map { case (base, _, n) => (base, n) } == Seq((0L, 3L), (3L, 2L)))
    assert(LogSource.partitionEnd(Paths.get(dir, "p=0")) == 5L)
    assert(LogSource.partitionIds(dir) == Seq(0, 3))
    assert(LogSource.currentEnds(dir) == Map(0 -> 5L, 3 -> 1L))
    // a second append to p=0 must not collide with the existing bases
    LogSource.append(dir, 0, Seq("f"))
    assert(LogSource.partitionEnd(Paths.get(dir, "p=0")) == 6L)
  }

  test("admission allocates the cap pro rata to backlogs and is monotonic") {
    val dir = tmp()
    LogSource.append(dir, 0, (1 to 90).map(i => s"a$i"))
    LogSource.append(dir, 1, (1 to 10).map(i => s"b$i"))
    val stream = new LogMicroBatchStream(dir, "earliest", Some(50L))
    val limit = stream.getDefaultReadLimit
    // drive the API Spark actually calls: latestOffset(start, limit),
    // threading each planned end back as the next trigger's start —
    // the no-arg latestOffset() deliberately throws under
    // SupportsAdmissionControl (LogSource.scala)
    val start = stream.initialOffset()
    // 100-record backlog, cap 50: p0 (90%) gets ~45, p1 (10%) gets ~5,
    // total exactly the cap
    val first = stream.latestOffset(start, limit)
    val firstOff = first.asInstanceOf[LogOffset].offsets
    assert(firstOff.values.sum == 50L, firstOff.toString)
    assert(firstOff(0) >= 40L && firstOff(1) >= 1L, firstOff.toString)
    // next trigger starts from the last planned end, never replans
    // below it, and finishes the backlog
    val second = stream.latestOffset(first, limit)
    val secondOff = second.asInstanceOf[LogOffset].offsets
    assert(secondOff(0) >= firstOff(0) && secondOff(1) >= firstOff(1))
    assert(secondOff.values.sum == 100L, secondOff.toString)
    // drained: a further trigger stays put
    assert(stream.latestOffset(second, limit)
      .asInstanceOf[LogOffset].offsets == secondOff)
  }

  test("a tiny backlog on one partition still admits at least one record") {
    val dir = tmp()
    LogSource.append(dir, 0, (1 to 999).map(i => s"a$i"))
    LogSource.append(dir, 1, Seq("only"))
    val stream = new LogMicroBatchStream(dir, "earliest", Some(10L))
    val got = stream.latestOffset(stream.initialOffset(),
      stream.getDefaultReadLimit).asInstanceOf[LogOffset].offsets
    // strict proportionality would starve p1 (10 * 1/1000 rounds to 0)
    assert(got(1) == 1L, got.toString)
    assert(got.values.sum <= 10L, got.toString)
  }

  test("batch planning slices segments exactly across boundaries") {
    val dir = tmp()
    LogSource.append(dir, 0, Seq("r0", "r1", "r2"))
    LogSource.append(dir, 0, Seq("r3", "r4"))
    LogSource.append(dir, 0, Seq("r5", "r6", "r7"))
    val stream = new LogMicroBatchStream(dir, "earliest", None)
    def readRange(from: Long, until: Long): Seq[String] = {
      val parts = stream.planInputPartitions(
        LogOffset(Map(0 -> from)), LogOffset(Map(0 -> until)))
      val factory = stream.createReaderFactory()
      parts.toSeq.flatMap { p =>
        val r = factory.createReader(p)
        val out = Seq.newBuilder[String]
        while (r.next()) out += r.get().getUTF8String(0).toString
        r.close()
        out.result()
      }
    }
    // spans all three segments, clipping head and tail mid-segment
    assert(readRange(1, 7) == Seq("r1", "r2", "r3", "r4", "r5", "r6"))
    // fully inside one segment
    assert(readRange(3, 5) == Seq("r3", "r4"))
    // empty span plans no partitions
    assert(readRange(4, 4).isEmpty)
    // full log
    assert(readRange(0, 8) == (0 to 7).map(i => s"r$i"))
  }

  test("startingOffsets latest skips the existing backlog; explicit JSON honored") {
    val dir = tmp()
    LogSource.append(dir, 0, Seq("a", "b", "c"))
    val latest = new LogMicroBatchStream(dir, "latest", None)
    assert(latest.initialOffset().asInstanceOf[LogOffset].offsets == Map(0 -> 3L))
    val explicit = new LogMicroBatchStream(dir, """{"0":2}""", None)
    assert(explicit.initialOffset().asInstanceOf[LogOffset].offsets == Map(0 -> 2L))
  }
}
