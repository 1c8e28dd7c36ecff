package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch source `graft-log` — the DURABLE-LOG face
  * of S1 (SURVEY.md §2.1 scale note): at 100 TB the production feed is
  * a partitioned, replayable log (Kafka-shaped), not a live socket.
  * This source gives that contract over a directory so the ingest
  * pipeline can be demonstrated source-swapped with no downstream
  * change — same `value STRING` wire schema as `graft-ws` /
  * `graft-ticks`, Kafka-shaped options and offsets:
  *
  *   layout            `<path>/p=<n>/<base-offset>.jsonl` append-only
  *                     segment files, one record per line, segment
  *                     name = offset of its first record
  *   offsets           per-partition next-record offsets, serialized
  *                     as `{"0":12,"1":7}` (the Kafka JSON shape)
  *   startingOffsets   earliest | latest | explicit offset JSON
  *   maxOffsetsPerTrigger  admission cap: at most this many records
  *                     per micro-batch, allocated to partitions pro
  *                     rata to their backlog — the BATCH_SIZE face of
  *                     the reference's count+time flush (A3,
  *                     processor.go:70-81) on the replayable source
  *
  * Replay is the point: offsets are durable positions in files, so a
  * restarted query re-plans exactly the committed range it was on —
  * unlike the live-socket source, whose replay window is its in-memory
  * buffer. Segment line counts are memoized by (path, size), so the
  * per-trigger latestOffset probe re-counts only segments that grew;
  * a production log would read its index instead.
  */
class LogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.schema // value STRING — same wire shape as graft-ticks

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LogTable(properties)
}

object LogSource {

  /** Append records to a partition as one new segment file named by
    * the partition's current end offset — the producer side of the
    * log (tests and local pipelines; a real deployment's producer is
    * whatever writes the log).
    */
  def append(dir: String, partition: Int, records: Seq[String]): Unit = {
    val pdir = Paths.get(dir, s"p=$partition")
    Files.createDirectories(pdir)
    val base = partitionEnd(pdir)
    val name = f"$base%020d.jsonl"
    Files.write(pdir.resolve(name),
      records.mkString("", "\n", "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW)
    ()
  }

  /** (base offset, path, record count) per segment, ordered. The
    * `Files.list` stream is closed eagerly — it holds a directory fd,
    * and this helper runs several times per 1 s trigger for the life
    * of the query.
    */
  private[sources] def segments(pdir: Path): Seq[(Long, Path, Long)] =
    if (!Files.isDirectory(pdir)) Seq.empty
    else {
      val listing = Files.list(pdir)
      val files =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".jsonl")).toVector
        finally listing.close()
      evictDead(pdir, files)
      files.sortBy(_.getFileName.toString)
        .map { p =>
          (p.getFileName.toString.stripSuffix(".jsonl").toLong, p, lineCount(p))
        }
    }

  private[sources] def partitionEnd(pdir: Path): Long =
    segments(pdir).lastOption.fold(0L) { case (base, _, n) => base + n }

  /** Memoized line count keyed by path, valid for the recorded size:
    * append-only segments only ever grow, so a size match is exact and
    * a grown file re-counts, REPLACING its entry — the cache stays one
    * entry per live segment instead of accreting one per (path, size)
    * generation over the log's lifetime. [[evictDead]] keeps that
    * claim true across segment DELETION too (retired/compacted logs,
    * test temp dirs): each directory listing drops cached keys for
    * segments no longer present, so the JVM-global map is bounded by
    * the currently-live segment population, not the driver's lifetime.
    */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def evictDead(pdir: Path, live: Seq[Path]): Unit = {
    val prefix = pdir.toString + java.io.File.separator
    val keep = live.map(_.toString).toSet
    countCache.keySet.removeIf(k => k.startsWith(prefix) && !keep.contains(k))
  }

  private def lineCount(p: Path): Long = {
    val size = Files.size(p)
    countCache.compute(p.toString, (_, prev) =>
      if (prev != null && prev._1 == size) prev
      else {
        var n = 0L
        val in = Files.newBufferedReader(p, UTF_8)
        try { while (in.readLine() != null) n += 1 } finally in.close()
        (size, n)
      })._2
  }

  /** Partition ids present under the log dir (`p=<n>` subdirs). */
  private[sources] def partitionIds(dir: String): Seq[Int] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val listing = Files.list(d)
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("p=")).map(_.stripPrefix("p=").toInt)
        .toSeq.sorted
      finally listing.close()
    }
  }

  private[sources] def currentEnds(dir: String): Map[Int, Long] =
    partitionIds(dir).map(p => p -> partitionEnd(Paths.get(dir, s"p=$p"))).toMap
}

final class LogTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-log"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LogMicroBatchStream(
            dir = Option(options.get("path")).getOrElse(
              throw new IllegalArgumentException("graft-log requires option 'path'")),
            startingOffsets = Option(options.get("startingOffsets")).getOrElse("earliest"),
            maxOffsetsPerTrigger =
              Option(options.get("maxOffsetsPerTrigger"))
                .orElse(Option(options.get("maxRecordsPerTrigger")))
                .map(_.toLong))
      }
    }
}

/** Per-partition next-record offsets, Kafka's JSON shape. */
final case class LogOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object LogOffset {
  private val Entry = """"(\d+)"\s*:\s*(\d+)""".r
  def parse(json: String): LogOffset =
    LogOffset(Entry.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class LogMicroBatchStream(dir: String, startingOffsets: String,
    maxOffsetsPerTrigger: Option[Long]) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow pins the drain target HERE at query start and
  // then runs as many admission-capped batches as the target needs —
  // without SupportsTriggerAvailableNow, Spark's wrapper would snapshot
  // ONE capped latestOffset and stop a cap short of the backlog
  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None

  override def initialOffset(): Offset = startingOffsets match {
    case "earliest" => LogOffset(LogSource.partitionIds(dir).map(_ -> 0L).toMap)
    case "latest" => LogOffset(LogSource.currentEnds(dir))
    case json => LogOffset.parse(json)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(LogSource.currentEnds(dir))

  /** The true log end, regardless of admission (progress reporting). */
  override def reportLatestOffset(): Offset = LogOffset(LogSource.currentEnds(dir))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-log implements SupportsAdmissionControl; Spark calls latestOffset(start, limit)")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val raw = LogSource.currentEnds(dir)
    // under AvailableNow, never read past the pinned target (a segment
    // appended after query start belongs to the next run); otherwise
    // partitions can APPEAR over the log's lifetime and enter at 0
    val ends = availableNowTarget.fold(raw)(t =>
      raw.map { case (p, e) => p -> math.min(e, t.getOrElse(p, 0L)) })
    val start = startOffset.asInstanceOf[LogOffset].offsets
    val base = ends.map { case (p, _) => p -> start.getOrElse(p, 0L) }
    val capped = limit match {
      case rm: ReadMaxRows =>
        val cap = rm.maxRows()
        // pro-rata admission over backlogs, whole records, at least one
        // record per nonempty partition once the cap allows — Kafka's
        // proportional allocation shape
        val backlog = ends.map { case (p, e) => p -> math.max(0L, e - base(p)) }
        val total = backlog.values.sum
        if (total <= cap) ends
        else {
          var remaining = cap
          backlog.toSeq.sortBy(_._1).map { case (p, b) =>
            val share = math.min(b, math.max(if (b > 0) 1L else 0L, cap * b / total))
            val take = math.min(share, remaining)
            remaining -= take
            p -> (base(p) + take)
          }.toMap
        }
      case _ => ends
    }
    LogOffset(capped)
  }

  override def deserializeOffset(json: String): Offset = LogOffset.parse(json)

  override def commit(end: Offset): Unit = () // files are durable

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].offsets
    val e = end.asInstanceOf[LogOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until <= from) None
      else {
        // driver-side segment plan: only segments overlapping the
        // offset span ship to the reader
        val segs = LogSource.segments(Paths.get(dir, s"p=$p"))
          .collect { case (base, path, n)
            if base < until && base + n > from =>
              LogSegmentSlice(path.toString, base,
                math.max(from, base), math.min(until, base + n))
          }
        Some(LogSlice(p, segs.toArray): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val slice = partition.asInstanceOf[LogSlice]
        new PartitionReader[InternalRow] {
          private var seg = -1
          private var reader: java.io.BufferedReader = null
          private var remaining = 0L
          private var line: String = null

          private def openNext(): Boolean = {
            if (reader != null) { reader.close(); reader = null }
            seg += 1
            if (seg >= slice.segments.length) false
            else {
              val s = slice.segments(seg)
              reader = Files.newBufferedReader(Paths.get(s.path), UTF_8)
              var skip = s.from - s.base
              while (skip > 0) { reader.readLine(); skip -= 1 }
              remaining = s.until - s.from
              true
            }
          }

          override def next(): Boolean = {
            while (remaining <= 0) if (!openNext()) return false
            line = reader.readLine()
            remaining -= 1
            line != null
          }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(line))
          override def close(): Unit =
            if (reader != null) { reader.close(); reader = null }
        }
      }
    }
}

/** One partition's slice of a micro-batch: the segment files holding
  * offsets [from, until) with their base offsets.
  */
final case class LogSegmentSlice(path: String, base: Long, from: Long, until: Long)
final case class LogSlice(partition: Int, segments: Array[LogSegmentSlice])
    extends InputPartition
