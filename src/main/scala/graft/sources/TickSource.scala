package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch source `graft-ticks` — the custom source
  * artifact for S1 (SURVEY.md §2.1/§4): a deterministic stand-in for
  * the reference's WebSocket feed (ingestor.go:31-127) that emits
  * wire-shaped frames `{"name","timestamp","data":{"data":{bid,ask}}}`
  * as a `value STRING` column, including the feed's failure modes
  * (corrupt frames, invalid records) on a fixed schedule so the full
  * decode→validate path is exercised end to end.
  *
  * Offsets are plain tick counters: batch n covers [start, end) ticks,
  * every field derived from the tick index — replayable, checkpoint-
  * recoverable, and partition-parallel (the range is split across
  * `numPartitions` readers, each generating its slice independently —
  * the shape a real partitioned feed consumer has on a cluster).
  *
  * Options: rowsPerBatch (default 1000), maxTicks (default 10000),
  * numPartitions (default 4), symbols (default 25).
  */
class TickSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ticks"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickTable(properties)
}

object TickSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Deterministic wire frame for tick index i. Every 97th frame is
    * corrupt JSON (S3 drop path), every 101st has an empty name (F1
    * drop path).
    */
  def frame(i: Long, nSymbols: Int): String =
    if (i % 97 == 0) s"""{corrupt frame $i"""
    else {
      val name = if (i % 101 == 0) "" else s"SYM${i % nSymbols}"
      val ts = 1700000000000L + i
      val bid = (i % 10000) / 100.0
      val ask = bid + 0.01
      s"""{"name":"$name","timestamp":$ts,"data":{"data":{"bid":"$bid","ask":"$ask"}}}"""
    }
}

final class TickTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-ticks"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TickMicroBatchStream(
            rowsPerBatch = opt(options, "rowsPerBatch", 1000L),
            maxTicks = opt(options, "maxTicks", 10000L),
            numPartitions = opt(options, "numPartitions", 4L).toInt,
            nSymbols = opt(options, "symbols", 25L).toInt)
      }
    }

  private def opt(o: CaseInsensitiveStringMap, k: String, d: Long): Long =
    Option(o.get(k)).map(_.toLong).getOrElse(d)
}

final case class TickOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

final class TickMicroBatchStream(
    rowsPerBatch: Long, maxTicks: Long, numPartitions: Int, nSymbols: Int)
    extends MicroBatchStream {

  @volatile private var available: Long = 0L

  override def initialOffset(): Offset = TickOffset(0L)

  override def latestOffset(): Offset = {
    available = math.min(available + rowsPerBatch, maxTicks)
    TickOffset(available)
  }

  override def deserializeOffset(json: String): Offset = {
    val t = json.toLong
    // Checkpoint recovery: `available` is in-memory and restarts at 0;
    // seed it with any recovered offset so latestOffset never plans an
    // end below the committed start (which would yield empty batches —
    // or an offset-validation error — until the counter caught up).
    if (t > available) available = t
    TickOffset(t)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].tick
    val e = end.asInstanceOf[TickOffset].tick
    val span = math.max(0L, e - s)
    val per = math.max(1L, (span + numPartitions - 1) / numPartitions)
    (s until e by per).map(lo =>
      TickRange(lo, math.min(lo + per, e), nSymbols): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val r = partition.asInstanceOf[TickRange]
        new PartitionReader[InternalRow] {
          private var i = r.from - 1
          override def next(): Boolean = { i += 1; i < r.until }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(TickSource.frame(i, r.nSymbols)))
          override def close(): Unit = ()
        }
      }
    }
}

final case class TickRange(from: Long, until: Long, nSymbols: Int) extends InputPartition
