package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Reconnect policy shared by the WS source and its tests: exponential
  * backoff doubling from `baseMs` to a `maxMs` cap, reset to base on a
  * successful connect — the reference ingestor's policy
  * (ingestor.go:37,52-60: 1s doubling to 30s, reset on success).
  */
object WsBackoff {
  def delayMs(attempt: Int, baseMs: Long = 1000L, maxMs: Long = 30000L): Long =
    math.min(maxMs, baseMs << math.min(attempt, 30))
}

/** DataSourceV2 micro-batch source `graft-ws` — S1/S2 with the real
  * transport: a WebSocket client feed (upgrade handshake with
  * `x-api-key`, subscribe frame after connect, exponential-backoff
  * reconnect) surfaced as a streaming `value STRING` column feeding
  * the same decode→validate path as `graft-ticks`.
  * Mirrors the reference ingestor's behavior (ingestor.go:31-127):
  * dial with api-key header :46-49, backoff :37,52-60, subscribe
  * frame {"event":"subscribe","symbols":[...]} :63-78.
  *
  * Like Spark's own socket source, frames are received on the driver
  * and are not replayable after a restart — a push feed has no offset
  * store to rewind (the recovered offset is honored so restarts plan
  * forward, they just cannot re-read dropped frames). At cluster scale
  * the feed fans out by subscription: one `graft-ws` stream per symbol
  * shard, unioned — each driver-side buffer stays one shard wide, and
  * the heavy lifting (decode, validate, enrich, sink) is distributed
  * the moment the buffered batch is planned into partitions.
  *
  * Options: host (required), port (required), path (default "/"),
  * apiKey (sent as x-api-key when set), subscribe (JSON text frame
  * sent after connect when set), backoffBaseMs (1000), backoffMaxMs
  * (30000), numPartitions (4), readTimeoutMs (0 = none; a stuck
  * connection with no TCP FIN then reads as a disconnect and
  * reconnects), maxBuffered (100000 — the reader thread stops pulling
  * frames once this many are unplanned, pushing backpressure into the
  * TCP window instead of growing driver memory, like the reference's
  * blocking channel send ingestor.go:125), secure (false; true = wss://
  * over TLS), trustStore + trustStorePassword (optional PKCS12/JKS
  * trust store for private CAs / self-signed feeds; default = platform
  * trust).
  */
class WsSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ws"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.schema // value STRING — same wire shape as graft-ticks

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WsTable(properties)
}

final class WsTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-ws"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TickSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WsMicroBatchStream(
            host = require(options, "host"),
            port = require(options, "port").toInt,
            path = Option(options.get("path")).getOrElse("/"),
            apiKey = Option(options.get("apiKey")),
            subscribe = Option(options.get("subscribe")),
            backoffBaseMs = opt(options, "backoffBaseMs", 1000L),
            backoffMaxMs = opt(options, "backoffMaxMs", 30000L),
            numPartitions = opt(options, "numPartitions", 4L).toInt,
            readTimeoutMs = opt(options, "readTimeoutMs", 0L).toInt,
            maxBuffered = opt(options, "maxBuffered", 100000L).toInt,
            secure = Option(options.get("secure")).exists(_.toBoolean),
            trustStore = Option(options.get("trustStore")),
            trustStorePassword = Option(options.get("trustStorePassword")))
      }
    }

  private def require(o: CaseInsensitiveStringMap, k: String): String =
    Option(o.get(k)).getOrElse(
      throw new IllegalArgumentException(s"graft-ws requires option '$k'"))

  private def opt(o: CaseInsensitiveStringMap, k: String, d: Long): Long =
    Option(o.get(k)).map(_.toLong).getOrElse(d)
}

final class WsMicroBatchStream(
    host: String, port: Int, path: String,
    apiKey: Option[String], subscribe: Option[String],
    backoffBaseMs: Long, backoffMaxMs: Long, numPartitions: Int,
    readTimeoutMs: Int = 0, maxBuffered: Int = 100000,
    secure: Boolean = false, trustStore: Option[String] = None,
    trustStorePassword: Option[String] = None)
    extends MicroBatchStream {

  // built once per stream; TLS handshake state is per-socket, the
  // factory is stateless and reusable across reconnects
  private val sslFactory: Option[javax.net.SocketFactory] =
    if (secure) Some(WsTls.clientSocketFactory(trustStore, trustStorePassword))
    else None

  // frames [base, base + buf.size); commit() trims below the committed
  // offset so driver memory holds only unplanned frames
  private val buf = ArrayBuffer.empty[String]
  private var base = 0L
  @volatile private var stopped = false
  // current connection, so stop() can close the socket out from under a
  // blocked read (interrupt() alone never wakes a blocking Socket read)
  @volatile private var current: WsClient = null

  private val reader = new Thread(() => {
    var attempt = 0
    while (!stopped) {
      var client: WsClient = null
      try {
        // two-phase connect: register the instance BEFORE the blocking
        // handshake reads, so a stop() landing mid-handshake can close
        // the socket out from under it (the constructor's TCP connect
        // is itself bounded by its connect timeout, and the handshake
        // runs under a bounded soTimeout — no unbounded unsupervised
        // wait exists on this path)
        client = new WsClient(host, port, path,
          headers = apiKey.map("x-api-key" -> _).toMap,
          readTimeoutMs = readTimeoutMs, socketFactory = sslFactory)
        current = client
        if (stopped) throw new InterruptedException("stopped")
        client.handshake()
        subscribe.foreach(client.sendText)
        attempt = 0 // reset-on-success, like the reference (ingestor.go:60)
        var frame = client.readText()
        while (frame.isDefined && !stopped) {
          // bounded buffer: stop pulling while the query is behind —
          // the unread TCP window is the backpressure signal upstream
          while (this.synchronized(buf.size) >= maxBuffered && !stopped)
            Thread.sleep(10)
          this.synchronized { buf += frame.get }
          frame = client.readText()
        }
      } catch {
        case _: Exception => () // connect/read failure → backoff below
      } finally {
        current = null
        if (client != null) client.close()
      }
      if (!stopped) {
        Thread.sleep(WsBackoff.delayMs(attempt, backoffBaseMs, backoffMaxMs))
        attempt += 1
      }
    }
  }, s"graft-ws-reader-$host:$port")
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = TickOffset(0L)

  override def latestOffset(): Offset =
    this.synchronized { TickOffset(base + buf.size) }

  override def deserializeOffset(json: String): Offset = {
    val t = json.toLong
    // restart recovery: frames below the checkpointed offset are gone
    // (push transport) — advance base so planning resumes at t instead
    // of replanning an impossible range
    this.synchronized {
      val avail = base + buf.size
      if (t > avail) base += t - avail
    }
    TickOffset(t)
  }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[TickOffset].tick
    this.synchronized {
      val drop = math.min(math.max(0L, e - base), buf.size.toLong).toInt
      buf.remove(0, drop)
      base += drop
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TickOffset].tick
    val e = end.asInstanceOf[TickOffset].tick
    val rows = this.synchronized {
      val lo = math.min(math.max(0L, s - base), buf.size.toLong).toInt
      val hi = math.min(math.max(0L, e - base), buf.size.toLong).toInt
      buf.slice(lo, hi).toArray
    }
    if (rows.isEmpty) Array.empty
    else {
      val per = math.max(1, (rows.length + numPartitions - 1) / numPartitions)
      rows.grouped(per).map(g => WsFramesPartition(g): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[WsFramesPartition].frames
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(rows(i)))
          override def close(): Unit = ()
        }
      }
    }

  override def stop(): Unit = {
    stopped = true
    // closing the socket makes a blocked read throw — interrupt() alone
    // cannot wake java.net.Socket I/O, so with readTimeoutMs=0 the
    // reader (and its socket) would otherwise outlive the query
    val c = current
    if (c != null) c.close()
    reader.interrupt()
  }
}

final case class WsFramesPartition(frames: Array[String]) extends InputPartition
