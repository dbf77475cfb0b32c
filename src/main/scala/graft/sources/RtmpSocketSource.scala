package graft.sources

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, ReadMinRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A LIVE-SOCKET streaming source speaking the RTMP wire protocol —
  * the reference's `inputcontainer` URL mode
  * (/root/reference/streamtasks/media/inputcontainer.py:62-110 hands
  * an `rtmp://` URL to libav; on the wire that is the §5.2 handshake
  * followed by the §5.3 chunk stream) as a Spark DataSourceV2
  * `MicroBatchStream`. `spark.readStream.format(
  * classOf[RtmpSocketSource].getName).option("host", …).option("port",
  * …)` yields one row per ASSEMBLED RTMP message:
  * `(seq, csid, stream_id, type_id, ts_ms, payload)`.
  *
  * Architecture — the same shape as Spark's own
  * `TextSocketMicroBatchStream`: a single TCP connection is by nature
  * ONE ingest point, so a driver-side reader thread performs the
  * client handshake and feeds arriving bytes through the incremental
  * [[Rtmp.Dechunker]]; assembled messages buffer at the driver and
  * ship to executors inside the planned partitions, where all
  * downstream work (demux of payloads, sample explode, stateful DAG)
  * runs distributed. Scaling ingest beyond one socket = one source
  * instance per socket (union of streams), exactly how multi-camera
  * deployments fan in. Committed batches are pruned from the buffer,
  * so driver memory holds only the un-committed window.
  *
  * Rate limiting (admission control): `maxMsgsPerBatch` bounds each
  * micro-batch via `ReadLimit.maxRows`, so a fast producer cannot
  * grow a single batch without bound. With `Trigger.AvailableNow` the
  * prepared target offset is drained in `ceil(n/maxMsgsPerBatch)`
  * batches — deterministic replay for tests and backfills.
  *
  * NOT fault-tolerant across query restarts (the same limitation
  * Spark documents for its own socket source): offsets are
  * connection-relative message counts, and a restarted query opens a
  * FRESH connection whose stream need not align with the checkpointed
  * offsets — replayed ranges would select different messages or fail
  * the buffered-range check. Durable live ingest belongs behind a
  * replayable log; this source is the protocol edge.
  *
  * Options: `host` (required), `port` (required), `maxMsgsPerBatch`
  * (default 1000), `drainOnStart` (default false — when true, block
  * at stream creation until the peer closes, so a replayed capture is
  * fully buffered and batch counts are deterministic;
  * `drainTimeoutMs` caps the wait, default 120000).
  */
class RtmpSocketSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RtmpSocketSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RtmpSocketSource.SocketTable(
      new CaseInsensitiveStringMap(properties))
}

object RtmpSocketSource {

  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("csid", IntegerType, nullable = false),
    StructField("stream_id", LongType, nullable = false),
    StructField("type_id", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private[sources] class SocketTable(options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    override def name(): String =
      s"rtmp://${options.get("host")}:${options.get("port")}"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = Schema
          override def toMicroBatchStream(checkpointLocation: String)
              : MicroBatchStream = {
            require(options.containsKey("host") && options.containsKey("port"),
              "rtmp source requires host and port options")
            new RtmpSocketMicroBatchStream(
              options.get("host"),
              options.get("port").toInt,
              options.getInt("maxMsgsPerBatch", 1000),
              options.getBoolean("drainOnStart", false),
              options.getLong("drainTimeoutMs", 120000L))
          }
        }
      }
  }

  /** Offset = count of messages assembled since stream start. */
  case class MsgOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  private final case class MsgRow(seq: Long, csid: Int, streamId: Long,
      typeId: Int, tsMs: Long, payload: Array[Byte])

  private final case class MsgPartition(rows: Array[MsgRow])
    extends InputPartition

  private class MsgReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private val rows = p.asInstanceOf[MsgPartition].rows
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val r = rows(i)
          new GenericInternalRow(Array[Any](r.seq, r.csid, r.streamId,
            r.typeId, r.tsMs, r.payload))
        }
        override def close(): Unit = ()
      }
  }

  class RtmpSocketMicroBatchStream(host: String, port: Int,
      maxMsgsPerBatch: Int, drainOnStart: Boolean, drainTimeoutMs: Long)
      extends MicroBatchStream with SupportsAdmissionControl
      with SupportsTriggerAvailableNow {
    require(maxMsgsPerBatch >= 1, s"maxMsgsPerBatch $maxMsgsPerBatch")

    // buffered(i) holds message number base + i; commit() prunes
    private val buffered = new scala.collection.mutable.ArrayBuffer[MsgRow]()
    private var base = 0L
    @volatile private var closed = false
    private val readError = new AtomicReference[Throwable](null)
    private var availableNowTarget: Long = -1L
    private val sock = new java.net.Socket(host, port)

    private val reader = new Thread(() => {
      try {
        val in = sock.getInputStream
        val out = sock.getOutputStream
        Rtmp.clientHandshake(in, out)
        val d = new Rtmp.Dechunker
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        var seq = 0L
        while (n >= 0) {
          if (n > 0) {
            val msgs = d.feed(java.util.Arrays.copyOf(buf, n))
            if (msgs.nonEmpty) buffered.synchronized {
              msgs.foreach { m =>
                buffered += MsgRow(seq, m.csid, m.streamId, m.typeId,
                  m.tsMs, m.payload)
                seq += 1
              }
              buffered.notifyAll()
            }
          }
          n = in.read(buf)
        }
        require(!d.midMessage && d.pendingBytes == 0,
          s"rtmp socket closed mid-chunk (${d.pendingBytes} pending, " +
            s"unfinished: ${d.unfinished})")
      } catch {
        case t: Throwable => readError.set(t)
      } finally {
        closed = true
        buffered.synchronized { buffered.notifyAll() }
        try sock.close() catch { case _: Throwable => () }
      }
    }, s"rtmp-socket-$host-$port")
    reader.setDaemon(true)
    reader.start()

    if (drainOnStart) {
      val deadline = System.currentTimeMillis() + drainTimeoutMs
      buffered.synchronized {
        while (!closed && System.currentTimeMillis() < deadline)
          buffered.wait(100L)
      }
      require(closed,
        s"rtmp source: drainOnStart did not finish in ${drainTimeoutMs} ms")
      rethrowIfFailed()
    }

    private def rethrowIfFailed(): Unit = {
      val t = readError.get()
      if (t != null)
        throw new IllegalStateException(s"rtmp reader failed: ${t.getMessage}", t)
    }

    private def available: Long = buffered.synchronized {
      base + buffered.size
    }

    override def initialOffset(): Offset = MsgOffset(0L)

    override def deserializeOffset(json: String): Offset =
      MsgOffset(json.toLong)

    override def getDefaultReadLimit: ReadLimit =
      ReadLimit.maxRows(maxMsgsPerBatch)

    override def prepareForTriggerAvailableNow(): Unit = {
      rethrowIfFailed()
      availableNowTarget = available
    }

    override def reportLatestOffset(): Offset = MsgOffset(
      if (availableNowTarget >= 0) availableNowTarget else available)

    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "latestOffset(Offset, ReadLimit) should be called instead")

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      rethrowIfFailed()
      val s = start.asInstanceOf[MsgOffset].n
      val avail =
        if (availableNowTarget >= 0) math.min(available, availableNowTarget)
        else available
      // honor the full admission-control vocabulary: allAvailable is
      // genuinely uncapped, a composite is the tightest of its parts
      // (minRows is a trigger threshold, not a cap), and only an
      // unknown kind falls back to the configured per-batch default
      def rowCap(l: ReadLimit): Long = l match {
        case _: ReadAllAvailable => Long.MaxValue
        case mr: ReadMaxRows     => mr.maxRows()
        case _: ReadMinRows      => Long.MaxValue
        case c: CompositeReadLimit => c.getReadLimits.map(rowCap).min
        case _ => maxMsgsPerBatch
      }
      val capN = rowCap(limit)
      val cap = if (capN == Long.MaxValue) Long.MaxValue else s + capN
      MsgOffset(math.max(s, math.min(avail, cap)))
    }

    override def planInputPartitions(start: Offset, end: Offset)
        : Array[InputPartition] = {
      val s = start.asInstanceOf[MsgOffset].n
      val e = end.asInstanceOf[MsgOffset].n
      if (e <= s) return Array.empty
      val rows = buffered.synchronized {
        require(s >= base,
          s"rtmp source: offset $s below pruned base $base")
        require(e <= base + buffered.size,
          s"rtmp source: offset $e beyond buffered ${base + buffered.size}")
        buffered.slice((s - base).toInt, (e - base).toInt).toArray
      }
      Array(MsgPartition(rows))
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new MsgReaderFactory

    override def commit(end: Offset): Unit = {
      val e = end.asInstanceOf[MsgOffset].n
      buffered.synchronized {
        val drop = (e - base).toInt
        if (drop > 0) { buffered.remove(0, math.min(drop, buffered.size)); base = math.max(base, e) }
      }
    }

    override def stop(): Unit = {
      try sock.close() catch { case _: Throwable => () }
      reader.interrupt()
    }
  }
}
