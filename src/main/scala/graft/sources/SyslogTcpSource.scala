package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native syslog-over-TCP streaming source (DataSource V2) — transport
  * parity for the reference's syslog server (S4,
  * `/root/reference/internal/services/syslog/syslog.go:33-53` binds
  * TCP/UDP/unixgram listeners; each datagram/line is one log record).
  *
  * Usage: `spark.readStream.format("syslog-tcp").option("host", h)
  * .option("port", p).load()` → one `value: String` column, the same
  * shape as the built-in text/socket/kafka sources, feeding the shared
  * [[graft.pipeline.Ingest]] pipeline (strip the RFC3164 envelope with
  * [[graft.streaming.StreamingIngest.stripSyslogEnvelope]]).
  *
  * Delivery semantics: the driver-side listener buffers lines and serves
  * them to executors by offset range; offsets already read but not yet
  * committed survive query restarts within the process, but a crashed
  * driver loses its buffer — at-most-once, exactly the reference's TCP
  * syslog contract (`README.md:545`; its channel buffer is equally
  * volatile). For at-least-once, front the stream with Kafka (S5).
  *
  * Scale: a single listener thread is the protocol's own bottleneck (one
  * TCP stream); the reference's answer is many parallel sources — here,
  * union multiple `syslog-tcp` streams, one per listener endpoint.
  */
class SyslogTcpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "syslog-tcp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyslogTcpSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyslogTcpTable
}

object SyslogTcpSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class SyslogTcpTable extends Table with SupportsRead {
  override def name(): String = "syslog-tcp"
  override def schema(): StructType = SyslogTcpSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      private val host = Option(options.get("host")).getOrElse("localhost")
      private val port = Option(options.get("port"))
        .map(_.toInt).getOrElse(throw new IllegalArgumentException(
          "syslog-tcp source requires option 'port'"))
      override def build(): Scan = this
      override def readSchema(): StructType = SyslogTcpSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SyslogTcpMicroBatchStream(host, port)
    }
}

private[sources] case class SyslogTcpOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] class SyslogTcpMicroBatchStream(host: String, port: Int)
    extends MicroBatchStream {

  // absolute index of buffer head + buffered lines (driver side)
  private val lock = new Object
  private var baseIndex = 0L
  private val buffer = ArrayBuffer.empty[String]
  private val started = new AtomicBoolean(false)
  @volatile private var socket: Socket = _

  private def ensureStarted(): Unit =
    if (started.compareAndSet(false, true)) {
      socket = new Socket(host, port)
      val in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.UTF_8))
      val t = new Thread(() => {
        try {
          var line = in.readLine()
          while (line != null) {
            lock.synchronized { buffer += line }
            line = in.readLine()
          }
        } catch { case _: Throwable => () } // socket closed on stop()
      }, s"syslog-tcp-$host:$port")
      t.setDaemon(true)
      t.start()
    }

  override def initialOffset(): Offset = SyslogTcpOffset(0L)

  override def latestOffset(): Offset = {
    ensureStarted()
    lock.synchronized(SyslogTcpOffset(baseIndex + buffer.size))
  }

  override def deserializeOffset(json: String): Offset =
    SyslogTcpOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SyslogTcpOffset].index
    val e = end.asInstanceOf[SyslogTcpOffset].index
    val slice = lock.synchronized {
      val from = math.max(0L, s - baseIndex).toInt
      val until = math.min(buffer.size.toLong, math.max(0L, e - baseIndex)).toInt
      buffer.slice(from, until).toArray
    }
    Array(SyslogTcpInputPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyslogTcpReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[SyslogTcpOffset].index
    lock.synchronized {
      val drop = math.min(buffer.size.toLong, math.max(0L, e - baseIndex)).toInt
      buffer.remove(0, drop)
      baseIndex += drop
    }
  }

  override def stop(): Unit = {
    if (socket != null) {
      try socket.close() catch { case _: Throwable => () }
    }
  }
}

private[sources] case class SyslogTcpInputPartition(lines: Array[String])
    extends InputPartition

private[sources] class SyslogTcpReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = partition.asInstanceOf[SyslogTcpInputPartition].lines
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(lines(i))))
      override def close(): Unit = ()
    }
}
