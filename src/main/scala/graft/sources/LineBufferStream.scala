package graft.sources

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.unsafe.types.UTF8String

/** Shared machinery for driver-buffered line sources (syslog TCP/UDP):
  * a transport thread appends lines, micro-batches are offset ranges over
  * the absolute line index, committed prefixes are dropped from the
  * buffer. Delivery is at-most-once (driver buffer is volatile) — exactly
  * the reference's syslog contract
  * (`/root/reference/README.md:545`; its channel buffer is equally
  * volatile). For at-least-once, front the stream with Kafka.
  */
private[sources] case class LineOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] abstract class LineBufferMicroBatchStream extends MicroBatchStream {

  private val lock = new Object
  private var baseIndex = 0L
  private val buffer = ArrayBuffer.empty[String]
  private val started = new AtomicBoolean(false)

  /** Start the transport; call `append` once per received line. */
  protected def startIngest(append: String => Unit): Unit

  /** Tear the transport down (idempotent). */
  protected def stopIngest(): Unit

  private def ensureStarted(): Unit =
    if (started.compareAndSet(false, true))
      startIngest(line => lock.synchronized { buffer += line })

  override def initialOffset(): Offset = LineOffset(0L)

  override def latestOffset(): Offset = {
    ensureStarted()
    lock.synchronized(LineOffset(baseIndex + buffer.size))
  }

  override def deserializeOffset(json: String): Offset =
    LineOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].index
    val e = end.asInstanceOf[LineOffset].index
    val slice = lock.synchronized {
      val from = math.max(0L, s - baseIndex).toInt
      val until = math.min(buffer.size.toLong, math.max(0L, e - baseIndex)).toInt
      buffer.slice(from, until).toArray
    }
    Array(LineSlicePartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LineSliceReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[LineOffset].index
    lock.synchronized {
      val drop = math.min(buffer.size.toLong, math.max(0L, e - baseIndex)).toInt
      buffer.remove(0, drop)
      baseIndex += drop
    }
  }

  override def stop(): Unit = stopIngest()
}

private[sources] case class LineSlicePartition(lines: Array[String])
    extends InputPartition

private[sources] class LineSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = partition.asInstanceOf[LineSlicePartition].lines
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(lines(i))))
      override def close(): Unit = ()
    }
}
