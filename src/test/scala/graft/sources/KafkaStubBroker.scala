package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import graft.sources.KafkaWire.{Reader, Writer}

/** In-memory single-node Kafka broker speaking the same public v0 wire
  * protocol as [[KafkaWire]] — the server half the container's missing
  * Kafka jars would otherwise provide, so the `kafka-lite` source/sink can
  * be exercised end-to-end over real sockets (the [[FileBufServer]]
  * treatment for the Kafka transport). Test infrastructure only: serves
  * Metadata/ListOffsets/Fetch/Produce v0 against per-partition in-memory
  * logs; topics auto-create with `numPartitions` partitions on first use.
  *
  * Fidelity kept (because the client contract depends on it): leader-acked
  * produce with assigned base offsets, OFFSET_OUT_OF_RANGE (error 1) on a
  * fetch past the log end, fetch long-polling up to max_wait_ms, max_bytes
  * cutting the returned set on a whole-message boundary, acks=0 produce
  * getting NO response, per-connection request/response lockstep.
  */
class KafkaStubBroker(numPartitions: Int = 2, host: String = "127.0.0.1") {

  private val logs = TrieMap.empty[(String, Int), ArrayBuffer[(Array[Byte], Array[Byte])]]
  @volatile private var running = false
  private var server: ServerSocket = _

  /** Requests served, by api key — lets specs assert which APIs a
    * scenario actually drove.
    */
  val apiCounts: TrieMap[Short, Int] = TrieMap.empty

  private def log(topic: String, p: Int): ArrayBuffer[(Array[Byte], Array[Byte])] =
    logs.getOrElseUpdate((topic, p), ArrayBuffer.empty)

  def start(): Int = {
    server = new ServerSocket(0, 16, java.net.InetAddress.getByName(host))
    running = true
    val t = new Thread(() => acceptLoop(), "kafka-stub-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def port: Int = server.getLocalPort

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }

  /** Values of one partition's log as strings (spec assertions). */
  def stringValues(topic: String, partition: Int): Seq[String] = {
    val l = log(topic, partition)
    l.synchronized(l.map(kv => new String(kv._2, java.nio.charset.StandardCharsets.UTF_8)).toSeq)
  }

  def size(topic: String, partition: Int): Int = {
    val l = log(topic, partition)
    l.synchronized(l.size)
  }

  /** Broker-side append (seeding data without a producer). */
  def append(topic: String, partition: Int, values: Seq[String]): Unit = {
    val l = log(topic, partition)
    l.synchronized {
      values.foreach(v => l += ((null,
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    }
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s), "kafka-stub-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed during stop()
        case _: Throwable if !running => ()
      }
    }

  private def serve(socket: Socket): Unit = {
    socket.setTcpNoDelay(true)
    val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
    try {
      while (running) {
        val size = in.readInt()
        require(size > 0 && size <= 64 * 1024 * 1024, s"bad request size $size")
        val payload = new Array[Byte](size)
        in.readFully(payload)
        val r = new Reader(payload)
        val apiKey = r.int16()
        val apiVersion = r.int16()
        val corr = r.int32()
        r.string() // client_id
        require(apiVersion == 0, s"stub broker speaks v0 only, got v$apiVersion for api $apiKey")
        apiCounts.updateWith(apiKey) { c => Some(c.getOrElse(0) + 1) }
        val (body, respond) = apiKey match {
          case KafkaWire.ApiMetadata => (metadata(r), true)
          case KafkaWire.ApiListOffsets => (listOffsets(r), true)
          case KafkaWire.ApiFetch => (fetch(r), true)
          case KafkaWire.ApiProduce =>
            val (b, acked) = produce(r)
            (b, acked)
          case other => throw new IllegalArgumentException(s"unsupported api $other")
        }
        if (respond) {
          out.writeInt(4 + body.length)
          out.writeInt(corr)
          out.write(body)
          out.flush()
        }
      }
    } catch {
      case _: EOFException | _: SocketException => () // client went away
    } finally {
      try socket.close() catch { case _: Throwable => () }
    }
  }

  // ---- api bodies (server side of the v0 schemas in KafkaWire) ---------

  private def metadata(r: Reader): Array[Byte] = {
    val asked = r.array(r.string())
    val topics = if (asked.nonEmpty) asked else logs.keys.map(_._1).toSeq.distinct.sorted
    val w = new Writer()
    w.array(Seq(0)) { _ => w.int32(0).string(host).int32(port) } // one broker, node 0
    w.array(topics) { t =>
      (0 until numPartitions).foreach(p => log(t, p)) // auto-create
      w.int16(0: Short).string(t)
      w.array(0 until numPartitions) { p =>
        w.int16(0: Short).int32(p).int32(0) // error, partition, leader node 0
        w.array(Seq(0))(n => w.int32(n))    // replicas
        w.array(Seq(0))(n => w.int32(n))    // isr
      }
    }
    w.toBytes
  }

  private def listOffsets(r: Reader): Array[Byte] = {
    r.int32() // replica_id
    val asks = r.array {
      val t = r.string()
      val parts = r.array { (r.int32(), r.int64(), r.int32()) }
      (t, parts)
    }
    val w = new Writer()
    w.array(asks) { case (t, parts) =>
      w.string(t)
      w.array(parts) { case (p, ts, _) =>
        val l = log(t, p)
        val end = l.synchronized(l.size.toLong)
        val off = if (ts == KafkaWire.EarliestTimestamp) 0L else end
        w.int32(p).int16(0: Short)
        w.array(Seq(off))(o => w.int64(o))
      }
    }
    w.toBytes
  }

  private def fetch(r: Reader): Array[Byte] = {
    r.int32() // replica_id
    val maxWait = r.int32()
    r.int32() // min_bytes
    val asks = r.array {
      val t = r.string()
      val parts = r.array { (r.int32(), r.int64(), r.int32()) }
      (t, parts)
    }
    val w = new Writer()
    w.array(asks) { case (t, parts) =>
      w.string(t)
      w.array(parts) { case (p, offset, maxBytes) =>
        val l = log(t, p)
        // long-poll up to max_wait_ms when the offset is at the log end
        val deadline = System.currentTimeMillis() + math.max(0, maxWait)
        var end = l.synchronized(l.size.toLong)
        while (offset >= end && System.currentTimeMillis() < deadline) {
          Thread.sleep(5)
          end = l.synchronized(l.size.toLong)
        }
        if (offset > end) {
          w.int32(p).int16(1: Short).int64(end).int32(0) // OFFSET_OUT_OF_RANGE
        } else {
          val slice = l.synchronized(l.slice(offset.toInt, l.size).toVector)
          // whole messages only, cut at max_bytes
          var budget = maxBytes
          val keep = Vector.newBuilder[(Long, (Array[Byte], Array[Byte]))]
          var i = 0
          var full = false
          while (i < slice.size && !full) {
            val (k, v) = slice(i)
            val msgBytes = 12 + 6 + (if (k == null) 4 else 4 + k.length) + 4 + v.length
            if (msgBytes <= budget) {
              keep += ((offset + i, (k, v))); budget -= msgBytes; i += 1
            } else full = true
          }
          val kept = keep.result()
          // v0 fetch sets carry ABSOLUTE offsets: re-stamp the encoded
          // placeholder indices with the real positions
          val set = encodeWithOffsets(kept)
          w.int32(p).int16(0: Short).int64(end).int32(set.length).raw(set)
        }
      }
    }
    w.toBytes
  }

  private def encodeWithOffsets(records: Seq[(Long, (Array[Byte], Array[Byte]))]): Array[Byte] = {
    val w = new Writer()
    records.foreach { case (off, (k, v)) =>
      val one = KafkaWire.encodeMessageSet(Seq((k, v)))
      // overwrite the 8-byte placeholder offset at the head of the entry
      val bb = java.nio.ByteBuffer.wrap(one)
      bb.putLong(0, off)
      w.raw(one)
    }
    w.toBytes
  }

  private def produce(r: Reader): (Array[Byte], Boolean) = {
    val acks = r.int16()
    r.int32() // timeout
    val asks = r.array {
      val t = r.string()
      val parts = r.array {
        val p = r.int32()
        val setSize = r.int32()
        val set = r.raw(setSize)
        (p, set)
      }
      (t, parts)
    }
    val w = new Writer()
    w.array(asks) { case (t, parts) =>
      w.string(t)
      w.array(parts) { case (p, set) =>
        val records = KafkaWire.decodeMessageSet(set)
        val l = log(t, p)
        val base = l.synchronized {
          val b = l.size.toLong
          records.foreach(rec => l += ((rec.key, rec.value)))
          b
        }
        w.int32(p).int16(0: Short).int64(base)
      }
    }
    (w.toBytes, acks != 0) // acks=0: fire-and-forget, no response frame
  }
}
