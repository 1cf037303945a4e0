package graft.sources

import java.nio.charset.StandardCharsets

import io.netty.buffer.{ByteBuf, Unpooled}

/** Wire-level helpers for the reference's FileBuf gRPC transport
  * (`/root/reference/protobuf/filebuf/filebuf.proto:6-13`):
  *
  * ```proto
  * service FileBufferService {
  *   rpc CreateDataStreamer (stream Request) returns (Response) {}
  * }
  * message Request { string data = 1; }
  * message Response {}
  * ```
  *
  * Implemented from the PUBLIC specs only — the gRPC-over-HTTP/2 wire
  * format (grpc/grpc `doc/PROTOCOL-HTTP2.md`: each message on the wire is
  * `[1-byte compressed flag][4-byte big-endian length][payload]`) and the
  * protobuf encoding (proto3 `string data = 1` ⇒ tag byte 0x0A, varint
  * length, UTF-8 bytes; `Response` is the empty message). Hand-rolling
  * these ~100 lines keeps the transport on the container's stock netty
  * HTTP/2 codec with zero extra dependencies, while staying
  * wire-compatible with any stock gRPC client or server (including the
  * reference's Go binaries).
  */
private[graft] object FileBufWire {

  /** :path of the one RPC (`/<package>.<Service>/<Method>`). */
  val Path = "/filebuf.FileBufferService/CreateDataStreamer"

  val ContentType = "application/grpc"

  // ---- protobuf --------------------------------------------------------

  private def varintSize(v: Int): Int = {
    var n = 1
    var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  private def writeVarint(buf: ByteBuf, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { buf.writeByte((v & 0x7f) | 0x80); v >>>= 7 }
    buf.writeByte(v)
  }

  private def readVarint(buf: ByteBuf): Long = {
    var shift = 0
    var out = 0L
    var b = 0
    do {
      b = buf.readUnsignedByte()
      out |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0 && shift < 64)
    out
  }

  /** `Request{data}` as protobuf bytes (empty string ⇒ empty message,
    * proto3 default-value omission).
    */
  def encodeRequest(data: String): Array[Byte] = {
    val bytes = data.getBytes(StandardCharsets.UTF_8)
    if (bytes.isEmpty) return Array.emptyByteArray
    val buf = Unpooled.buffer(1 + varintSize(bytes.length) + bytes.length)
    buf.writeByte(0x0a) // field 1, wire type 2 (LEN)
    writeVarint(buf, bytes.length)
    buf.writeBytes(bytes)
    val out = new Array[Byte](buf.readableBytes())
    buf.readBytes(out)
    buf.release()
    out
  }

  /** Decode `Request.data` from a protobuf message, skipping unknown
    * fields per wire type (forward-compatible, like any proto parser).
    */
  def decodeRequestData(msg: ByteBuf): String = {
    var data = ""
    while (msg.isReadable) {
      val tag = readVarint(msg)
      val wireType = (tag & 0x7).toInt
      val field = (tag >>> 3).toInt
      wireType match {
        case 2 =>
          val len = readVarint(msg).toInt
          if (field == 1) {
            data = msg.readCharSequence(len, StandardCharsets.UTF_8).toString
          } else msg.skipBytes(len)
        case 0 => readVarint(msg)
        case 1 => msg.skipBytes(8)
        case 5 => msg.skipBytes(4)
        case other =>
          throw new IllegalArgumentException(s"unsupported protobuf wire type $other")
      }
    }
    data
  }

  // ---- gRPC message framing -------------------------------------------

  /** One length-prefixed gRPC message frame around `payload`. */
  def frame(payload: Array[Byte]): ByteBuf = {
    val buf = Unpooled.buffer(5 + payload.length)
    buf.writeByte(0) // uncompressed
    buf.writeInt(payload.length)
    buf.writeBytes(payload)
    buf
  }

  /** The empty `Response{}` as one framed gRPC message. */
  def framedEmptyResponse(): ByteBuf = frame(Array.emptyByteArray)

  /** Incremental decoder for a stream of length-prefixed gRPC messages
    * arriving in arbitrary DATA-frame chunks. Not thread-safe; one per
    * HTTP/2 stream (netty guarantees per-channel serial execution).
    */
  /** Maximum accepted inbound message length — stock gRPC servers default
    * to 4 MiB; without a cap, one peer declaring a 2^31-1 length would
    * make the receiver accumulate the whole stream in memory before ever
    * decoding (driver-side OOM from a single bad client).
    */
  val MaxInboundMessageBytes: Int = 4 * 1024 * 1024

  final class MessageDecoder {
    private val acc = Unpooled.compositeBuffer()

    /** Feed a chunk (ownership transferred) and decode every complete
      * message, invoking `onMessage` with a view over the payload bytes.
      * Throws on an over-limit declared length (the caller's
      * exceptionCaught tears down just that stream, mirroring gRPC's
      * RESOURCE_EXHAUSTED behavior).
      */
    def feed(chunk: ByteBuf, onMessage: ByteBuf => Unit): Unit = {
      acc.addComponent(true, chunk)
      var progressing = true
      while (progressing && acc.readableBytes() >= 5) {
        val flag = acc.getByte(acc.readerIndex())
        if (flag != 0)
          throw new IllegalStateException(
            "compressed gRPC message received but no compression negotiated")
        val len = acc.getInt(acc.readerIndex() + 1)
        if (len < 0 || len > MaxInboundMessageBytes)
          throw new IllegalStateException(
            s"gRPC message of $len bytes exceeds the $MaxInboundMessageBytes-byte limit")
        if (acc.readableBytes() >= 5L + len) {
          acc.skipBytes(5)
          val msg = acc.readSlice(len)
          onMessage(msg)
          acc.discardReadComponents()
        } else progressing = false
      }
    }

    def release(): Unit = acc.release()
  }
}
