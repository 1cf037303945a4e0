package graft.sources

import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicLong

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, EventLoopGroup}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamChannelBootstrap}

/** FileBuf gRPC client — the sink half of the reference's gRPC transport
  * (K3, `/root/reference/internal/services/filegrpc/client.go:102-136`):
  * opens `parallelism` concurrent `CreateDataStreamer` streams over one
  * HTTP/2 connection, round-robins lines across them, and on close
  * half-closes each stream and awaits the server's `Response` +
  * `grpc-status: 0` trailers (the reference's `CloseAndRecv`).
  *
  * Same hand-rolled public wire format as [[FileBufServer]] — works
  * against any stock gRPC server exposing the FileBuf service.
  *
  * Thread-safety: `send` may be called from one caller thread (the
  * executor partition iterator); netty handles the async I/O.
  */
private[graft] object FileBufClient {
  /** Messages between explicit flushes on the send path. */
  val FlushEvery = 64
}

private[graft] class FileBufClient(host: String, port: Int, parallelism: Int = 1) {

  require(parallelism >= 1, "parallelism must be >= 1")

  private val group: EventLoopGroup = new NioEventLoopGroup(1)
  private val counter = new AtomicLong(0L)

  // any failure after the event loop exists must release it — a retry loop
  // constructing a client per attempt would otherwise leak one loop thread
  // + selector per failed connect
  private val channel: Channel =
    try {
      new Bootstrap()
        .group(group)
        .channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[SocketChannel] {
          override def initChannel(ch: SocketChannel): Unit =
            ch.pipeline().addLast(
              Http2FrameCodecBuilder.forClient().build(),
              // server-initiated streams are not part of gRPC; drop them
              new Http2MultiplexHandler(new ChannelInitializer[Channel] {
                override def initChannel(stream: Channel): Unit = ()
              }))
        })
        .connect(host, port).sync().channel()
    } catch {
      case e: Throwable =>
        group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
        throw e
    }

  /** Completion latch per stream: set to the grpc-status when trailers
    * arrive.
    */
  private class ResponseHandler extends ChannelInboundHandlerAdapter {
    @volatile var status: Option[String] = None
    private val done = new java.util.concurrent.CountDownLatch(1)
    private val writable = new Object

    override def channelWritabilityChanged(ctx: ChannelHandlerContext): Unit = {
      writable.synchronized { writable.notifyAll() }
      super.channelWritabilityChanged(ctx)
    }

    /** Park until `ready()` holds, the deadline passes (false), or the
      * monitor is signalled by a writability flip / stream close. The
      * bounded wait slice is a belt-and-braces guard against a
      * notification racing ahead of the first wait.
      */
    def awaitReady(ready: () => Boolean, deadlineNanos: Long): Boolean =
      writable.synchronized {
        while (!ready()) {
          val remainMs = (deadlineNanos - System.nanoTime()) / 1000000L
          if (remainMs <= 0) return false
          writable.wait(math.min(remainMs, 100L))
        }
        true
      }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        val s = h.headers().get("grpc-status")
        if (s != null) status = Some(s.toString)
        if (h.isEndStream) done.countDown()
      case d: Http2DataFrame =>
        // the empty Response message — consume and replenish the window
        val consumed = d.initialFlowControlledBytes()
        d.release()
        if (consumed > 0) { ctx.write(new DefaultHttp2WindowUpdateFrame(consumed)); ctx.flush() }
      case other => io.netty.util.ReferenceCountUtil.release(other)
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      done.countDown()
      writable.synchronized { writable.notifyAll() } // wake a blocked send()
      super.channelInactive(ctx)
    }

    def await(timeoutSec: Long): Boolean = done.await(timeoutSec, TimeUnit.SECONDS)
  }

  private val streams: Array[(Http2StreamChannel, ResponseHandler)] =
    try {
      Array.fill(parallelism) {
        val handler = new ResponseHandler
        val stream = new Http2StreamChannelBootstrap(channel)
          .handler(new ChannelInitializer[Channel] {
            override def initChannel(ch: Channel): Unit =
              ch.pipeline().addLast(handler)
          })
          .open().sync().getNow
        val headers = new DefaultHttp2Headers()
          .method("POST").scheme("http").path(FileBufWire.Path)
          .authority(s"$host:$port")
        headers.add("content-type", FileBufWire.ContentType)
        headers.add("te", "trailers")
        stream.writeAndFlush(new DefaultHttp2HeadersFrame(headers, false)).sync()
        (stream, handler)
      }
    } catch {
      case e: Throwable =>
        try channel.close() catch { case _: Throwable => () }
        group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
        throw e
    }

  /** Send one line as one `Request` message on the next stream
    * (round-robin, like the reference's worker pool). Writes are pipelined:
    * frames enqueue to the event loop and flush every [[FileBufClient.FlushEvery]]
    * messages (plus a final flush in [[close]]), so a partition's send loop
    * never blocks on per-line network round trips; write failures surface
    * at close() via the missing/failed grpc-status, which fails the batch.
    *
    * BACKPRESSURE: when a stream's outbound buffer passes netty's
    * high-water mark (the HTTP/2 flow-control window is exhausted and the
    * pending queue has grown), `isWritable` turns false and send() parks
    * on a monitor signalled by `channelWritabilityChanged` until the
    * server drains — without this, relaying a large partition to a slow
    * server queues the entire un-acked backlog on the executor heap.
    */
  def send(line: String): Unit = {
    // mirror the receiver's inbound cap and fail FAST with an actionable
    // error: past the server's MessageDecoder limit the stream would be
    // torn down mid-batch and Spark would retry the same oversized line
    // forever (a poison pill); 4 bytes/char bounds UTF-8 worst case so
    // the common path pays no encode
    if (line.length.toLong * 4 + 8 > FileBufWire.MaxInboundMessageBytes &&
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 8 >
          FileBufWire.MaxInboundMessageBytes)
      throw new java.io.IOException(
        s"filebuf sink: line of ${line.length} chars exceeds the " +
          s"${FileBufWire.MaxInboundMessageBytes}-byte gRPC message limit — " +
          "split or drop it before the sink (dead-letter)")
    val i = counter.getAndIncrement()
    val (stream, handler) = streams(((i % parallelism) + parallelism).toInt % parallelism)
    if (!stream.isWritable) {
      stream.flush()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      val ok = handler.awaitReady(() => stream.isWritable || !stream.isActive, deadline)
      if (!ok)
        throw new java.io.IOException(
          "filebuf sink: stream not writable for 60s (server not draining)")
      if (!stream.isActive)
        throw new java.io.IOException("filebuf sink: stream closed while sending")
    }
    stream.write(new DefaultHttp2DataFrame(
      FileBufWire.frame(FileBufWire.encodeRequest(line)), false))
    if (i % FileBufClient.FlushEvery == 0) streams.foreach(_._1.flush())
  }

  /** Half-close every stream, await each server response, tear down.
    * Throws if any stream did not complete with `grpc-status: 0` —
    * callers (foreachBatch sinks) surface that as a batch failure so
    * Spark retries the batch.
    */
  def close(awaitSec: Long = 30): Unit = {
    try {
      streams.foreach { case (stream, _) =>
        stream.write(new DefaultHttp2DataFrame(Unpooled.EMPTY_BUFFER, true))
        stream.flush()
      }
      streams.foreach { case (_, handler) =>
        if (!handler.await(awaitSec))
          throw new java.io.IOException("filebuf sink: no response before timeout")
        if (!handler.status.contains("0"))
          throw new java.io.IOException(
            s"filebuf sink: stream closed with grpc-status ${handler.status.getOrElse("<none>")}")
      }
    } finally {
      try channel.close().sync() catch { case _: Throwable => () }
      group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
    }
  }
}
