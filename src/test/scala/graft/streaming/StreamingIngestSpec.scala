package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.GraftConfig

/** Streaming pipeline tests: MemoryStream → parse → memory sink (SURVEY §5
  * port test plan item 4).
  */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val cfg = GraftConfig(
    logFormat = "$remote_addr - $remote_user [$time_local] \"$request\" $status $bytes_sent $request_time",
    columns = Seq("remote_addr", "remote_user", "time_local", "request",
      "status", "bytes_sent", "request_time").map(c => c -> c).toMap,
    logsTable = "access_log")

  val goodLine =
    "10.0.0.1 - - [21/Jul/2022:00:30:43 +0000] \"GET /x HTTP/1.1\" 200 512 0.05"
  val badLine = "complete garbage"
  val badCast =
    "10.0.0.1 - - [21/Jul/2022:00:30:43 +0000] \"GET /x HTTP/1.1\" abc 512 0.05"

  test("memory stream → parse → memory sink: drops malformed, types good rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val parsed = StreamingIngest.parse(stream.toDF().toDF("value"), cfg)
    val q = parsed.writeStream.format("memory")
      .queryName("ingest_test").outputMode("append").start()
    try {
      stream.addData(goodLine, badLine, badCast, goodLine)
      q.processAllAvailable()
      val out = spark.table("ingest_test").collect()
      assert(out.length == 2)
      val r = out.head
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("bytes_sent") == 512L)
      assert(r.getAs[java.sql.Timestamp]("time_local") ==
        java.sql.Timestamp.valueOf("2022-07-21 00:30:43"))
    } finally q.stop()
  }

  test("windowed aggregation with watermark over the stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = stream.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val q = agg.writeStream.format("memory")
      .queryName("win_test").outputMode("update").start()
    try {
      stream.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .select(col("window.start").cast("string"), col("n"), col("v"))
        .as[(String, Long, Double)].collect().map { case (k, n, v) => (k, (n, v)) }.toMap
      assert(rows("2024-01-01 00:00:00") == (2L, 3.0))
      assert(rows("2024-01-01 00:05:00") == (1L, 4.0))
    } finally q.stop()
  }

  test("syslog envelope strip (RFC3164)") {
    val df = Seq(
      "<34>Oct 11 22:14:15 myhost nginx: " + goodLine,
      "<13>Jan  2 03:04:05 h2 app[77]: payload here").toDF("value")
    val out = StreamingIngest.stripSyslogEnvelope(df).as[String].collect()
    assert(out(0) == goodLine)
    assert(out(1) == "payload here")
  }

  test("file source streaming end-to-end with archive cleanup") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/access.log"),
      s"$goodLine\n$badLine\n$goodLine\n")
    val lines = StreamingIngest.fileSource(spark, inDir, archiveDir = Some(s"$tmp/archive"))
    val parsed = StreamingIngest.parse(lines, cfg)
    val q = StreamingIngest.parquetSink(parsed, outDir, cp).start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() == 2)
    assert(written.columns.contains("insert_month"))
    assert(written.select("insert_month").distinct().as[String].collect().head == "202207")
  }

  test("jdbc sink end-to-end against embedded Derby (K1 parity: batch insert + retry loop)") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftk1;create=true"
    val stream = MemoryStream[String]
    val parsed = StreamingIngest.parse(stream.toDF().toDF("value"), cfg)
    val cp = java.nio.file.Files.createTempDirectory("graft_jdbc_cp").toString
    val q = StreamingIngest.jdbcSink(parsed, url, "access_log", cp,
      batchSize = 2, flushIntervalMs = 100).start()
    try {
      stream.addData(goodLine, badLine, goodLine, badCast)
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "access_log").load()
    assert(back.count() == 2) // two good lines; garbage + bad cast dropped
    assert(back.where(col("status") === 200).count() == 2)
    assert(back.where(col("bytes_sent") === 512L).count() == 2)
  }

  test("jdbc sink: retry survives induced failure; checkpoint replays the failed batch") {
    implicit val sqlCtx = spark.sqlContext
    // the database does NOT exist yet: every write against plainUrl fails
    // until the test creates it (Derby only materializes an in-memory db
    // under ;create=true)
    val plainUrl = "jdbc:derby:memory:graftk1retry"
    val createUrl = "jdbc:derby:memory:graftk1retry;create=true"
    val stream = MemoryStream[String]
    val parsed = StreamingIngest.parse(stream.toDF().toDF("value"), cfg)
    val cp = java.nio.file.Files.createTempDirectory("graft_jdbc_retry_cp").toString

    // phase 1: no retries → the micro-batch fails and kills the query,
    // leaving the batch UNCOMMITTED in the checkpoint
    val q1 = StreamingIngest.jdbcSink(parsed, plainUrl, "access_log", cp,
      maxRetries = 0, flushIntervalMs = 50).start()
    stream.addData(goodLine, badLine, goodLine)
    intercept[Exception] { q1.processAllAvailable() }
    assert(q1.exception.isDefined)

    // phase 2: same checkpoint, retries on → attempt 1 still fails (db
    // absent), the db appears mid-backoff, a later attempt succeeds: the
    // replayed batch lands exactly once
    val creator = new Thread(() => {
      Thread.sleep(700)
      java.sql.DriverManager.getConnection(createUrl).close()
    })
    creator.start()
    val q2 = StreamingIngest.jdbcSink(parsed, plainUrl, "access_log", cp,
      maxRetries = 10, flushIntervalMs = 50).start()
    try {
      q2.processAllAvailable()
      creator.join()
      val back = spark.read.format("jdbc")
        .option("url", plainUrl).option("dbtable", "access_log").load()
      assert(back.count() == 2) // replayed batch, two good lines, no dupes
      // phase 3: stream continues on the recovered query
      stream.addData(goodLine)
      q2.processAllAvailable()
      assert(spark.read.format("jdbc")
        .option("url", plainUrl).option("dbtable", "access_log").load().count() == 3)
    } finally q2.stop()
  }

  test("native syslog-tcp DSv2 source end-to-end (S4 transport parity)") {
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val sent = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("<34>Oct 11 22:14:15 myhost nginx: " + goodLine)
      out.println("<34>Oct 11 22:14:16 myhost nginx: " + badLine)
      out.println("<34>Oct 11 22:14:17 myhost nginx: " + goodLine)
      out.flush()
      sent.countDown()
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()

    val lines = StreamingIngest.syslogTcpSource(spark, "localhost", port)
    val parsed = StreamingIngest.parse(StreamingIngest.stripSyslogEnvelope(lines), cfg)
    val q = parsed.writeStream.format("memory")
      .queryName("syslog_tcp_test").outputMode("append").start()
    try {
      sent.await(10, java.util.concurrent.TimeUnit.SECONDS)
      // lines flow through the driver-side listener buffer; poll until the
      // two good rows land (bounded)
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("syslog_tcp_test").count()
        if (n < 2) Thread.sleep(200)
      }
      assert(n == 2)
      val r = spark.table("syslog_tcp_test").collect().head
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("bytes_sent") == 512L)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("native syslog-udp DSv2 source end-to-end (S4 UDP transport parity)") {
    val probe = new java.net.DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close() // freed for the source to bind (loopback test; tiny race is fine)

    val lines = StreamingIngest.syslogUdpSource(spark, port, bind = "127.0.0.1")
    val parsed = StreamingIngest.parse(StreamingIngest.stripSyslogEnvelope(lines), cfg)
    val q = parsed.writeStream.format("memory")
      .queryName("syslog_udp_test").outputMode("append").start()
    val sender = new java.net.DatagramSocket()
    try {
      val addr = new java.net.InetSocketAddress("127.0.0.1", port)
      def send(msg: String): Unit = {
        val b = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        sender.send(new java.net.DatagramPacket(b, b.length, addr))
      }
      // the listener binds lazily on the first micro-batch; resend each
      // poll round (UDP is fire-and-forget — datagrams before bind vanish,
      // which is exactly the documented at-most-once contract)
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        send("<34>Oct 11 22:14:15 myhost nginx: " + goodLine)
        send("<34>Oct 11 22:14:16 myhost nginx: " + badLine)
        send("<34>Oct 11 22:14:17 myhost nginx: " + goodLine)
        q.processAllAvailable()
        n = spark.table("syslog_udp_test").count()
        if (n < 2) Thread.sleep(200)
      }
      assert(n >= 2) // both good lines landed; garbage dropped
      val r = spark.table("syslog_udp_test").collect().head
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("bytes_sent") == 512L)
    } finally {
      q.stop()
      sender.close()
    }
  }

  test("multi-listener syslog: tcp + udp unioned into ONE pipeline (server parity)") {
    // the reference syslog server runs all configured listeners against a
    // single handler (`syslog.go:33-53`); here the same shape is the union
    // of two native DSv2 sources inside one streaming query
    val server = new java.net.ServerSocket(0)
    val tcpPort = server.getLocalPort
    val probe = new java.net.DatagramSocket(0)
    val udpPort = probe.getLocalPort
    probe.close()

    val tcpWriter = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("<34>Oct 11 22:14:15 tcphost nginx: " + goodLine)
      out.flush()
      Thread.sleep(30000)
      sock.close()
    })
    tcpWriter.setDaemon(true)
    tcpWriter.start()

    val unioned = StreamingIngest.syslogTcpSource(spark, "localhost", tcpPort)
      .unionByName(StreamingIngest.syslogUdpSource(spark, udpPort, bind = "127.0.0.1"))
    val parsed = StreamingIngest.parse(StreamingIngest.stripSyslogEnvelope(unioned), cfg)
    val q = parsed.writeStream.format("memory")
      .queryName("syslog_multi_test").outputMode("append").start()
    val sender = new java.net.DatagramSocket()
    try {
      val addr = new java.net.InetSocketAddress("127.0.0.1", udpPort)
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        val b = ("<34>Oct 11 22:14:16 udphost nginx: " + goodLine)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        sender.send(new java.net.DatagramPacket(b, b.length, addr))
        q.processAllAvailable()
        n = spark.table("syslog_multi_test").count()
        if (n < 2) Thread.sleep(200)
      }
      // one line over each transport, both through the one pipeline
      assert(n >= 2)
      assert(spark.table("syslog_multi_test")
        .where(col("status") === 200).count() == n)
    } finally {
      q.stop()
      sender.close()
      server.close()
    }
  }

  test("native syslog-unix DSv2 source end-to-end (S4 UNIX transport parity)") {
    val path = java.nio.file.Files.createTempDirectory("graft_unixsock").toString + "/syslog.sock"
    val lines = StreamingIngest.syslogUnixSource(spark, path)
    val parsed = StreamingIngest.parse(StreamingIngest.stripSyslogEnvelope(lines), cfg)
    val q = parsed.writeStream.format("memory")
      .queryName("syslog_unix_test").outputMode("append").start()
    try {
      // listener binds lazily on the first micro-batch — wait for the socket file
      val deadline = System.currentTimeMillis() + 30000
      q.processAllAvailable()
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)) &&
        System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val ch = java.nio.channels.SocketChannel.open(
        java.net.UnixDomainSocketAddress.of(path))
      val msg = ("<34>Oct 11 22:14:15 myhost nginx: " + goodLine + "\n" +
        "<34>Oct 11 22:14:16 myhost nginx: " + badLine + "\n" +
        "<34>Oct 11 22:14:17 myhost nginx: " + goodLine + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ch.write(java.nio.ByteBuffer.wrap(msg))
      ch.close()
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("syslog_unix_test").count()
        if (n < 2) Thread.sleep(200)
      }
      assert(n == 2) // two good lines; garbage dropped
      val r = spark.table("syslog_unix_test").collect().head
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("bytes_sent") == 512L)
    } finally q.stop()
  }

  test("archive retention prunes by count and age (S2 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_archive").toString
    (1 to 6).foreach { i =>
      val f = java.nio.file.Paths.get(s"$dir/log-$i.txt")
      java.nio.file.Files.writeString(f, s"line $i")
      f.toFile.setLastModified(System.currentTimeMillis() - i * 60000L)
    }
    // keep 3 newest AND nothing older than 4.5 minutes
    val deleted = StreamingIngest.pruneArchive(dir, maxFiles = 3, maxAgeMs = 270000L)
    val left = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(deleted == 3)
    assert(left == Seq("log-1.txt", "log-2.txt", "log-3.txt"))
  }

  test("liveness endpoint: 200 while active, 503 after stop") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = stream.toDF().writeStream.format("memory")
      .queryName("live_test").outputMode("append").start()
    val server = StreamingIngest.serveLiveness(q, 0)
    val port = server.getAddress.getPort
    def probe(): Int = {
      val conn = new java.net.URL(s"http://localhost:$port/live")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      try conn.getResponseCode finally conn.disconnect()
    }
    try {
      assert(probe() == 200)
      q.stop()
      assert(probe() == 503)
    } finally server.stop(0)
  }
}
