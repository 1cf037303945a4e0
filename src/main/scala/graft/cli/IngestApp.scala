package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.config.GraftConfig
import graft.pipeline.Ingest
import graft.streaming.StreamingIngest

/** Config-driven ingest entrypoint — the engine's analog of the
  * reference's four binaries (`cmd/{filelog,syslog,kafkalog,filegrpc}`),
  * collapsed into one: the transport is a flag, the parse/cast pipeline is
  * the YAML config, the sink is a flag.
  *
  * Usage:
  * {{{
  * IngestApp --config cfg.yaml --mode stream --source file --input /logs \
  *   [--archive-dir /archive] [--backup-files 7] [--backup-max-age-ms 604800000] \
  *   [--dead-letter /rejects] [--live-port 8080] \
  *   --sink parquet --output /warehouse/access_log \
  *   [--checkpoint /chk] [--trigger-ms 2000] [--batch-size 5000] \
  *   [--master local[*]]
  * }}}
  *
  * Sources: `file` (S1/S2 rotating-scan parity via cleanSource/archive),
  * `socket` (S4 dev syslog; RFC3164 envelope stripped), `syslog-tcp` /
  * `syslog-udp` / `syslog-unix` (S4 native), `syslog` (the reference
  * server's multi-listener mode: `--listeners tcp,udp,unix` unioned into
  * one pipeline; `--tcp-port`/`--udp-port`/`--socket-path`), `kafka` (S5
  * stock connector;
  * `--brokers`, `--topic`), `kafka-lite` (S5 native wire, magic-2 to
  * 4.x brokers or magic-0 legacy — no Kafka jars needed; `--brokers`,
  * `--topic`, `--starting-offsets`, `--max-offsets`, `--dialect`,
  * `--sasl-user`/`--sasl-password`/`--sasl-mechanism` for SASL PLAIN or
  * SCRAM-SHA-256), `filebuf` (S6 native
  * gRPC stream server; `--port`).
  * Sinks: `parquet` (K4 parity: insert_date + month partitioning), `jdbc`
  * (K1 parity: batched, retried — `--url`, `--table`), `filebuf` (K3 gRPC
  * relay to a remote FileBuf server; `--sink-port`), `kafka-lite` (K2
  * native producer relay; `--sink-topic`, `--compress
  * none|gzip|snappy|lz4|zstd`),
  * `console` (dev). `--mode batch` reads `--input` as a static
  * text directory and writes once — same pipeline, bounded input.
  * `--dead-letter` persists rejected raw lines (delivers the reference's
  * README.md:30 TODO).
  */
object IngestApp {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    def need(k: String): String =
      opts.getOrElse(k, sys.error(s"missing required flag --$k"))

    val cfg = GraftConfig.fromYamlFile(need("config")).fold(sys.error, identity)
    // reuse an embedding application's session (tests, notebooks) and leave
    // its lifecycle alone; stop only a session this main created
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: the ASCII corpus makes them identical,
      // and ICU's CollationAwareUTF8String class-init stalls 20-110 s when
      // the JIT queue is busy (measured; first lower()/upper() pays it)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    // expose parse_log_line/dot_product/... to spark.sql on this session
    graft.plans.GraftExtensions.install(spark)

    val triggerMs = opts.getOrElse("trigger-ms", "2000").toLong
    val batchSize = opts.getOrElse("batch-size", "5000").toInt
    val checkpoint = opts.getOrElse("checkpoint",
      s"/tmp/graft-checkpoint-${cfg.logsTable}")

    opts.getOrElse("mode", "stream") match {
      case "batch" =>
        val lines = spark.read.text(need("input")).toDF("value")
        val (good, bad) = Ingest.parseWithDeadLetter(lines, cfg)
        opts.get("dead-letter").foreach(p => bad.write.mode("append").text(p))
        opts.getOrElse("sink", "parquet") match {
          case "parquet" =>
            Ingest.withInsertDate(good).write.mode("append").parquet(need("output"))
          case "jdbc" =>
            good.write.format("jdbc").option("url", need("url"))
              .option("dbtable", need("table")).option("batchsize", batchSize)
              .mode("append").save()
          case "console" => good.show(100, truncate = false)
          case other     => sys.error(s"unknown sink: $other")
        }

      case "stream" =>
        val lines = opts.getOrElse("source", "file") match {
          case "file" => StreamingIngest.fileSource(spark, need("input"),
            archiveDir = opts.get("archive-dir"))
          case "socket" => StreamingIngest.stripSyslogEnvelope(
            StreamingIngest.socketSource(spark,
              opts.getOrElse("host", "localhost"), need("port").toInt))
          case "syslog-tcp" => StreamingIngest.stripSyslogEnvelope(
            StreamingIngest.syslogTcpSource(spark,
              opts.getOrElse("host", "localhost"), need("port").toInt))
          case "syslog-udp" => StreamingIngest.stripSyslogEnvelope(
            StreamingIngest.syslogUdpSource(spark, need("port").toInt,
              bind = opts.getOrElse("bind", "0.0.0.0")))
          case "syslog-unix" => StreamingIngest.stripSyslogEnvelope(
            StreamingIngest.syslogUnixSource(spark, need("socket-path")))
          // the reference syslog server's --listeners: any subset of
          // tcp/udp/unix running SIMULTANEOUSLY into one pipeline
          // (`internal/services/syslog/syslog.go:33-53` starts all
          // configured listeners against one handler) — here a union of
          // the native sources, one streaming plan
          case "syslog" =>
            // .distinct: '--listeners tcp,tcp' would build two sources
            // binding the same port and die at stream start with an opaque
            // bind error; a repeated listener can only mean "that one, once"
            val ls = opts.getOrElse("listeners", "tcp").split(',').map(_.trim).distinct
            require(ls.nonEmpty && ls.forall(Set("tcp", "udp", "unix")),
              s"--listeners must be a comma list of tcp/udp/unix, got '${ls.mkString(",")}'")
            val dfs = ls.toSeq.map {
              case "tcp" => StreamingIngest.syslogTcpSource(spark,
                opts.getOrElse("host", "localhost"), need("tcp-port").toInt)
              case "udp" => StreamingIngest.syslogUdpSource(spark,
                need("udp-port").toInt, bind = opts.getOrElse("bind", "0.0.0.0"))
              case "unix" => StreamingIngest.syslogUnixSource(spark, need("socket-path"))
            }
            StreamingIngest.stripSyslogEnvelope(dfs.reduce(_ unionByName _))
          case "kafka" => StreamingIngest.kafkaSource(spark, need("brokers"), need("topic"))
          case "kafka-lite" => StreamingIngest.kafkaLiteSource(spark,
            need("brokers"), need("topic"),
            startingOffsets = opts.getOrElse("starting-offsets", "earliest"),
            maxOffsetsPerTrigger = opts.get("max-offsets").map(_.toLong),
            dialect = opts.getOrElse("dialect", "modern"),
            saslUser = opts.get("sasl-user"),
            saslPass = opts.get("sasl-password"),
            saslMechanism = opts.getOrElse("sasl-mechanism", "PLAIN"))
          case "filebuf" => StreamingIngest.filebufSource(spark, need("port").toInt,
            bind = opts.getOrElse("bind", "0.0.0.0"))
          case other   => sys.error(s"unknown source: $other")
        }
        val (good, bad) = Ingest.parseWithDeadLetter(lines, cfg)
        // dead-letter stream: raw rejected lines to text files
        opts.get("dead-letter").foreach { p =>
          bad.writeStream.format("text").option("path", p)
            .option("checkpointLocation", s"$checkpoint-dead")
            .trigger(Trigger.ProcessingTime(triggerMs)).start()
        }
        val writer = opts.getOrElse("sink", "parquet") match {
          case "parquet" =>
            StreamingIngest.parquetSink(good, need("output"), checkpoint,
              flushIntervalMs = triggerMs)
          case "jdbc" =>
            StreamingIngest.jdbcSink(good, need("url"), need("table"), checkpoint,
              batchSize = batchSize, flushIntervalMs = triggerMs)
          case "console" =>
            good.writeStream.format("console")
              .option("checkpointLocation", checkpoint)
              .trigger(Trigger.ProcessingTime(triggerMs))
          // raw-line relay to a remote FileBuf gRPC server (K3; pairs with
          // `--source filebuf` on the receiving engine) — relays the raw
          // `value` column like the reference's client, so it reads from
          // the source directly rather than the parsed stream
          case "filebuf" =>
            StreamingIngest.filebufSink(lines,
              opts.getOrElse("host", "localhost"), need("sink-port").toInt,
              checkpoint).trigger(Trigger.ProcessingTime(triggerMs))
          // raw-line relay to a Kafka topic over the native v0 wire (K2;
          // the reference kafkalog client's role) — like filebuf, relays
          // the raw source stream, not the parsed one
          case "kafka-lite" =>
            StreamingIngest.kafkaLiteSink(lines, need("brokers"),
              need("sink-topic"), checkpoint, produceBatch = batchSize,
              dialect = opts.getOrElse("dialect", "modern"),
              produceCodec = opts.getOrElse("compress", "none"),
              saslUser = opts.get("sasl-user"),
              saslPass = opts.get("sasl-password"),
              saslMechanism = opts.getOrElse("sasl-mechanism", "PLAIN"))
              .trigger(Trigger.ProcessingTime(triggerMs))
          case other => sys.error(s"unknown sink: $other")
        }
        val query = StreamingIngest.withGracefulStop(writer.start())
        // --live-port: the reference's run-http-server/bind-address pair —
        // 200 {"status":"live"} while the query runs, 503 after
        val live = opts.get("live-port").map(p =>
          StreamingIngest.serveLiveness(query, p.toInt))
        // --backup-files/--backup-max-age-ms: S2 retention over the
        // archive dir (the reference prunes on its scrape timer; here a
        // daemon sweep per trigger interval)
        for (dir <- opts.get("archive-dir")
             if opts.contains("backup-files") || opts.contains("backup-max-age-ms")) {
          val maxFiles = opts.get("backup-files").map(_.toInt).getOrElse(Int.MaxValue)
          val maxAge = opts.get("backup-max-age-ms").map(_.toLong).getOrElse(Long.MaxValue)
          val t = new Thread(() => while (query.isActive) {
            try StreamingIngest.pruneArchive(dir, maxFiles, maxAge)
            catch { case _: Throwable => () }
            Thread.sleep(math.max(1000L, triggerMs))
          }, "graft-archive-retention")
          t.setDaemon(true)
          t.start()
        }
        query.awaitTermination()
        live.foreach(_.stop(0))

      case other => sys.error(s"unknown mode: $other")
    }
    if (!preExisting) spark.stop()
  }
}
