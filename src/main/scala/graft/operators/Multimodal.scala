package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition feature extraction.
  *
  * The DECODE STEP IS A STUB (this container ships no image/audio codecs):
  * `decodeStub` produces a deterministic fake feature vector from the raw
  * bytes. Everything around it — the schema contract, the binary column
  * handling, the mapPartitions batch shape (the Scala analog of
  * mapInPandas), the partition sizing — is real and is what survives when
  * a real decoder (JNI/ONNX/ffmpeg) replaces the stub.
  *
  * Scale notes: payloads stay in executor memory one partition at a time;
  * `spark.sql.files.maxPartitionBytes` bounds the working set, and feature
  * extraction is map-only (no shuffle). Feature vectors (small) — not
  * payloads (large) — flow into downstream joins/ANN.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Build a media table from documents: payload = utf-8 bytes of the text
    * (a stand-in for image bytes; the testdata ships no binary columns),
    * with populated metadata.
    */
  def asMediaTable(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("utf8-stub").as("format"),
        lit(64).as("width"),
        lit(64).as("height"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: bytes → fixed-dim deterministic "feature" vector
    * (chunk-wise byte sums mod a prime — integer-valued floats, so the
    * DuckDB oracle reproduces them bit-exactly; a byte-mean variant would
    * compare float rounding paths across engines instead of the plumbing).
    * A real implementation decodes pixels/samples here; signature and
    * batch shape stay identical.
    */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(dim)(0f)
    val chunk = math.max(1, payload.length / dim)
    Array.tabulate(dim) { i =>
      val from = i * chunk
      val until = math.min(payload.length, from + chunk)
      if (from >= payload.length) 0f
      else {
        var s = 0L; var j = from
        while (j < until) { s += payload(j) & 0xff; j += 1 }
        (s % 1009).toFloat
      }
    }
  }

  /** Per-partition feature extraction over the binary column — the Scala
    * analog of a Pandas-UDF `mapInPandas`: one iterator pass per partition,
    * no per-row task overhead, decoder state (a real model handle) would be
    * initialized once per partition here.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder/model handle)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Row(id, decodeStub(payload, dim).toSeq)
      }
    }(enc)
  }

  /** STUB resize: treat the payload as a row-major `srcH`×`srcW` byte
    * grid and nearest-neighbor sample it down to `dstW`×`dstH` (flat index
    * clamped into the actual payload, which may be shorter than the
    * declared grid). A real implementation decodes pixels and interpolates
    * here; the grid arithmetic, clamping, and output-size contract are
    * what carry over.
    */
  private[operators] def resizeStub(payload: Array[Byte],
      srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return Array.emptyByteArray
    Array.tabulate(dstW * dstH) { i =>
      val y = i / dstW
      val x = i % dstW
      val idx = math.min(payload.length - 1, (y * srcH / dstH) * srcW + (x * srcW / dstW))
      payload(idx)
    }
  }

  /** Media resize over the binary column — same `mapPartitions` batch
    * shape as [[extractFeatures]] (map-only, decoder state per partition),
    * emitting the resized payload with updated metadata.
    */
  def resize(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = true),
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("n_bytes", LongType, nullable = true))), nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        // meta is declared nullable: a null meta row falls back to the
        // destination dimensions and a null format instead of NPE-ing
        val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        val srcW = if (meta == null || meta.isNullAt(1)) dstW else meta.getInt(1)
        val srcH = if (meta == null || meta.isNullAt(2)) dstH else meta.getInt(2)
        val fmt = if (meta == null) null else meta.getString(0)
        val out = resizeStub(payload, srcW, srcH, dstW, dstH)
        Row(id, out, Row(fmt, dstW, dstH, out.length.toLong))
      }
    }(enc)
  }

  /** "Frame sampling" over a binary payload: every `stride`-th byte window
    * as its own row (the video-frame analog; byte windows stand in for
    * decoded frames).
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val span = frameBytes * stride
    val nFrames = greatest(
      floor(length(col("payload")).cast("double") / span).cast("int"), lit(1))
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), nFrames - 1),
        i => call_function("substring", col("payload"), i * span + 1, lit(frameBytes)))))
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
