package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs, and per-batch "decode /
  * feature-extract" runs as mapPartitions over the binary column — the
  * Scala-side equivalent of the mapInPandas batch shape (iterator of
  * batches in, iterator of batches out; one decoder init per partition).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] produces deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, batch iteration,
  * partitioning, output encoder — is real and tested.
  */
object Multimodal {

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", IntegerType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("brightness", DoubleType)))

  /** STUB decoder: where a real pipeline would call an image codec, this
    * derives deterministic fake dimensions/brightness from the payload
    * bytes. Replace the body with the real codec at deployment. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val w = 64 + (if (n > 0) (bytes(0) & 0x7f) else 0)
    val h = 64 + (if (n > 1) (bytes(1) & 0x7f) else 0)
    val brightness =
      if (n == 0) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n / 255.0
    (w, h, brightness)
  }

  /** Batched decode over the media frame: one decoder context per
    * partition (the expensive init a real codec needs), rows streamed
    * through it lazily — never materialized per-partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media", "meta.format", "meta.n_bytes")
      .mapPartitions { rows =>
        // real pipeline: val codec = Codec.init() — once per partition
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h, br) = decodeStub(bytes)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            r.getAs[Int]("n_bytes"), w, h, br)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("offset", LongType),
    StructField("frame_sha", StringType)))

  private def hexLower(bytes: Array[Byte]): String = {
    val hc = "0123456789abcdef"
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hc((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hc(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Frame sampling for video-like payloads: each media row yields k
    * evenly-spaced frames (frame_idx, byte offset, frame digest). Same
    * mapPartitions batch shape as [[decodeFeatures]] — one codec init per
    * partition, rows stream lazily, output fan-out k per row. The frame
    * "content" is a STUB digest (md5 of payload-sha:idx) so the plumbing is
    * externally replayable; a real deployment swaps in the demuxer. */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      // real pipeline: val demux = Demuxer.init() — once per partition
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val payloadSha = hexLower(sha.digest(bytes))
        (0 until k).iterator.map { i =>
          val frameSha = hexLower(md5.digest(
            s"$payloadSha:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          Row(id, i, (i.toLong * bytes.length) / k, frameSha)
        }
      }
    }(enc)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("src_width", IntegerType),
    StructField("src_height", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resized", BinaryType)))

  /** Resize plumbing: decode (stub) → scale to fit (targetW, targetH)
    * preserving aspect ratio → re-encode (stub: payload truncated/padded to
    * the area-scaled byte count). Same partition-batched shape as the other
    * codec paths — one resizer init per partition, rows streamed. A real
    * deployment replaces the two stub calls with the image library. */
  def resizeMedia(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      // real pipeline: val resizer = Codec.init() — once per partition
      rows.map { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val (w, h, _) = decodeStub(bytes)
        val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
        val nw = math.max(1, math.rint(w * scale).toInt)
        val nh = math.max(1, math.rint(h * scale).toInt)
        // stub re-encode: byte count scales with the area ratio
        val outLen = math.max(1,
          (bytes.length.toLong * nw * nh / (w.toLong * h)).toInt)
        val out = java.util.Arrays.copyOf(bytes, outLen)
        Row(id, w, h, nw, nh, out)
      }
    }(enc)
  }

  /** Wrap any (id, text) frame into the multimodal schema for testing:
    * payload = utf-8 bytes, metadata stamped from the payload. */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      struct(lit("text/plain").as("format"),
        length(col(textCol).cast("binary")).as("n_bytes")).as("meta"))
}
