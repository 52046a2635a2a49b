package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio as an opaque `binary` column with a REAL decode path: WAV/RIFF
  * PCM is fully decodable in pure JVM (unlike the MP4 pixel path, which
  * stubs at the codec boundary — README §"Multimodal decode boundary"),
  * so this operator family parses the container AND decodes the samples:
  * chunk walk (odd-size padding per RIFF spec), fmt validation, 16-bit LE
  * PCM to integers, then per-clip features computed distributively.
  *
  * Mirrors the reference's treat-media-as-bytes model (SURVEY §2
  * multimodal row); the decode is real for any valid PCM WAV — the
  * deterministic synth corpus exists so the DuckDB oracle can replay the
  * FEATURES in closed form (pure integer sample formula) while Spark
  * exercises the full byte-level parse+decode.
  */
object Audio {

  /** Sample `i` of the synthetic clip for `id`: a pure-integer hash wave,
    * exactly replayable in SQL (no transcendental, no recurrence).
    * Range [-32768, 32767]. */
  def synthSample(id: Long, i: Long): Int =
    (((id * 2654435761L + i * 40503L) % 65536L).toInt - 32768)

  /** Synthetic clip length / rate for `id` (bounded; rate varies across
    * the common telephony/music values so fmt parsing is exercised). */
  def synthLen(id: Long): Int = 800 + (id % 400L).toInt
  def synthRate(id: Long): Int = 8000 + (id % 4L).toInt * 8000

  /** A valid 16-bit little-endian PCM WAV container. */
  def wavBytes(samples: Array[Short], sampleRate: Int,
               channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)              // bits
    buf.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** REAL RIFF parse + PCM decode: chunk walk with odd-size padding, fmt
    * chunk validated (PCM, 16-bit), data chunk decoded to samples
    * (channels interleaved, all kept). None on anything malformed. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(bytes, at, 4, "ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = buf.getShort(pos + 8).toInt
          val channels = buf.getShort(pos + 10).toInt
          val rate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22).toInt
          if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0)
            return None
          fmt = Some((channels, rate))
        case "data" => data = Some((pos + 8, len))
        case _ => () // LIST/INFO/etc — skipped, per spec
      }
      pos += 8 + len + (len & 1) // odd chunks pad one byte
    }
    for ((channels, rate) <- fmt; (off, len) <- data) yield {
      val n = len / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = buf.getShort(off + 2 * i); i += 1 }
      (rate, channels, out)
    }
  }

  /** Deterministic synthetic WAV corpus: (media_id, audio) — real RIFF
    * containers whose samples follow [[synthSample]]. Batched per
    * partition (one buffer reuse path, no driver loop). */
  def synthCorpus(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val ids = df.select(col(idCol).cast("long")).rdd.map(_.getLong(0))
    val rows = ids.mapPartitions(_.map { id =>
      val n = synthLen(id)
      val samples = Array.tabulate(n)(i => synthSample(id, i.toLong).toShort)
      Row(id, wavBytes(samples, synthRate(id)))
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("audio", BinaryType, nullable = true))))
  }

  /** Distributed per-clip features over a binary WAV column — the REAL
    * decode runs inside mapPartitions (a byte-level kernel, like the m2
    * demuxer): sample counts and rate from the container, peak /
    * zero-crossings / energy from the decoded PCM. Undecodable payloads
    * yield a row with null features (the corpus-audit shape: count the
    * bad, don't drop the evidence). */
  def wavFeatures(media: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      decodeWav(if (bytes == null) Array.emptyByteArray else bytes) match {
        case Some((rate, channels, samples)) =>
          val n = samples.length
          var peak = 0L
          var zc = 0L
          var sumSq = 0L
          var i = 0
          while (i < n) {
            val s = samples(i).toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            if (i > 0 && s * samples(i - 1).toLong < 0L) zc += 1
            sumSq += s * s
            i += 1
          }
          val durationUs = n.toLong * 1000000L / (rate.toLong * channels)
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
          Row(id, rate, channels, n.toLong, durationUs, peak, zc, sumSq, rms)
        case None =>
          Row(id, null, null, null, null, null, null, null, null)
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_us", LongType, nullable = true),
      StructField("peak", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true),
      StructField("sum_sq", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true))))
  }

  // ——— Perceptual fingerprint (the dHash of audio, m5 family) ————————————

  /** Fingerprint blocks: 65 equal time slices → 64 neighbor comparisons. */
  val FpBlocks = 65

  /** Deterministic jitter for "re-encoded copy" clips: ±2 per sample —
    * far below the block-energy scale, so the energy-gradient signs
    * survive (the perceptual-hash promise, mirroring the image path's
    * sparse +11 noise lattice). Pure integer, SQL-replayable. */
  def synthJitter(seed: Long, i: Long): Int =
    (((seed * 31L + i * 7L) % 5L) - 2L).toInt

  /** Synthetic WAV corpus with an explicit seed and jitter flag per row —
    * same-seed rows are exact byte copies (jitter=false) or slightly
    * perturbed re-encodes (jitter=true, samples clamped to 16-bit). */
  def synthCorpusSeeded(df: DataFrame, idCol: String, seedCol: String,
                        jitterCol: String): DataFrame = {
    val spark = df.sparkSession
    val meta = df.select(col(idCol).cast("long"), col(seedCol).cast("long"),
      col(jitterCol).cast("boolean")).rdd
    val rows = meta.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val seed = r.getLong(1)
      val jitter = r.getBoolean(2)
      val n = synthLen(seed)
      val samples = Array.tabulate(n) { i =>
        val base = synthSample(seed, i.toLong)
        val v = if (jitter) base + synthJitter(seed, i.toLong) else base
        math.max(-32768, math.min(32767, v)).toShort
      }
      Row(id, wavBytes(samples, synthRate(seed)))
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("audio", BinaryType, nullable = true))))
  }

  /** 64-bit energy-difference fingerprint of decoded PCM, split
    * (hi32, lo32): the clip is cut into [[FpBlocks]] equal time slices
    * (block of sample i = i·65 / n — every block nonempty for n ≥ 65),
    * block energy = Σ|s| (integer), and bit j = E(j) > E(j+1) for
    * j = 0..63 — the audio analogue of the image dHash: robust to
    * small-amplitude perturbation, discriminative across unrelated clips
    * (energies of disjoint slices are independent). All integer; the
    * same closed form replays in SQL over the synth sample formula. */
  def fingerprintOf(samples: Array[Short]): Option[(Long, Long)] = {
    val n = samples.length
    if (n < FpBlocks) return None
    val sums = new Array[Long](FpBlocks)
    var i = 0
    while (i < n) {
      sums(((i.toLong * FpBlocks) / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > sums(j + 1)) bits |= 1L << j
      j += 1
    }
    Some((bits >>> 32, bits & 0xFFFFFFFFL))
  }

  /** Distributed per-clip fingerprint over a binary WAV column — REAL
    * RIFF parse + PCM decode inside mapPartitions, like [[wavFeatures]].
    * Undecodable or too-short payloads yield null halves (corpus-audit
    * shape: count the bad, keep the row). */
  def energyFingerprint(media: DataFrame, idCol: String,
                        binCol: String): DataFrame = {
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      val fp = decodeWav(if (bytes == null) Array.emptyByteArray else bytes)
        .flatMap { case (_, _, samples) => fingerprintOf(samples) }
      fp match {
        case Some((hi, lo)) => Row(id, hi, lo)
        case None           => Row(id, null, null)
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("fp_hi", LongType, nullable = true),
      StructField("fp_lo", LongType, nullable = true))))
  }

  /** Near-duplicate clip pairs by fingerprint hamming ≤ `maxHamming` —
    * the shared 8-band pigeonhole join ([[Hash64]]), never all-pairs. */
  def fpNearDupPairs(fps: DataFrame, idCol: String,
                     maxHamming: Int): DataFrame =
    Hash64.bandedNearDupPairs(fps, idCol, "fp_hi", "fp_lo", maxHamming)

  // ——— Silence segmentation (the temporal step after per-clip features) —

  /** Frame length (samples) of the gated corpus's silence slots. */
  val GateFrame = 128

  /** Gated synthetic corpus: same pure-integer noise as [[synthCorpus]],
    * but frame f (of [[GateFrame]] samples) of clip `id` is zeroed when
    * f % 4 == id % 4 — real WAV containers with a silence layout the
    * oracle replays in closed form. */
  def synthGatedCorpus(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val ids = df.select(col(idCol).cast("long")).rdd.map(_.getLong(0))
    val rows = ids.mapPartitions(_.map { id =>
      val n = synthLen(id)
      val samples = Array.tabulate(n) { i =>
        if ((i / GateFrame) % 4L == id % 4L) 0.toShort
        else synthSample(id, i.toLong).toShort
      }
      Row(id, wavBytes(samples, synthRate(id)))
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("audio", BinaryType, nullable = true))))
  }

  /** Silence/speech segmentation over a binary WAV column: decode, split
    * into full frames of `frameLen` samples (the sub-frame tail is
    * dropped — a pinned, replayable boundary), classify each frame silent
    * iff max |sample| <= `thresh`, and run-length-encode the flags into
    * segments — one pass inside the decode kernel, one output row per
    * segment. The VAD-precursor shape of audio pipelines (silence
    * trimming, speech-span extraction) with a pure-integer decision at
    * every step.
    * @return (idCol, seg_idx, is_silence, start_frame, n_frames,
    *         start_us) — start_us = start_frame·frameLen·10⁶ /
    *         (rate·channels), integer division */
  def silenceSegments(media: DataFrame, idCol: String, binCol: String,
                      frameLen: Int, thresh: Int): DataFrame = {
    require(frameLen > 0 && thresh >= 0)
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.flatMap { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      decodeWav(if (bytes == null) Array.emptyByteArray else bytes) match {
        case Some((rate, channels, samples)) =>
          val nf = samples.length / frameLen
          val flags = Array.tabulate(nf) { f =>
            var m = 0
            var i = f * frameLen
            val end = i + frameLen
            while (i < end) {
              val a = math.abs(samples(i).toInt)
              if (a > m) m = a
              i += 1
            }
            m <= thresh
          }
          val out = Seq.newBuilder[Row]
          var segIdx = 0L
          var start = 0
          var f = 1
          def emit(endExcl: Int): Unit = {
            val startUs = start.toLong * frameLen * 1000000L /
              (rate.toLong * channels)
            out += Row(id, segIdx, if (flags(start)) 1L else 0L,
              start.toLong, (endExcl - start).toLong, startUs)
            segIdx += 1L
          }
          while (f < nf) {
            if (flags(f) != flags(f - 1)) { emit(f); start = f }
            f += 1
          }
          if (nf > 0) emit(nf)
          out.result()
        case None => Seq.empty[Row]
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seg_idx", LongType, nullable = false),
      StructField("is_silence", LongType, nullable = false),
      StructField("start_frame", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("start_us", LongType, nullable = false))))
  }
}
