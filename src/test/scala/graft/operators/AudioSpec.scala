package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** The WAV path must be a REAL decoder: container quirks (extra chunks,
  * odd-size padding, stereo interleave) decode correctly, malformed bytes
  * are rejected not mis-read, and the synth corpus round-trips through the
  * byte level back to its closed-form samples. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("synth WAV round-trips: bytes -> decode == the closed-form samples") {
    val id = 12345L
    val n = Audio.synthLen(id)
    val expect = Array.tabulate(n)(i => Audio.synthSample(id, i.toLong))
    val bytes = Audio.wavBytes(expect.map(_.toShort), Audio.synthRate(id))
    val Some((rate, channels, samples)) = Audio.decodeWav(bytes)
    assert(rate === Audio.synthRate(id) && channels === 1)
    assert(samples.map(_.toInt).toSeq === expect.toSeq)
  }

  test("chunk walk skips unknown chunks and honors odd-size padding") {
    // RIFF with a 3-byte (odd) junk chunk BEFORE fmt/data: a walker that
    // forgets the pad byte lands mid-chunk and must not parse this
    val samples = Array[Short](100, -200, 300)
    val base = Audio.wavBytes(samples, 8000)
    val junk = ByteBuffer.allocate(8 + 4).order(ByteOrder.LITTLE_ENDIAN)
      .put("JUNK".getBytes("ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3 bytes + 1 pad
      .array()
    val spliced = ByteBuffer.allocate(base.length + junk.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 12).put(junk).put(base, 12, base.length - 12).array()
    // fix the RIFF size field
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val Some((rate, channels, out)) = Audio.decodeWav(spliced)
    assert(rate === 8000 && channels === 1)
    assert(out.toSeq === samples.toSeq)
  }

  test("stereo interleave decodes all samples; duration uses frame count") {
    val samples = Array[Short](1, -1, 2, -2, 3, -3) // 3 frames of L/R
    val bytes = Audio.wavBytes(samples, 48000, channels = 2)
    val Some((rate, channels, out)) = Audio.decodeWav(bytes)
    assert(rate === 48000 && channels === 2 && out.length === 6)
    val media = Seq((7L, bytes)).toDF("media_id", "audio")
    val row = Audio.wavFeatures(media, "media_id", "audio").collect().head
    assert(row.getAs[Long]("n_samples") === 6L)
    // 3 frames at 48 kHz = 62 us (floor)
    assert(row.getAs[Long]("duration_us") === 6L * 1000000L / (48000L * 2L))
  }

  test("energy fingerprint over the real container equals the closed form") {
    // independent re-derivation: group sample indices by the block formula
    // and fold, instead of the operator's streaming array pass
    for (seed <- Seq(3L, 481L, 9977L); jit <- Seq(false, true)) {
      val n = Audio.synthLen(seed)
      val raw = (0 until n).map { i =>
        val v = Audio.synthSample(seed, i.toLong) +
          (if (jit) Audio.synthJitter(seed, i.toLong) else 0)
        math.max(-32768, math.min(32767, v))
      }
      val energies = raw.indices.groupBy(i => i.toLong * 65 / n)
        .map { case (b, is) => b -> is.map(i => math.abs(raw(i).toLong)).sum }
      val bits = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (energies(j.toLong) > energies(j + 1L)) acc | (1L << j) else acc
      }
      val media = Seq((seed, Audio.wavBytes(raw.map(_.toShort).toArray,
        Audio.synthRate(seed)))).toDF("media_id", "audio")
      val row = Audio.energyFingerprint(media, "media_id", "audio")
        .collect().head
      assert(row.getAs[Long]("fp_hi") === (bits >>> 32), s"seed=$seed jit=$jit")
      assert(row.getAs[Long]("fp_lo") === (bits & 0xFFFFFFFFL))
    }
  }

  test("exact copies collide, jittered copies stay near, unrelated far; " +
       "banded pairs == brute force") {
    val meta = ((0L until 40L).map(s => (s, s, false)) ++      // base clips
      Seq((1000L, 5L, false), (1001L, 17L, false)) ++          // exact copies
      Seq((2000L, 5L, true), (2001L, 29L, true)))              // jittered
      .toDF("media_id", "seed", "jit")
    val fps = Audio.energyFingerprint(
      Audio.synthCorpusSeeded(meta, "media_id", "seed", "jit"),
      "media_id", "audio")
    val rows = fps.collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("fp_hi") << 32) | r.getAs[Long]("fp_lo"))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(rows(a) ^ rows(b))
    assert(ham(1000L, 5L) === 0 && ham(1001L, 17L) === 0)
    assert(ham(2000L, 5L) <= 6 && ham(2001L, 29L) <= 6)
    // banded join finds exactly the brute-force pair set
    val ids = rows.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if ham(ids(i), ids(j)) <= 6
    } yield (ids(i), ids(j), ham(ids(i), ids(j)).toLong)).toSet
    val banded = Audio.fpNearDupPairs(fps, "media_id", maxHamming = 6)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming"))).toSet
    assert(banded === brute)
    assert(brute.exists(_._3 === 0L)) // the planted exact pairs are in it
  }

  test("malformed payloads reject instead of mis-reading") {
    assert(Audio.decodeWav(Array.emptyByteArray).isEmpty)
    assert(Audio.decodeWav("RIFFxxxxWAVE".getBytes("ASCII")).isEmpty) // no chunks
    val good = Audio.wavBytes(Array[Short](1, 2, 3), 8000)
    assert(Audio.decodeWav(good.take(30)).isEmpty) // truncated mid-fmt
    val badBits = good.clone()
    badBits(34) = 8 // bits-per-sample 8: not the PCM16 this decoder claims
    assert(Audio.decodeWav(badBits).isEmpty)
    // features: undecodable row keeps its id with null features
    val media = Seq((1L, good.take(30)), (2L, good)).toDF("media_id", "audio")
    val rows = Audio.wavFeatures(media, "media_id", "audio")
      .orderBy("media_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("n_samples")))
    assert(rows(1).getAs[Long]("n_samples") === 3L)
  }

  test("silence segmentation == scalar run-length over the gated formula") {
    val ids = Seq(10L, 20L, 30L, 47L, 123L)
    val media = Audio.synthGatedCorpus(ids.toDF("doc_id"), "doc_id")
    val got = Audio.silenceSegments(media, "media_id", "audio",
        frameLen = Audio.GateFrame, thresh = 2)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("seg_idx"),
        r.getAs[Long]("is_silence"), r.getAs[Long]("start_frame"),
        r.getAs[Long]("n_frames"), r.getAs[Long]("start_us"))).toSet
    val want = ids.flatMap { id =>
      val n = Audio.synthLen(id)
      val nf = n / Audio.GateFrame
      val flags = (0 until nf).map { f =>
        val mx = (f * Audio.GateFrame until (f + 1) * Audio.GateFrame).map { i =>
          if ((i / Audio.GateFrame) % 4L == id % 4L) 0
          else math.abs(Audio.synthSample(id, i.toLong))
        }.max
        mx <= 2
      }
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
      var start = 0
      for (f <- 1 until nf) if (flags(f) != flags(f - 1)) {
        segs += ((start, f - start, flags(start))); start = f
      }
      if (nf > 0) segs += ((start, nf - start, flags(start)))
      segs.zipWithIndex.map { case ((st, len, sil), ix) =>
        (id, ix.toLong, if (sil) 1L else 0L, st.toLong, len.toLong,
          st.toLong * Audio.GateFrame * 1000000L / Audio.synthRate(id))
      }
    }.toSet
    assert(got === want)
    // the gate actually produces both classes
    assert(want.exists(_._3 == 1L) && want.exists(_._3 == 0L))
  }
}
