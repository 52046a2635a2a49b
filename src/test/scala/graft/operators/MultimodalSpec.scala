package graft.operators

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload round-trips through the batched decode path") {
    val media = Multimodal.fromText(spark,
      Tables.documents(spark, sf()), "doc_id", "text")
    assert(media.schema.simpleString == Multimodal.mediaSchema.simpleString)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.schema.simpleString == Multimodal.featureSchema.simpleString)
    assert(feats.count() == 500)
    // metadata byte counts agree with the decoded payload lengths
    val joined = media.select($"media_id", $"meta.n_bytes".as("meta_bytes"))
      .join(feats.select($"media_id", $"n_bytes"), "media_id")
    assert(joined.filter($"meta_bytes" =!= $"n_bytes").count() == 0)
    // deterministic: decoding twice yields identical features
    val again = Multimodal.decodeFeatures(media)
    assert(feats.exceptAll(again).count() == 0)
    // brightness is a normalized [0,1] signal
    assert(feats.filter($"brightness" < 0.0 || $"brightness" > 1.0).count() == 0)
  }

  test("sampleFrames fans out k frames per row with monotone offsets") {
    val media = Multimodal.fromText(spark,
      Tables.documents(spark, sf()).limit(10), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.schema.simpleString == Multimodal.frameSchema.simpleString)
    assert(frames.count() == 40)
    assert(frames.groupBy("media_id").count().filter($"count" =!= 4).count() == 0)
    // offsets are nondecreasing in frame_idx and inside the payload
    val bad = frames.join(media.select($"media_id", $"meta.n_bytes"), "media_id")
      .filter($"offset" < 0 || $"offset" >= $"n_bytes" ||
        $"offset" =!= org.apache.spark.sql.functions
          .expr("(cast(frame_idx as bigint) * n_bytes) div 4"))
    assert(bad.count() == 0)
    // deterministic
    assert(Multimodal.sampleFrames(media, 4).exceptAll(frames).count() == 0)
  }

  test("resizeMedia fits the target box preserving aspect ratio") {
    val media = Multimodal.fromText(spark,
      Tables.documents(spark, sf()).limit(20), "doc_id", "text")
    val out = Multimodal.resizeMedia(media, 32, 32)
    assert(out.schema.simpleString == Multimodal.resizedSchema.simpleString)
    assert(out.count() == 20)
    // every output fits the box, no upscaling past it, aspect preserved
    val bad = out.filter($"width" > 32 || $"height" > 32 ||
      ($"width" =!= 32 && $"height" =!= 32))
    assert(bad.count() == 0, "the binding dimension must hit the target")
    // stub re-encode shrinks the payload with the area
    val sizes = out.join(media.select($"media_id", $"meta.n_bytes"), "media_id")
      .filter(org.apache.spark.sql.functions.length($"resized") > $"n_bytes")
    assert(sizes.count() == 0)
    // deterministic
    assert(Multimodal.resizeMedia(media, 32, 32).exceptAll(out).count() == 0)
  }

  /** Deterministic RGB test image: left half black, right half white. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeFeatures uses the real javax.imageio codec for image payloads") {
    val rows = Seq((1L, pngBytes(80, 40)), (2L, pngBytes(10, 10)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "media")
      .select($"media_id", $"media",
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit("image/png").as("format"),
          org.apache.spark.sql.functions.length($"media").cast("int").as("n_bytes")).as("meta"))
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // real dimensions, not stub fabrications
    assert(feats(1L).getInt(3) == 80 && feats(1L).getInt(4) == 40)
    assert(feats(2L).getInt(3) == 10 && feats(2L).getInt(4) == 10)
    // half black / half white → mean luma 0.5 exactly (even width)
    assert(math.abs(feats(1L).getDouble(5) - 0.5) < 1e-9)
    // non-image payload falls back to the deterministic stub
    val stub = Multimodal.decodeStub("not an image at all".getBytes("UTF-8"))
    assert(feats(3L).getInt(3) == stub._1 && feats(3L).getInt(4) == stub._2)
  }

  /** Solid-color RGB frame. */
  private def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** Real animated GIF via the JDK's own GIF sequence writer. */
  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** MJPEG-style stream: concatenated baseline JPEGs. */
  private def mjpeg(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    frames.foreach(f => javax.imageio.ImageIO.write(f, "jpeg", baos))
    baos.toByteArray
  }

  test("sampleFrames REALLY demuxes and decodes an animated GIF") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val gif = animatedGif(colors.map(frame(8, 6, _)))
    // the container demux finds all 5 image descriptors, each at a 0x2C byte
    val offs = Multimodal.gifFrameOffsets(gif)
    assert(offs.size == 5, s"expected 5 frames, demuxed ${offs.size}")
    offs.foreach(o => assert((gif(o.toInt) & 0xff) == 0x2c, s"offset $o is not 0x2C"))

    val media = Seq((1L, gif)).toDF("media_id", "media")
    // read by NAME, not ordinal — the schema grew a sample_idx column once
    // already and positional accessors broke silently
    val out = Multimodal.sampleFrames(media, 3)
      .orderBy("sample_idx").collect()
    assert(out.map(_.getAs[Int]("sample_idx")).toSeq == Seq(0, 1, 2))
    // k=3 over n=5 frames: container indices floor(j*5/3) = 0, 1, 3
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 3),
      out.mkString("; "))
    // true byte offsets from the demux, strictly increasing
    assert(out.map(_.getAs[Long]("offset")).toSeq == Seq(offs(0), offs(1), offs(3)))
    // digests are of DECODED pixels: distinct colors → distinct digests,
    // and none equal the stub's md5(payload-sha:idx) formula
    val shas = out.map(_.getAs[String]("frame_sha")).toSeq
    assert(shas.distinct.size == 3, shas.mkString(", "))
    assert(shas.forall(_.length == 64), "pixel digest is sha-256 hex")
    // deterministic across runs
    val again = Multimodal.sampleFrames(media, 3).orderBy("sample_idx").collect()
    assert(again.map(_.getAs[String]("frame_sha")).toSeq == shas)
  }

  test("(media_id, sample_idx) stays a unique key when n < k repeats frame_idx") {
    val gif = animatedGif(Seq(frame(8, 6, 0xff0000), frame(8, 6, 0x0000ff)))
    val media = Seq((3L, gif)).toDF("media_id", "media")
    val out = Multimodal.sampleFrames(media, 4).orderBy("sample_idx").collect()
    // k=4 over n=2 frames: container index floor(j*2/4) repeats — 0,0,1,1
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 0, 1, 1))
    // …but sample_idx never does: that uniqueness is the column's reason to exist
    assert(out.map(_.getAs[Int]("sample_idx")).toSeq == Seq(0, 1, 2, 3))
    val keys = out.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("sample_idx")))
    assert(keys.distinct.length == keys.length)
  }

  test("forceStub pins GIF-sniffing payloads to the replayable stub formula") {
    // a TEXT payload that happens to start with the GIF magic — without the
    // guard this would demux (or try to) and fork off the oracle's formula
    val bytes = "GIF87a — actually just a document that starts this way"
      .getBytes("UTF-8")
    assert(Multimodal.sniffImageFormat(bytes).contains("gif"))
    val media = Seq((11L, bytes)).toDF("media_id", "media")
    val out = Multimodal.sampleFrames(media, 3, forceStub = true)
      .orderBy("sample_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getAs[Long]("offset")).toSeq ==
      (0 until 3).map(i => (i.toLong * bytes.length) / 3))
    val psha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    val want = (0 until 3).map(i => java.security.MessageDigest.getInstance("MD5")
      .digest(s"$psha:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out.map(_.getAs[String]("frame_sha")).toSeq == want)
  }

  test("sampleFrames REALLY demuxes a concatenated-JPEG (MJPEG) stream") {
    val frames = Seq(frame(16, 12, 0x112233), frame(16, 12, 0xddeeff),
      frame(16, 12, 0x808080), frame(16, 12, 0x203040))
    val stream = mjpeg(frames)
    val offs = Multimodal.mjpegFrameOffsets(stream)
    assert(offs.size == 4, s"expected 4 SOI markers, found ${offs.size}")
    assert(offs.head == 0L)

    val media = Seq((9L, stream)).toDF("media_id", "media")
    val out = Multimodal.sampleFrames(media, 2).orderBy("sample_idx").collect()
    // k=2 over n=4: container indices 0 and 2
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(out.map(_.getAs[Long]("offset")).toSeq == Seq(offs(0), offs(2)))
    // each sampled slice decodes: distinct frame colors → distinct digests
    val shas = out.map(_.getAs[String]("frame_sha")).toSeq
    assert(shas.distinct.size == 2 && shas.forall(_.length == 64))
    // cross-check digest against an independent slice decode
    val slice = java.util.Arrays.copyOfRange(stream, offs(2).toInt, stream.length)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(slice))
    assert(img != null && img.getWidth == 16 && img.getHeight == 12)
  }

  test("non-container payloads keep the replayable stub digest path (m2 oracle)") {
    val bytes = "definitely not media".getBytes("UTF-8")
    val media = Seq((5L, bytes)).toDF("media_id", "media")
    val out = Multimodal.sampleFrames(media, 4).orderBy("sample_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getAs[Long]("offset")).toSeq ==
      (0 until 4).map(i => (i.toLong * bytes.length) / 4))
    // digest = md5(sha256-hex(payload) ':' idx) — the exact formula the
    // DuckDB oracle for m2_frame_sample replays
    val psha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    val want0 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$psha:0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getAs[String]("frame_sha") == want0)
  }

  /** ISO-BMFF box: [size:u32][type:4cc][payload]. */
  private def mp4box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val buf = java.nio.ByteBuffer.allocate(8 + body.length)
    buf.putInt(8 + body.length)
    buf.put(typ.getBytes("ISO-8859-1"))
    buf.put(body)
    buf.array()
  }
  private def u32(vs: Long*): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => buf.putInt(v.toInt))
    buf.array()
  }

  /** Minimal playable-shaped MP4: ftyp, mdat with 3 samples in 2 chunks
    * (sizes 5/7 then 11, with a 2-byte gap between chunks so chunk-2's
    * offset is NOT chunk-1's end — that distinction is what stco carries),
    * then moov/trak/mdia/minf/stbl with stsd(avc1)+stts+stsc+stsz+stco. */
  private def minimalMp4(): (Array[Byte], Seq[Long]) = {
    val ftyp = mp4box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0),
      "isom".getBytes("ISO-8859-1"))
    val samples = Array.tabulate(5 + 7)(i => (0x40 + i).toByte) ++
      Array[Byte](0x7e, 0x7e) ++ Array.tabulate(11)(i => (0x60 + i).toByte)
    val mdat = mp4box("mdat", samples)
    val c1 = ftyp.length + 8L            // first sample of chunk 1
    val c2 = c1 + 5 + 7 + 2              // chunk 2 skips the 2-byte gap
    val stsd = mp4box("stsd", u32(0, 1),
      mp4box("avc1", new Array[Byte](8))) // entry: size+fourcc+opaque body
    val stts = mp4box("stts", u32(0, 1, 3, 1000))
    val stsc = mp4box("stsc", u32(0, 2, /*run1*/ 1, 2, 1, /*run2*/ 2, 1, 1))
    val stsz = mp4box("stsz", u32(0, 0, 3, 5, 7, 11))
    val stco = mp4box("stco", u32(0, 2, c1, c2))
    val moov = mp4box("moov", mp4box("trak", mp4box("mdia", mp4box("minf",
      mp4box("stbl", stsd, stts, stsc, stsz, stco)))))
    (ftyp ++ mdat ++ moov, Seq(c1, c1 + 5, c2))
  }

  test("Mp4 box walk yields the true sample offsets, sizes and codec fourcc") {
    val (mp4, wantOffs) = minimalMp4()
    assert(Mp4.isMp4(mp4))
    val track = Mp4.sampleTable(mp4).get
    assert(track.codec == "avc1")
    assert(track.sizes == Seq(5L, 7L, 11L))
    assert(track.offsets == wantOffs)
    // the offsets really point at the planted sample bytes
    assert(mp4(wantOffs(0).toInt) == 0x40.toByte)
    assert(mp4(wantOffs(1).toInt) == 0x45.toByte) // after the 5-byte sample
    assert(mp4(wantOffs(2).toInt) == 0x60.toByte) // chunk 2, past the gap
    // truncated containers never throw, they demux to None
    assert(Mp4.sampleTable(mp4.take(mp4.length - 40)).isEmpty)
    assert(Mp4.sampleTable(mp4.take(10)).isEmpty)
    assert(Mp4.sampleTable("ftypnot really".getBytes("UTF-8")).isEmpty)
  }

  test("fixed-size stsz demuxes without a table; huge declarations rejected") {
    val ftyp = mp4box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0),
      "isom".getBytes("ISO-8859-1"))
    val mdat = mp4box("mdat", Array.tabulate(15)(i => (0x40 + i).toByte))
    val c1 = ftyp.length + 8L
    val stsd = mp4box("stsd", u32(0, 1), mp4box("avc1", new Array[Byte](8)))
    val stsc = mp4box("stsc", u32(0, 1, 1, 3, 1))
    val stco = mp4box("stco", u32(0, 1, c1))
    def moovWith(stsz: Array[Byte]) = mp4box("moov", mp4box("trak",
      mp4box("mdia", mp4box("minf", mp4box("stbl", stsd, stsc, stsz, stco)))))
    // sample_size=5, count=3, NO per-sample table — sizes come from the
    // constant-space sequence, offsets walk normally
    val fixedOk = ftyp ++ mdat ++ moovWith(mp4box("stsz", u32(0, 5, 3)))
    val t = Mp4.sampleTable(fixedOk).get
    assert(t.sizes.toSeq == Seq(5L, 5L, 5L))
    assert(t.offsets == Seq(c1, c1 + 5, c1 + 10))
    // adversarial: a 5 MB payload declaring 5M one-byte fixed samples
    // passes the n <= file-length cap but must hit the MaxSamples ceiling
    // (demux to None → stub path) instead of allocating 5M-element tables
    val big = ftyp ++ mp4box("mdat", new Array[Byte](5 * 1024 * 1024)) ++
      moovWith(mp4box("stsz", u32(0, 1, 5000000)))
    assert(Mp4.sampleTable(big).isEmpty)
  }

  test("sampleFrames demuxes MP4 sample offsets; digests stay on the stub path") {
    val (mp4, offs) = minimalMp4()
    val media = Seq((21L, mp4)).toDF("media_id", "media")
    val out = Multimodal.sampleFrames(media, 2).orderBy("sample_idx").collect()
    // k=2 over n=3 samples: container indices floor(j*3/2) = 0, 1
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1))
    // REAL byte offsets from the stsz/stsc/stco walk, not i*len/k synthetics
    assert(out.map(_.getAs[Long]("offset")).toSeq == Seq(offs(0), offs(1)))
    // no JDK video codec: digest is the replayable stub formula on the
    // CONTAINER frame index
    val psha = java.security.MessageDigest.getInstance("SHA-256").digest(mp4)
      .map("%02x".format(_)).mkString
    val want = Seq(0, 1).map(i => java.security.MessageDigest.getInstance("MD5")
      .digest(s"$psha:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out.map(_.getAs[String]("frame_sha")).toSeq == want)
    // forceStub ignores the container entirely (oracle-parity guard)
    val stub = Multimodal.sampleFrames(media, 2, forceStub = true)
      .orderBy("sample_idx").collect()
    assert(stub.map(_.getAs[Long]("offset")).toSeq ==
      Seq(0L, mp4.length / 2L))
  }

  test("resizeMedia really rescales image payloads (decode-back check)") {
    val media = Seq((7L, pngBytes(80, 40))).toDF("media_id", "media")
    val out = Multimodal.resizeMedia(media, 32, 32).collect().head
    assert(out.getAs[Int]("src_width") == 80 && out.getAs[Int]("src_height") == 40)
    assert(out.getAs[Int]("width") == 32 && out.getAs[Int]("height") == 16) // fit 32x32, aspect kept
    // the resized payload is a real PNG with exactly those dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("resized")))
    assert(back.getWidth == 32 && back.getHeight == 16)
    // still half-black/half-white after bilinear scale: luma ends near 0.5
    val feats = Multimodal.decodeImage(out.getAs[Array[Byte]]("resized")).get
    assert(math.abs(feats._3 - 0.5) < 0.05)
  }
}
