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
  * The IMAGE path is real: `javax.imageio` (JDK built-in — PNG/JPEG/GIF/
  * BMP) decodes dimensions + brightness and `Graphics2D` does the resize,
  * dispatched by magic-byte sniff. Audio/video demux has no JDK codec, so
  * non-image payloads take [[decodeStub]] — deterministic pseudo-features
  * from the bytes — keeping the operators total and replayable. The
  * Spark-side plumbing — schema, batch iteration, partitioning, output
  * encoder — is shared by both paths.
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

  /** Magic-byte sniff for the formats the JDK's ImageIO decodes out of the
    * box. Cheaper and more deterministic than letting ImageIO scan its
    * reader registry per row, and it keeps non-image payloads (text
    * fixtures, audio/video containers) off the codec entirely. */
  def sniffImageFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = bytes.length > i && (bytes(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("jpeg")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) Some("gif")
    else if (at(0, 'B') && at(1, 'M')) Some("bmp")
    else None
  }

  /** Decompression-bomb guard: a few-hundred-KB PNG can declare 25000²
    * pixels (~2.5 GB decoded). Dimensions are read from the HEADER only
    * (cheap) and payloads over this pixel budget fall back to the stub
    * instead of OOMing the executor. 64M pixels ≈ 256 MB ARGB. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Header-checked decode: None when no reader claims the payload or the
    * declared dimensions exceed the pixel budget. */
  private def readBounded(bytes: Array[Byte],
                          maxPixels: Long): Option[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          if (reader.getWidth(0).toLong * reader.getHeight(0) > maxPixels) None
          else Option(reader.read(0))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** REAL image decode — JDK `javax.imageio` (PNG/JPEG/GIF/BMP), zero
    * extra dependencies. Returns (width, height, mean Rec.601 luma in
    * [0,1]), or None when the payload is not a decodable image — callers
    * fall back to [[decodeStub]] so every row still yields a feature row. */
  def decodeImage(bytes: Array[Byte],
                  maxPixels: Long = MaxDecodePixels): Option[(Int, Int, Double)] =
    if (sniffImageFormat(bytes).isEmpty) None
    else try {
      readBounded(bytes, maxPixels).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        var sum = 0.0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w) // bulk row read, not per-pixel
          var x = 0
          while (x < w) {
            val rgb = row(x)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (w, h, sum / (w.toLong * h) / 255.0)
      }
      // NonFatal, not just IOException: ImageIO readers throw unchecked
      // exceptions on corrupt payloads (CMMException on bad ICC profiles,
      // AIOOBE on truncated GIFs) — one bad image must not kill the job
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder for non-image payloads (no audio/video demuxers in the
    * JDK): derives deterministic fake dimensions/brightness from the
    * payload bytes so the plumbing stays total and replayable. */
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
    * through it lazily — never materialized per-partition. Image payloads
    * (sniffed by magic bytes) go through the REAL `javax.imageio` decode;
    * everything else falls back to the deterministic stub. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media", "meta.format", "meta.n_bytes")
      .mapPartitions { rows =>
        // per-partition codec init: disable ImageIO's temp-file cache so
        // decodes stay in-memory on executors
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h, br) = decodeImage(bytes).getOrElse(decodeStub(bytes))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            r.getAs[Int]("n_bytes"), w, h, br)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_idx", IntegerType),
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

  /** Byte offset of every frame (image descriptor, 0x2C) in a GIF
    * container — a minimal pure-JDK demux of the GIF87a/89a block
    * structure: header + logical screen descriptor (+ global color table),
    * then a walk over extension blocks (0x21, length-prefixed sub-blocks)
    * and image descriptors (+ local color table + LZW data sub-blocks)
    * until the 0x3B trailer. Truncated/corrupt containers return the
    * frames found so far — the demux never throws. */
  def gifFrameOffsets(bytes: Array[Byte]): Seq[Long] = {
    def u(i: Int) = bytes(i) & 0xff
    if (bytes.length < 14 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F')
      return Nil
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      var p = 13
      if ((u(10) & 0x80) != 0) p += 3 * (1 << ((u(10) & 7) + 1))
      def skipSubBlocks(): Unit = {
        var len = u(p); p += 1
        while (len != 0) { p += len; len = u(p); p += 1 }
      }
      var done = false
      while (!done && p < bytes.length) {
        u(p) match {
          case 0x21 => p += 2; skipSubBlocks() // extension introducer + label
          case 0x2c =>
            out += p.toLong
            val packed = u(p + 9)
            p += 10
            if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1))
            p += 1 // LZW minimum code size
            skipSubBlocks()
          case 0x3b => done = true
          case _ => done = true // out-of-spec block: stop cleanly
        }
      }
    } catch { case _: IndexOutOfBoundsException => }
    out.toSeq
  }

  /** Byte offset of every JPEG SOI marker (FF D8 FF) in a concatenated-JPEG
    * (MJPEG-style) stream. A marker inside an EXIF-embedded thumbnail would
    * also match — acceptable for frame sampling (the slice still decodes);
    * real video containers are out of pure-JDK reach and take the stub. */
  def mjpegFrameOffsets(bytes: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8 &&
        (bytes(i + 2) & 0xff) == 0xff) { out += i.toLong; i += 2 }
      i += 1
    }
    out.toSeq
  }

  /** SHA-256 over the decoded ARGB pixel rows (big-endian ints) — the
    * frame digest is of decoded CONTENT, not container bytes, so two
    * encodings of the same frame hash alike. */
  private def pixelSha(img: java.awt.image.BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    val buf = java.nio.ByteBuffer.allocate(w * 4)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      buf.clear()
      var x = 0
      while (x < w) { buf.putInt(row(x)); x += 1 }
      md.update(buf.array(), 0, w * 4)
      y += 1
    }
    hexLower(md.digest())
  }

  /** Decode ONE frame of a multi-frame container: GIF frames by ImageIO
    * reader index (each frame's own raster, not the composited animation);
    * MJPEG frames by slicing SOI..next-SOI and decoding the slice. */
  private def decodeFrameSha(bytes: Array[Byte], isGif: Boolean,
                             offsets: Seq[Long], idx: Int): Option[String] =
    try {
      if (isGif) {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              if (reader.getWidth(idx).toLong * reader.getHeight(idx) > MaxDecodePixels) None
              else Option(reader.read(idx)).map(pixelSha)
            } finally reader.dispose()
          }
        } finally iis.close()
      } else {
        val from = offsets(idx).toInt
        val until = if (idx + 1 < offsets.size) offsets(idx + 1).toInt else bytes.length
        readBounded(java.util.Arrays.copyOfRange(bytes, from, until), MaxDecodePixels)
          .map(pixelSha)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling for video-like payloads: each media row yields k
    * evenly-spaced frames (frame_idx, byte offset, frame digest). Same
    * mapPartitions batch shape as [[decodeFeatures]] — one codec init per
    * partition, rows stream lazily, output fan-out k per row.
    *
    * REAL demux + decode for the two containers pure JDK can handle:
    *  - animated GIF — container walked for true frame byte offsets
    *    ([[gifFrameOffsets]]), sampled frames decoded via ImageIO reader
    *    index, digest = SHA-256 of the decoded pixels;
    *  - MJPEG / concatenated JPEG — SOI-marker scan ([[mjpegFrameOffsets]]),
    *    sampled slices decoded, same pixel digest.
    * MP4-family containers get a REAL demux but a stub decode: the
    * [[Mp4]] box walk (moov→trak→mdia→minf→stbl) yields each sample's
    * true byte offset from stsz/stsc/stco, so frame_idx and offset are
    * genuine container coordinates; the frame digest takes the stub
    * formula because the JDK ships no video codec to decode the sample.
    * With n real frames, sample j (0-based) maps to container frame
    * floor(j·n/k) — frame_idx is the CONTAINER index (repeats when n < k)
    * and offset its true byte position; sample_idx is j, so
    * (media_id, sample_idx) is ALWAYS a unique key. True video codecs (and
    * non-media payloads) take the STUB digest path — md5(payload-sha:idx)
    * with synthetic offsets — so the operator stays total and externally
    * replayable.
    *
    * `forceStub = true` pins EVERY row to the stub path. Oracle-replayed
    * queries over text payloads (m2) need this guard: without it, a text
    * that happens to start with a media magic ("GIF8…") and demuxes would
    * fork Spark onto the pixel-digest path while the SQL oracle replays
    * the stub formula. */
  def sampleFrames(media: DataFrame, k: Int, forceStub: Boolean = false): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      val md5 = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val fmt = if (forceStub) None else sniffImageFormat(bytes)
        val isGif = fmt.contains("gif")
        // canDecode: only the image-family containers have a JDK codec;
        // MP4 samples get real offsets but skip the doomed decode attempt
        val (offsets, canDecode) =
          if (isGif) (gifFrameOffsets(bytes), true)
          else if (fmt.contains("jpeg")) (mjpegFrameOffsets(bytes), true)
          else if (!forceStub && Mp4.isMp4(bytes))
            (Mp4.sampleTable(bytes).map(_.offsets).getOrElse(Nil), false)
          else (Nil, false)
        if (offsets.nonEmpty) {
          val n = offsets.size
          // one full-payload hash per ROW, not per sample — MP4 payloads
          // are the largest media and always take the stub digest
          lazy val payloadSha = hexLower(sha.digest(bytes))
          (0 until k).iterator.map { j =>
            val idx = (j * n) / k
            val digest = (if (canDecode) decodeFrameSha(bytes, isGif, offsets, idx)
                          else None).getOrElse {
              hexLower(md5.digest(
                s"$payloadSha:$idx".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            }
            Row(id, j, idx, offsets(idx), digest)
          }
        } else {
          val payloadSha = hexLower(sha.digest(bytes))
          (0 until k).iterator.map { i =>
            val frameSha = hexLower(md5.digest(
              s"$payloadSha:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            Row(id, i, i, (i.toLong * bytes.length) / k, frameSha)
          }
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

  /** REAL image resize: decode via `javax.imageio`, bilinear-scale to fit
    * (targetW, targetH) preserving aspect ratio with `Graphics2D`, and
    * re-encode as PNG (lossless + deterministic within a JDK). Returns
    * None for non-image payloads. */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int,
                  maxPixels: Long = MaxDecodePixels)
      : Option[(Int, Int, Int, Int, Array[Byte])] =
    if (sniffImageFormat(bytes).isEmpty) None
    else try {
      readBounded(bytes, maxPixels).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
        val nw = math.max(1, math.rint(w * scale).toInt)
        val nh = math.max(1, math.rint(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
        g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        (w, h, nw, nh, baos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resize over the media frame: REAL decode → `Graphics2D` scale-to-fit
    * → PNG re-encode for image payloads; non-image payloads take a
    * deterministic stub path (fake dims from [[decodeStub]], byte count
    * scaled by the area ratio) so the operator stays total. Same
    * partition-batched shape as the other codec paths — one resizer init
    * per partition, rows streamed. */
  def resizeMedia(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      rows.map { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val (w, h, nw, nh, out) =
          resizeImage(bytes, targetW, targetH).getOrElse {
            val (sw, sh, _) = decodeStub(bytes)
            val scale = math.min(targetW.toDouble / sw, targetH.toDouble / sh)
            val snw = math.max(1, math.rint(sw * scale).toInt)
            val snh = math.max(1, math.rint(sh * scale).toInt)
            // stub re-encode: byte count scales with the area ratio
            val outLen = math.max(1,
              (bytes.length.toLong * snw * snh / (sw.toLong * sh)).toInt)
            (sw, sh, snw, snh, java.util.Arrays.copyOf(bytes, outLen))
          }
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
