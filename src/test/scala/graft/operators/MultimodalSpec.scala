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

  test("resizeMedia really rescales image payloads (decode-back check)") {
    val media = Seq((7L, pngBytes(80, 40))).toDF("media_id", "media")
    val out = Multimodal.resizeMedia(media, 32, 32).collect().head
    assert(out.getInt(1) == 80 && out.getInt(2) == 40)   // source dims
    assert(out.getInt(3) == 32 && out.getInt(4) == 16)   // fit 32x32, aspect kept
    // the resized payload is a real PNG with exactly those dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("resized")))
    assert(back.getWidth == 32 && back.getHeight == 16)
    // still half-black/half-white after bilinear scale: luma ends near 0.5
    val feats = Multimodal.decodeImage(out.getAs[Array[Byte]]("resized")).get
    assert(math.abs(feats._3 - 0.5) < 0.05)
  }
}
