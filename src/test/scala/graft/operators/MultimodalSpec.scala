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
}
