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
}
