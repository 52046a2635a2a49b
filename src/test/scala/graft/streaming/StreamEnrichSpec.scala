package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrichment lands idempotent per-batch partitions") {
    val root = Files.createTempDirectory("graft-se").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val proto = Seq((1L, "k")).toDF("id", "key")
    val dim = Seq(("k", "KAPPA"), ("m", "MU")).toDF("key", "label")

    Seq((1L, "k"), (2L, "m"), (3L, "zz")).toDF("id", "key").write.parquet(s"$in/f1")
    StreamEnrich.run(spark, s"$in/*", proto, dim, "key", out, ckpt)
    val b1 = spark.read.parquet(out)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(b1 == Map(1L -> Some("KAPPA"), 2L -> Some("MU"), 3L -> None))

    // no new input: the drain must add nothing (checkpoint remembers files)
    StreamEnrich.run(spark, s"$in/*", proto, dim, "key", out, ckpt)
    assert(spark.read.parquet(out).count() == 3)

    // a second batch of files joins against an UPDATED dim (latest wins)
    // and lands in its own partition without touching batch 0's rows
    val dim2 = Seq(("k", "KAPPA2"), ("m", "MU")).toDF("key", "label")
    Seq((4L, "k")).toDF("id", "key").write.parquet(s"$in/f2")
    StreamEnrich.run(spark, s"$in/*", proto, dim2, "key", out, ckpt)
    val all = spark.read.parquet(out)
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(all(4L) == Some("KAPPA2") && all(1L) == Some("KAPPA"))
    assert(all.size == 4)
  }
}
