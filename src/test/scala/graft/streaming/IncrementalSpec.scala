package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("available-now file stream processes each file exactly once across runs") {
    val root = Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val proto = Seq((1L, "x")).toDF("id", "payload")

    // batch 1: two files land
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload").write.parquet(s"$in/f1")
    Seq((3L, "c")).toDF("id", "payload").write.parquet(s"$in/f2")
    Incremental.processNewFiles(spark, s"$in/*", proto,
      df => df.withColumn("payload", upper(col("payload"))), out, ckpt)
    assert(spark.read.parquet(out).count() == 3)

    // batch 2: one new file; previous files must NOT be reprocessed
    Seq((4L, "d")).toDF("id", "payload").write.parquet(s"$in/f3")
    Incremental.processNewFiles(spark, s"$in/*", proto,
      df => df.withColumn("payload", upper(col("payload"))), out, ckpt)
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(rows.size == 4, s"expected exactly-once, got ${rows.size} rows")
    assert(rows.toSet == Set((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D")))

    // re-run with nothing new: no duplicates
    Incremental.processNewFiles(spark, s"$in/*", proto,
      df => df.withColumn("payload", upper(col("payload"))), out, ckpt)
    assert(spark.read.parquet(out).count() == 4)
  }
}
