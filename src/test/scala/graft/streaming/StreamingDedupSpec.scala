package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedups within the watermark window, evicts state past it") {
    val root = Files.createTempDirectory("graft-sd").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val proto = Seq((ts("2024-01-01 00:00:00"), "d")).toDF("ts", "text")

    // run 1: duplicate text within one batch → exactly ONE landing (which
    // of the two survives is batch read-order, deliberately unasserted)
    Seq((ts("2024-01-01 10:00:00"), "hello"),
      (ts("2024-01-01 10:05:00"), "hello"),
      (ts("2024-01-01 10:10:00"), "world"))
      .toDF("ts", "text").write.parquet(s"$in/f1")
    StreamingDedup.run(spark, s"$in/*", proto, "ts", "text", out, ckpt)
    val r1 = spark.read.parquet(out)
    assert(r1.filter($"text" === "hello").count() === 1)
    assert(r1.count() === 2)

    // run 2 (restart): a replayed duplicate inside the window is dropped by
    // CHECKPOINTED state; a fresh doc advances the watermark to 11:30,
    // evicting the "hello" state row (expired 10:30)
    Seq((ts("2024-01-01 10:20:00"), "hello"),
      (ts("2024-01-01 12:00:00"), "fresh"))
      .toDF("ts", "text").write.parquet(s"$in/f2")
    StreamingDedup.run(spark, s"$in/*", proto, "ts", "text", out, ckpt)
    val r2 = spark.read.parquet(out)
    assert(r2.filter($"text" === "hello").count() === 1)
    assert(r2.filter($"text" === "fresh").count() === 1)

    // run 3: the same text past the window re-lands — state was evicted,
    // which is the bounded-state contract (downstream batch d1 owns
    // cross-window identity)
    Seq((ts("2024-01-01 12:10:00"), "hello"))
      .toDF("ts", "text").write.parquet(s"$in/f3")
    StreamingDedup.run(spark, s"$in/*", proto, "ts", "text", out, ckpt)
    val r3 = spark.read.parquet(out)
    assert(r3.filter($"text" === "hello").count() === 2)
    assert(r3.count() === 4)
  }
}
