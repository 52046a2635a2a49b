package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join matches in-window, emits unmatched left only after watermark") {
    val root = Files.createTempDirectory("graft-sj").toString
    val lin = s"$root/l"; val rin = s"$root/r"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val lProto = Seq((ts("2024-01-01 00:00:00"), "k", "v")).toDF("lts", "lkey", "lval")
    val rProto = Seq((ts("2024-01-01 00:00:00"), "k", "p")).toDF("rts", "rkey", "rval")
    def run(): Unit = StreamJoin.run(spark, s"$lin/*", lProto, s"$rin/*", rProto,
      "lts", "rts", "lkey", "rkey", out, ckpt)

    // run 1: two views, one in-window purchase for "a" → immediate match
    Seq((ts("2024-01-01 10:00:00"), "a", "view_a"),
      (ts("2024-01-01 10:05:00"), "b", "view_b"))
      .toDF("lts", "lkey", "lval").write.parquet(s"$lin/f1")
    Seq((ts("2024-01-01 10:30:00"), "a", "buy_a"))
      .toDF("rts", "rkey", "rval").write.parquet(s"$rin/f1")
    run()
    val r1 = spark.read.parquet(out)
    assert(r1.filter($"lval" === "view_a" && $"rval" === "buy_a").count() === 1)
    // "b" is unmatched but NOT yet emitted — a matching purchase could
    // still arrive (watermark has not passed lts_b + window + delay)
    assert(r1.filter($"lval" === "view_b").count() === 0)

    // run 2 (restart): right-side events push the right watermark past
    // 10:05 + 1h + 30min → "b" emits with nulls from CHECKPOINTED state
    Seq((ts("2024-01-01 13:00:00"), "z", "late_z"))
      .toDF("rts", "rkey", "rval").write.parquet(s"$rin/f2")
    Seq((ts("2024-01-01 13:00:00"), "z2", "view_z2"))
      .toDF("lts", "lkey", "lval").write.parquet(s"$lin/f2")
    run()
    val r2 = spark.read.parquet(out)
    val b = r2.filter($"lval" === "view_b")
    assert(b.count() === 1)
    assert(b.filter($"rval".isNull).count() === 1)
    // an out-of-window purchase for "a" (10:00 + >1h) never double-matches
    assert(r2.filter($"lval" === "view_a").count() === 1)
  }
}
