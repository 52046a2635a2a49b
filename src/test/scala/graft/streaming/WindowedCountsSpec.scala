package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class WindowedCountsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windows close in event-time order and accept bounded lateness") {
    val root = Files.createTempDirectory("graft-wc").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val proto = Seq((ts("2024-01-01 00:00:00"), "k")).toDF("ts", "key")

    // batch 1: events in hour 10 and hour 11
    Seq((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:20:00"), "a"),
      (ts("2024-01-01 11:10:00"), "b")).toDF("ts", "key").write.parquet(s"$in/f1")
    WindowedCounts.run(spark, s"$in/*", proto, "ts", "key", out, ckpt)
    // watermark after batch1 = 11:10 - 30min = 10:40 → no window closed yet
    val afterB1 = spark.read.parquet(out).count()

    assert(afterB1 == 0, s"no window should close before the watermark passes its end")

    // batch 2: a late hour-10 event — the watermark (10:40) has NOT passed
    // the window end (11:00), so it still counts — plus hour-13 events that
    // push the watermark past hours 10 and 11, closing both windows.
    Seq((ts("2024-01-01 10:30:00"), "a"), (ts("2024-01-01 13:00:00"), "c"))
      .toDF("ts", "key").write.parquet(s"$in/f2")
    WindowedCounts.run(spark, s"$in/*", proto, "ts", "key", out, ckpt)

    val rows = spark.read.parquet(out)
      .select("win_start", "key", "cnt").as[(Timestamp, String, Long)]
      .collect().toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), "a", 3L)), s"got $rows")
    assert(rows.contains((ts("2024-01-01 11:00:00"), "b", 1L)), s"got $rows")
    // hour-13 window is still open (watermark has not passed its end)
    assert(!rows.exists(_._1 == ts("2024-01-01 13:00:00")), s"got $rows")

    // batch 3: an hour-10 event arriving AFTER the watermark (12:30) passed
    // its window end — dropped; hour-15 events close the hour-13 window.
    Seq((ts("2024-01-01 10:45:00"), "a"), (ts("2024-01-01 15:00:00"), "d"))
      .toDF("ts", "key").write.parquet(s"$in/f3")
    WindowedCounts.run(spark, s"$in/*", proto, "ts", "key", out, ckpt)
    val fin = spark.read.parquet(out)
      .select("win_start", "key", "cnt").as[(Timestamp, String, Long)]
      .collect().toSeq
    // exactly one hour-10 row (no re-emit, late event dropped), hour-13 closed
    assert(fin.count(_._1 == ts("2024-01-01 10:00:00")) == 1, s"got $fin")
    assert(fin.contains((ts("2024-01-01 13:00:00"), "c", 1L)), s"got $fin")
  }
}
