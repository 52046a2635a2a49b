package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Images

/** The streamed image-stats store must be ROW-IDENTICAL to the batch
  * decode, stay exactly-once across idle re-runs and incremental drains,
  * and survive the output-landed/commit-lost crash window (a replayed
  * batch overwrites its own partition byte-identically).
  */
class StreamingImageStatsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range) =
    Images.synthPngCorpus(
      ids.map(i => (i.toLong, i.toLong, i % 3 == 1)).toDF("media_id", "seed", "noise"),
      "media_id", "seed", "noise")

  test("streamed stats store == batch imageStats, incrementally, idempotent") {
    val root = Files.createTempDirectory("graft-stream-imgstats").toString
    val in = s"$root/raw"
    val batch1 = corpus(0 until 30)
    val batch2 = corpus(30 until 45)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingImageStats.run(spark, s"$in/*",
      batch1, "media_id", "image", s"$root/store", s"$root/ckpt")
    def streamed() = StreamingImageStats.statsView(spark, s"$root/store").get
    def batchStats(m: org.apache.spark.sql.DataFrame) =
      Images.imageStats(m, "media_id", "image")

    runOnce()
    assert(streamed().exceptAll(batchStats(batch1)).count() == 0)
    assert(batchStats(batch1).exceptAll(streamed()).count() == 0)

    // idle re-run: registry remembers, no duplicate rows
    runOnce()
    assert(streamed().count() == 30)

    // incremental drain appends exactly batch2's stats
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(streamed().exceptAll(batchStats(union)).count() == 0)
    assert(batchStats(union).exceptAll(streamed()).count() == 0)
    assert(streamed().count() == 45)
  }

  test("crash replay: land-then-crash re-run overwrites its own partition only") {
    val root = Files.createTempDirectory("graft-stream-imgstats2").toString
    val in = s"$root/raw"
    val batch1 = corpus(0 until 20)
    batch1.write.parquet(s"$in/f1")
    // first attempt crashes AFTER the write, BEFORE the checkpoint commit
    var crashed = false
    intercept[Exception] {
      StreamingImageStats.run(spark, s"$in/*", batch1, "media_id", "image",
        s"$root/store", s"$root/ckpt",
        batchHook = _ => { crashed = true; throw new RuntimeException("torn drain") })
    }
    assert(crashed)
    // replay completes and does not duplicate the landed partition
    StreamingImageStats.run(spark, s"$in/*", batch1, "media_id", "image",
      s"$root/store", s"$root/ckpt")
    val streamed = StreamingImageStats.statsView(spark, s"$root/store").get
    assert(streamed.count() == 20)
    assert(streamed.exceptAll(
      Images.imageStats(batch1, "media_id", "image")).count() == 0)
  }
}
