package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec

/** The streaming capstone: raw files (with producer-replay duplicates) →
  * watermarked exact dedup → broadcast enrichment → idempotent per-batch
  * landing, surviving a crash injected in the worst window (batch output
  * written, checkpoint commit lost) and an incremental second drain.
  */
class StreamingCorpusFlowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")

  test("dedup → enrich → landing chain is exactly-once across a mid-batch kill") {
    val root = Files.createTempDirectory("graft-flow").toString
    val in = s"$root/raw"
    val proto = Seq((1L, ts(0), "t", "s")).toDF("doc_id", "ts", "text", "src")
    val dim = Seq(("web", 0.9), ("books", 0.99)).toDF("src", "quality")

    // producer wrote docs 1-10; its retry re-sent 6-10 (same text ⇒ same
    // hash) alongside fresh 11-15 — the within-watermark duplicate cluster
    (1 to 10).map(i => (i.toLong, ts(i), s"doc $i", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "ts", "text", "src").write.parquet(s"$in/f1")
    (6 to 15).map(i => (i.toLong, ts(i), s"doc $i", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "ts", "text", "src").write.parquet(s"$in/f2")

    // first run: the enrich stage crashes AFTER its write, BEFORE commit
    var killed = false
    val boom = intercept[StreamingQueryException] {
      StreamingCorpusFlow.run(spark, s"$in/*", proto, "ts", "text", dim, "src",
        root, batchHook = { _ => if (!killed) { killed = true; sys.error("kill -9") } })
    }
    assert(boom.getMessage.contains("kill -9") ||
      Option(boom.getCause).exists(_.getMessage.contains("kill -9")))
    // the crash window left output landed but uncommitted
    assert(spark.read.parquet(s"$root/enriched").count() > 0)

    // restart: the replayed batch overwrites its own partition — idempotent
    StreamingCorpusFlow.run(spark, s"$in/*", proto, "ts", "text", dim, "src", root)
    val out = spark.read.parquet(s"$root/enriched")
    assert(out.count() == 15, "15 distinct docs, duplicates never land twice")
    assert(out.select("text").distinct().count() == 15)
    val enriched = out.select("doc_id", "quality").as[(Long, Option[Double])]
      .collect().toMap
    assert(enriched(2L) == Some(0.9) && enriched(1L) == Some(0.99))
    assert(enriched.size == 15 && enriched.values.forall(_.isDefined))

    // idle re-run: both file registries remember everything — no change
    StreamingCorpusFlow.run(spark, s"$in/*", proto, "ts", "text", dim, "src", root)
    assert(spark.read.parquet(s"$root/enriched").count() == 15)

    // incremental drain: a late producer file with 3 more replays + 5 new
    // docs folds in exactly the 5 new ones, in a fresh batch partition
    (13 to 20).map(i => (i.toLong, ts(i + 10), s"doc $i", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "ts", "text", "src").write.parquet(s"$in/f3")
    StreamingCorpusFlow.run(spark, s"$in/*", proto, "ts", "text", dim, "src", root)
    val all = spark.read.parquet(s"$root/enriched")
    assert(all.count() == 20)
    assert(all.select("text").distinct().count() == 20)
    // the two drains landed in distinct batch-id partitions
    assert(all.select("batch_id").distinct().count() >= 2)
  }
}
