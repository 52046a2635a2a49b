package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** The streamed window index must be ROW-IDENTICAL (modulo the batch_id
  * partition column) to the batch-built one over the same corpus — that
  * identity is what lets `incrementalSubstringSpans` probe an index a
  * stream has been maintaining instead of a batch rebuild. Presence-only
  * rows make the identity hold for ANY arrival order (no id-monotonicity
  * caveat). Also pins the crash window: output landed, checkpoint commit
  * lost, replay. */
class StreamingWindowIndexSpec extends SparkSpec {
  import spark.implicits._

  private val W = 40

  test("streamed window index == batch index across drains, idle re-runs, and crash replay") {
    val root = Files.createTempDirectory("graft-stream-winidx").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    // batch2 re-sends some of batch1's content under new ids (windows must
    // be absorbed — already indexed) and brings fresh content of its own
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
      .unionByName(batch1.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    batch1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingWindowIndex.run(spark, s"$in/*", batch1,
        "text", W, s"$root/index", s"$root/ckpt", hook)
    def streamed() =
      StreamingWindowIndex.indexSoFar(spark, s"$root/index").get
    def batchIndex(docs: org.apache.spark.sql.DataFrame) =
      Dedup.substringWindowIndex(docs, "text", W)
    def assertSame(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.exceptAll(b).count() == 0)
      assert(b.exceptAll(a).count() == 0)
    }

    runOnce()
    assertSame(streamed(), batchIndex(batch1))

    // idle re-run: the file registry remembers everything — no duplicates
    runOnce()
    assertSame(streamed(), batchIndex(batch1))

    // incremental drain: only batch2's never-seen windows join the index
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assertSame(streamed(), batchIndex(union))

    // crash window: batch 3's output lands, the checkpoint commit is lost
    val batch3 = docsAll.filter($"doc_id" >= 400 && $"doc_id" < 450)
    batch3.write.parquet(s"$in/f3")
    val boom = intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after write"))
    }
    assert(boom.getMessage != null)
    // replay re-lands the same partition byte-identically — no duplicates
    runOnce()
    val all = union.unionByName(batch3)
    assertSame(streamed(), batchIndex(all))

    // and the maintained index drives incremental substring dedup directly:
    // same spans as against a batch-built index over the same corpus
    val newBatch = docsAll.filter($"doc_id" >= 450 && $"doc_id" < 500)
      .unionByName(all.filter($"doc_id" % 11 === 0 && $"doc_id" < 1000000)
        .select(($"doc_id" + 2000000).as("doc_id"), $"text"))
    val viaStream = Dedup.incrementalSubstringSpans(
      newBatch, streamed(), "doc_id", "text", W)
    val viaBatch = Dedup.incrementalSubstringSpans(
      newBatch, batchIndex(all), "doc_id", "text", W)
    assertSame(viaStream, viaBatch)
    assert(viaStream.filter($"dup_chars" > 0).count() > 0)
  }
}
