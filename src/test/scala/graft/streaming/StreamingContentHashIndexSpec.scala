package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** The streamed content-hash index must be ROW-IDENTICAL (modulo the
  * batch_id partition column) to the batch-built one over the same corpus —
  * that identity is what lets `incrementalExactDedup` run against an index
  * a stream has been maintaining instead of a batch rebuild. Also pins the
  * crash window: output landed, checkpoint commit lost, replay. */
class StreamingContentHashIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed index == batch index across drains, idle re-runs, and crash replay") {
    val root = Files.createTempDirectory("graft-stream-chidx").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    // batch2 re-sends some of batch1's content under new ids (must be
    // absorbed by the index) and brings fresh content of its own
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
      .unionByName(batch1.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    batch1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingContentHashIndex.run(spark, s"$in/*", batch1,
        "doc_id", "text", s"$root/index", s"$root/ckpt", hook)
    def streamed() =
      StreamingContentHashIndex.indexSoFar(spark, s"$root/index").get
    def batchIndex(docs: org.apache.spark.sql.DataFrame) =
      Dedup.contentHashIndex(docs, "doc_id", "text")
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

    // incremental drain: only batch2's never-seen content joins the index;
    // re-sent content keeps batch1's (lower-id) row — identical to a batch
    // rebuild because ids are monotone in arrival order
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

    // and the maintained index drives incremental exact dedup directly:
    // same result as a batch-built index over the same corpus
    val newBatch = docsAll.filter($"doc_id" >= 450 && $"doc_id" < 500)
      .unionByName(all.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"), $"text"))
    val viaStream = Dedup.incrementalExactDedup(
      newBatch, streamed(), "doc_id", "text")
    val viaBatch = Dedup.incrementalExactDedup(
      newBatch, batchIndex(all), "doc_id", "text")
    assertSame(viaStream, viaBatch)
    assert(viaStream.count() > 0)
  }

  test("null text drops from the incremental path like the SQL NOT IN form") {
    val newDocs = Seq((1L, "alpha"), (2L, null.asInstanceOf[String]),
      (3L, "alpha"), (4L, "beta")).toDF("doc_id", "text")
    val index = Dedup.contentHashIndex(
      Seq((10L, "beta")).toDF("doc_id", "text"), "doc_id", "text")
    val out = Dedup.incrementalExactDedup(newDocs, index, "doc_id", "text")
      .collect()
    // beta is indexed, the null row vanishes, alpha collapses to one group
    assert(out.length == 1)
    assert(out.head.getAs[Long]("kept_id") == 1L)
    assert(out.head.getAs[Long]("n_copies") == 2L)
  }
}
