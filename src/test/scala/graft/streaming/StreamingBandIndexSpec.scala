package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, TextOps}

/** The streamed band index must be ROW-IDENTICAL to the batch-built one —
  * that identity is what lets `incrementalMinhashPairs` run against an
  * index a stream has been maintaining instead of a batch rebuild. */
class StreamingBandIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed index == batch index, incrementally and after idle re-runs") {
    val root = Files.createTempDirectory("graft-stream-idx").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingBandIndex.run(spark, s"$in/*", batch1,
      "doc_id", "text", s"$root/index", s"$root/ckpt")
    def streamed() = spark.read.parquet(s"$root/index")
    def batchIndex(docs: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandIndex(
        docs.select($"doc_id", TextOps.tokens($"text").as("toks")), "doc_id", "toks")

    runOnce()
    assert(streamed().exceptAll(batchIndex(batch1)).count() == 0)
    assert(batchIndex(batch1).exceptAll(streamed()).count() == 0)

    // idle re-run: the file registry remembers everything — no duplicates
    runOnce()
    assert(streamed().count() == batchIndex(batch1).count())

    // incremental drain folds in exactly batch2's band rows
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(streamed().exceptAll(batchIndex(union)).count() == 0)
    assert(batchIndex(union).exceptAll(streamed()).count() == 0)

    // and the maintained index drives the incremental dedup directly:
    // same pairs as a batch-built index over the same corpus
    val newBatch = docsAll.filter($"doc_id" >= 400 && $"doc_id" < 450)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
    val corpusToks = union.select($"doc_id", TextOps.tokens($"text").as("toks"))
    val viaStream = Dedup.incrementalMinhashPairs(newBatch, streamed(),
      corpusToks, "doc_id", "toks")
    val viaBatch = Dedup.incrementalMinhashPairs(newBatch, batchIndex(union),
      corpusToks, "doc_id", "toks")
    assert(viaStream.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaStream).count() == 0)
  }
}
