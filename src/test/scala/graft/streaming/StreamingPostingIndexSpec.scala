package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.operators.Ir

/** The streamed posting index must be ROW-IDENTICAL to the batch-built one
  * — that identity is what lets bm25TopK search an index a stream has been
  * maintaining instead of a batch rebuild. */
class StreamingPostingIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed postings == batch postings, incrementally, and search agrees") {
    val root = Files.createTempDirectory("graft-post-idx").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingPostingIndex.run(spark, s"$in/*", batch1,
      "doc_id", "text", s"$root/index", s"$root/ckpt")
    def streamed() = spark.read.parquet(s"$root/index")
      .select("term", "doc_id", "tf", "dl")

    runOnce()
    val b1 = Ir.postings(batch1, "doc_id", "text")
    assert(streamed().exceptAll(b1).count() == 0)
    assert(b1.exceptAll(streamed()).count() == 0)

    // idle re-run: the file registry remembers everything — no duplicates
    runOnce()
    assert(streamed().count() == b1.count())

    // incremental drain folds in exactly batch2's posting rows
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    val bu = Ir.postings(union, "doc_id", "text")
    assert(streamed().exceptAll(bu).count() == 0)
    assert(bu.exceptAll(streamed()).count() == 0)

    // and BM25 search against the maintained store == against batch-built:
    // df and stats are reader-side aggregates over either index
    val (n, t) = Ir.corpusStats(union, "doc_id", "text")
    val q = Seq((0L, "dup"), (1L, "hash"), (1L, "join")).toDF("query_id", "term")
    val viaStream = Ir.bm25TopK(streamed(), Ir.docFreq(streamed()), n, t, q, k = 10)
    val viaBatch = Ir.bm25TopK(bu, Ir.docFreq(bu), n, t, q, k = 10)
    assert(viaStream.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaStream).count() == 0)
  }
}
