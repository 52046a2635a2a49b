package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.operators.Sketches

/** The streamed HLL register store, max-merged, must equal the batch-built
  * register over the full history — and survive idle re-runs and crash
  * replay byte-identically (max-merge associativity is the protocol). */
class StreamingHllRegisterSpec extends SparkSpec {
  import spark.implicits._

  test("streamed registers max-merge to the batch register; estimates agree") {
    val root = Files.createTempDirectory("graft-hll-store").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "lang", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingHllRegister.run(spark, s"$in/*", batch1,
      "lang", "md5(text)", s"$root/store", s"$root/ckpt")
    def merged() = StreamingHllRegister.mergedRegister(spark, s"$root/store", "lang")
    def batchReg(docs: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegister(docs, "lang", "md5(text)")

    runOnce()
    assert(merged().exceptAll(batchReg(batch1)).count() == 0)
    assert(batchReg(batch1).exceptAll(merged()).count() == 0)

    // idle re-run: no new partitions, merged view unchanged
    runOnce()
    assert(merged().count() === batchReg(batch1).count())

    // incremental drain folds batch2 in; merged == batch over the union
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(merged().exceptAll(batchReg(union)).count() == 0)
    assert(batchReg(union).exceptAll(merged()).count() == 0)

    // and the consumer-facing estimates agree exactly
    val viaStream = Sketches.hllEstimate(merged(), "lang")
    val viaBatch = Sketches.hllEstimate(batchReg(union), "lang")
    assert(viaStream.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaStream).count() == 0)

    // crash replay: re-land a batch's partition by hand with the same
    // rows (what a replayed foreachBatch does) — store still merges clean
    ExactlyOnce.landBatchPartition(batchReg(batch2), s"$root/store", 1L)
    assert(merged().exceptAll(batchReg(union)).count() == 0)
    assert(batchReg(union).exceptAll(merged()).count() == 0)
  }
}
