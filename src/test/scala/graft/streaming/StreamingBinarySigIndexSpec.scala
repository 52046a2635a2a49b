package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The streamed sign-signature index must be ROW-IDENTICAL to the batch
  * packing, stay exactly-once across idle re-runs and incremental drains,
  * and drive the indexed hamming search to the same answer as the batch
  * path (non-circular: the search-side packing is exercised end-to-end).
  */
class StreamingBinarySigIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed signature index == batch packing, incrementally, idempotent") {
    val root = Files.createTempDirectory("graft-stream-bsig").toString
    val in = s"$root/raw"
    val all = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val batch1 = all.filter($"vec_id" < 150)
    val batch2 = all.filter($"vec_id" >= 150 && $"vec_id" < 220)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingBinarySigIndex.run(spark, s"$in/*",
      batch1, "vec_id", "embedding", s"$root/index", s"$root/ckpt")
    def streamed() = spark.read.parquet(s"$root/index")
    def batchIndex(vecs: org.apache.spark.sql.DataFrame) =
      StreamingBinarySigIndex.sigRows(vecs, "vec_id", "embedding")

    runOnce()
    assert(streamed().exceptAll(batchIndex(batch1)).count() == 0)
    assert(batchIndex(batch1).exceptAll(streamed()).count() == 0)
    assert(streamed().count() == batch1.count())

    // idle re-run: registry remembers, no duplicate rows
    runOnce()
    assert(streamed().count() == batch1.count())

    // incremental drain appends exactly batch2's signature rows
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(streamed().exceptAll(batchIndex(union)).count() == 0)
    assert(batchIndex(union).exceptAll(streamed()).count() == 0)

    // NON-CIRCULAR gate: the indexed search over the stream-maintained
    // signatures must equal the batch search that packs on the fly
    val vecsD = union.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = vecsD.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val corpus = vecsD.select($"vec_id".as("cid"), $"v".as("cvec"))
    val viaBatch = Similarity.hammingTopK(queries, corpus, k = 3, rerankR = 10)
    val viaStream = Similarity.hammingTopKIndexed(queries, corpus,
      streamed(), k = 3, rerankR = 10)
    assert(viaStream.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaStream).count() == 0)
    assert(viaStream.count() > 0)
  }

  test("crash replay: a re-run after a torn drain does not duplicate rows") {
    val root = Files.createTempDirectory("graft-stream-bsig2").toString
    val in = s"$root/raw"
    val all = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val batch1 = all.filter($"vec_id" < 80)
    batch1.write.parquet(s"$in/f1")
    def runOnce(): Unit = StreamingBinarySigIndex.run(spark, s"$in/*",
      batch1, "vec_id", "embedding", s"$root/index", s"$root/ckpt")
    runOnce()
    // simulate the crash window: the registry said "drained", a re-run
    // with the same checkpoint must be a no-op
    runOnce(); runOnce()
    assert(spark.read.parquet(s"$root/index").count() == batch1.count())
  }
}
