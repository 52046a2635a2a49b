package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The streamed vector-bucket index must be ROW-IDENTICAL to the batch
  * bucketing at the same pinned plane count — the identity that lets an
  * LSH search probe an index a stream has been maintaining. Also pins
  * that the pinned-plane contract holds across drains (same planes, no
  * re-bucketing). */
class StreamingVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed vector index == batch bucketing, incrementally, idempotent") {
    val root = Files.createTempDirectory("graft-stream-vec").toString
    val in = s"$root/raw"
    val nPlanes = 8
    val dim = 64
    val all = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val batch1 = all.filter($"vec_id" < 150)
    val batch2 = all.filter($"vec_id" >= 150 && $"vec_id" < 220)
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingVectorIndex.run(spark, s"$in/*", batch1,
      "vec_id", "embedding", s"$root/index", s"$root/ckpt",
      nPlanes = nPlanes, dim = dim, nTables = 2)
    def streamed() = spark.read.parquet(s"$root/index")
    def batchIndex(vecs: org.apache.spark.sql.DataFrame) =
      StreamingVectorIndex.bucketRows(vecs, "vec_id", "embedding",
        nPlanes, dim, 2)

    runOnce()
    assert(streamed().exceptAll(batchIndex(batch1)).count() == 0)
    assert(batchIndex(batch1).exceptAll(streamed()).count() == 0)
    // every vector appears once per table
    assert(streamed().count() == 2L * batch1.count())

    // idle re-run: registry remembers, no duplicate rows
    runOnce()
    assert(streamed().count() == 2L * batch1.count())

    // incremental drain appends exactly batch2's bucket rows
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(streamed().exceptAll(batchIndex(union)).count() == 0)
    assert(batchIndex(union).exceptAll(streamed()).count() == 0)

    // NON-CIRCULAR gate: drive the actual search path against the
    // stream-maintained index and against the batch path's own internal
    // bucketing — identical top-k results. Any drift between bucketRows
    // and the search-side hashing (plane family, cast, table wiring)
    // breaks this equality even though the row-identity checks above
    // share code with the maintainer.
    val vecsD = union.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = vecsD.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val corpus = vecsD.select($"vec_id".as("cid"), $"v".as("cvec"))
    val viaBatch = Similarity.lshTopKPinned(queries, corpus, k = 3,
      nPlanes = nPlanes, dim = dim, nTables = 2)
    val viaStream = Similarity.lshTopKIndexed(queries, corpus,
      streamed().withColumnRenamed("vec_id", "cid"), k = 3,
      nPlanes = nPlanes, dim = dim, nTables = 2)
    assert(viaStream.exceptAll(viaBatch).count() == 0)
    assert(viaBatch.exceptAll(viaStream).count() == 0)
    assert(viaStream.count() > 0)
  }
}
