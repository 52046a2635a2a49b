package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The streamed cluster-keyed vector store must be ROW-IDENTICAL (modulo
  * the batch_id partition column) to frozen-codebook assignment over the
  * same corpus — that identity is what lets `incrementalSemDedup` probe a
  * store a stream has been maintaining instead of a batch rebuild. Also
  * pins the crash window: output landed, checkpoint commit lost, replay. */
class StreamingSemClusterIndexSpec extends SparkSpec {
  import spark.implicits._

  private def toV(df: DataFrame): DataFrame =
    df.select(col("vid"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("streamed store == frozen-codebook assignment, incl. crash replay") {
    val root = Files.createTempDirectory("graft-stream-semidx").toString
    val in = s"$root/raw"
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("vid"), col("embedding"))
    val b1 = emb.filter($"vid" < 200)
    val b2 = emb.filter($"vid" >= 200 && $"vid" < 280)
    val b3 = emb.filter($"vid" >= 280 && $"vid" < 320)
    // the frozen codebook comes from the initial corpus build
    val (cents0, idx0) = Similarity.semClusterIndex(toV(b1), "vid", "v",
      k = 4, iters = 1)
    val cents = cents0.localCheckpoint(true)
    b1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingSemClusterIndex.run(spark, s"$in/*", b1, "vid", "embedding",
        cents, s"$root/store", s"$root/ckpt", hook)
    def streamed() =
      StreamingSemClusterIndex.indexSoFar(spark, s"$root/store").get
    def frozenAssign(docs: DataFrame): DataFrame = {
      val v = toV(docs)
      Similarity.assignClusters(
          v.withColumnRenamed("vid", "__vid").withColumnRenamed("v", "__v"),
          cents, "__vid", "__v")
        .join(v.withColumnRenamed("vid", "__vid"), Seq("__vid"))
        .select(col("__vid").as("vid"), col("cid"), col("v"))
    }
    def assertSame(a: DataFrame, b: DataFrame): Unit = {
      assert(a.exceptAll(b).count() == 0)
      assert(b.exceptAll(a).count() == 0)
    }

    runOnce()
    assertSame(streamed(), frozenAssign(b1))
    // the first drain over the codebook's own corpus reproduces the batch
    // build exactly
    assertSame(streamed(), idx0)

    // idle re-run: no duplicates
    runOnce()
    assertSame(streamed(), frozenAssign(b1))

    // incremental drain under the FROZEN codebook
    b2.write.parquet(s"$in/f2")
    runOnce()
    assertSame(streamed(), frozenAssign(b1.unionByName(b2)))

    // crash window: batch 3's output lands, the checkpoint commit is lost
    b3.write.parquet(s"$in/f3")
    val boom = intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after write"))
    }
    assert(boom.getMessage != null)
    runOnce() // replay overwrites its own partition byte-identically
    val all = b1.unionByName(b2).unionByName(b3)
    assertSame(streamed(), frozenAssign(all))

    // and the maintained store drives incremental semantic dedup exactly
    // as a batch-built frozen-codebook store does
    val batch = toV(emb.filter($"vid" % 9 === 0 && $"vid" < 320))
      .select(($"vid" + 500000).as("vid"), $"v")
    val viaStream = Similarity.incrementalSemDedup(batch, cents, streamed(),
      "vid", "v", threshold = 0.95)
    val viaBatch = Similarity.incrementalSemDedup(batch, cents,
      frozenAssign(all), "vid", "v", threshold = 0.95)
    assertSame(viaStream, viaBatch)
    assert(viaStream.count() > 0)
  }
}
