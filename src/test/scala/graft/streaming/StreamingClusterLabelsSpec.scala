package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The stream-maintained label store must equal a batch CC over every pair
  * drained so far, after every drain — including merges that relabel
  * existing components, idle re-runs, and the landed-write/lost-commit
  * crash window. Also pins the bucket contract: untouched buckets keep
  * their files (no full-table rewrite per batch). */
class StreamingClusterLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("component"))).toSet

  test("streamed labels == batch CC after every drain; buckets rewrite sparsely") {
    val root = Files.createTempDirectory("graft-stream-cc").toString
    val in = s"$root/pairs"
    val store = s"$root/labels"
    // batch 1: 200 two-member components
    val b1 = (0 until 200).map(i => (i * 10L, i * 10L + 1)).toDF("id1", "id2")
    // batch 2: one merge, one new-vertex attach, one pure-new pair — a
    // SMALL delta, so the bucket rewrite must be sparse
    val b2 = Seq((0L, 10L), (5000L, 0L), (6000L, 6001L)).toDF("id1", "id2")
    b1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingClusterLabels.run(spark, s"$in/*", b1, "id1", "id2",
        store, s"$root/ckpt", nBuckets = 16, batchHook = hook)
    def streamed(): DataFrame =
      StreamingClusterLabels.labelsSoFar(spark, store).get
    def batchCc(pairs: DataFrame): DataFrame =
      Dedup.connectedComponents(pairs, "id1", "id2")

    runOnce()
    assert(labelSet(streamed()) === labelSet(batchCc(b1)))

    // idle re-run: registry remembers, store unchanged
    runOnce()
    assert(labelSet(streamed()) === labelSet(batchCc(b1)))

    // capture per-bucket file timestamps before the merge batch
    def bucketFiles(): Map[String, Long] = {
      val dir = new java.io.File(store)
      dir.listFiles().filter(_.getName.startsWith("bucket=")).flatMap { b =>
        b.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${b.getName}/${f.getName}" -> f.lastModified())
      }.toMap
    }
    val before = bucketFiles()

    b2.write.parquet(s"$in/f2")
    runOnce()
    val all = b1.unionByName(b2)
    assert(labelSet(streamed()) === labelSet(batchCc(all)))
    // sparse rewrite: some bucket's files survived byte-for-byte (same
    // name, same mtime) — the store was not fully rewritten
    val after = bucketFiles()
    val survivors = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(survivors.nonEmpty,
      s"every bucket was rewritten: before=${before.keySet.size} after=${after.keySet.size}")

    // crash window 1: journal written, apply never ran — store must be
    // untouched, and the replay folds from the pre-batch state
    val b3 = Seq((0L, 6000L)).toDF("id1", "id2") // merge two big clusters
    b3.write.parquet(s"$in/f3")
    intercept[Exception] {
      StreamingClusterLabels.run(spark, s"$in/*", b1, "id1", "id2",
        store, s"$root/ckpt", nBuckets = 16,
        journalHook = _ => throw new RuntimeException("crash before apply"))
    }
    assert(labelSet(streamed()) === labelSet(batchCc(all)))
    // recovery path: the journal IS complete, so recover() may apply it
    // even before the stream replays — equivalent end state either way
    runOnce()
    val all3 = all.unionByName(b3)
    assert(labelSet(streamed()) === labelSet(batchCc(all3)))

    // crash window 2: applied but checkpoint commit lost; replay no-op fold
    val b4 = Seq((7000L, 0L)).toDF("id1", "id2")
    b4.write.parquet(s"$in/f4")
    intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after apply"))
    }
    runOnce()
    assert(labelSet(streamed()) ===
      labelSet(batchCc(all3.unionByName(b4))))
  }
}
