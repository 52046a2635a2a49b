package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingClusterLabels

/** Measurement harness for the streaming cluster-label maintainer — the
  * journaled multi-bucket overwrite's scale behavior (the one write path
  * without a probe record before round 10). At each arg dir:
  *
  *   1. build the label store by draining a corpus-sized star-graph pair
  *      batch (one edge per lineitem row) through the maintainer (untimed);
  *   2. fold a FIXED ~10-pair merge batch and time it, counting how many
  *      bucket partitions were rewritten (mtime change) out of the total.
  *
  * Run once with the legacy fixed bucket count (64) and once with
  * [[StreamingClusterLabels.bucketsForStore]]: per-batch cost is
  * touched_buckets × bucket_size, so the fixed count should degrade
  * toward a full-store rewrite as the store grows while the scaled count
  * holds amplification constant — the measured claim behind the
  * bucketsForStore default.
  */
object SclProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (dir <- args) {
      val oldPairs = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("pk"))
        .select(col("pk").as("id1"), (col("pk") - col("pk") % 64).as("id2"))
      val nRows = oldPairs.count()
      val variants = Seq(64, StreamingClusterLabels.bucketsForStore(nRows)).distinct
      for (nb <- variants) {
        val root = "/tmp/graft-scl-" +
          dir.replaceAll("[^a-zA-Z0-9]", "_") + s"-$nb"
        deleteRec(new File(root))
        val in = s"$root/pairs"
        val store = s"$root/labels"
        val schema = Seq((0L, 0L)).toDF("id1", "id2")
        def drain(): Unit = StreamingClusterLabels.run(spark, s"$in/*",
          schema, "id1", "id2", store, s"$root/ckpt", nBuckets = nb)

        oldPairs.write.parquet(s"$in/f0")
        drain() // untimed: initial store build
        val storeRows = spark.read.parquet(store).count()

        // fixed small fold: 8 block merges + 2 new-vertex attaches — the
        // realistic "a few clusters merged per micro-batch" shape
        def bucketMtimes(): Map[String, Long] =
          new File(store).listFiles().toSeq
            .filter(_.getName.startsWith("bucket="))
            .map { b =>
              val latest = b.listFiles()
                .filter(_.getName.endsWith(".parquet"))
                .map(f => f.lastModified()).foldLeft(0L)(math.max)
              b.getName -> latest
            }.toMap
        val folds = Seq(
          (1 to 8).map(i => (i * 640L + 9, i * 640L + 100))
            ++ Seq((2000000000L, 9L), (2000000001L, 649L)),
          (11 to 18).map(i => (i * 640L + 9, i * 640L + 100))
            ++ Seq((2000000002L, 7049L), (2000000003L, 7689L)))
        val foldStats = folds.zipWithIndex.map { case (pairs, fi) =>
          pairs.toDF("id1", "id2").coalesce(1).write.parquet(s"$in/b$fi")
          val before = bucketMtimes()
          Thread.sleep(1100) // mtime granularity can be 1s
          val t0 = System.nanoTime()
          drain()
          val secs = (System.nanoTime() - t0) / 1e9
          val after = bucketMtimes()
          val rewritten = after.count { case (k, m) => before.get(k).forall(_ != m) }
          (secs, rewritten, after.size)
        }
        val (s1, r1, tot1) = foldStats(0)
        val (s2, r2, tot2) = foldStats(1)
        println(f"""{"dir": "$dir", "nb": $nb, "store_rows": $storeRows, "fold1_secs": $s1%.2f, "fold1_buckets": $r1, "fold2_secs": $s2%.2f, "fold2_buckets": $r2, "total_buckets": ${math.max(tot1, tot2)}}""")
        System.gc()
      }
    }
    spark.stop()
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
    ()
  }
}
