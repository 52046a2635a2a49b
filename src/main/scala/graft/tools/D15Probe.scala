package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness for incremental semantic dedup (PLANS.md round 10):
  * FIXED batch folded against a growing frozen-codebook cluster index.
  * The cross leg is one broadcast-probed scan of the index (never
  * shuffled), so per-batch cost should grow sub-linearly in index size —
  * scan-bound plus candidate-verify volume, which under a FROZEN codebook
  * grows with cluster occupancy (the drift an epoch rebuild resets).
  * Contrast: the full d14-style rebuild at each size (Lloyd + all-pairs
  * within clusters), the cost the incremental path avoids per batch.
  *
  * Usage: runMain graft.tools.D15Probe <n> [<n> ...]
  */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hashVecs(n: Long, salt: Int): DataFrame =
      spark.range(n).select(col("id").as("vid"),
        expr(s"""transform(sequence(0, 63),
                  j -> (pmod(hash(id * 64 + j + $salt), 1000) / 1000.0d) - 0.5d)""")
          .as("v"))

    // fixed 5k batch: half near-copies of corpus ids (present at every
    // scale), half novel — ids offset into their own space
    val batch = hashVecs(2500, 0)
      .select((col("vid") + 2000000000L).as("vid"),
        expr("transform(v, x -> x + 0.05d)").as("v"))
      .unionByName(hashVecs(2500, 104729)
        .select((col("vid") + 3000000000L).as("vid"), col("v")))
      .localCheckpoint(true)

    for (n <- args.map(_.toLong)) {
      val corpus = hashVecs(n, 0)
      val scratch = s"/tmp/graft-d15probe-${ProcessHandle.current().pid()}"

      def buildAndFold(k: Int, tag: String): (Int, Long, Double) = {
        val (cents0, idx0) = Similarity.semClusterIndex(corpus, "vid", "v",
          k, iters = 1)
        cents0.write.mode("overwrite").parquet(s"$scratch/$tag/cents")
        idx0.write.mode("overwrite").parquet(s"$scratch/$tag/index")
        val cents = spark.read.parquet(s"$scratch/$tag/cents").localCheckpoint(true)
        val idx = spark.read.parquet(s"$scratch/$tag/index")
        def foldOnce(): Long = Similarity.incrementalSemDedup(
          batch, cents, idx, "vid", "v", threshold = 0.9).count()
        foldOnce() // warm JIT + page cache
        System.gc()
        val t0 = System.nanoTime(); val removed = foldOnce()
        (k, removed, (System.nanoTime() - t0) / 1e9)
      }
      // frozen: codebook sized for the SMALLEST corpus — the aged-epoch
      // worst case, cluster occupancy (and verify fan-out) grows with the
      // index. refit: corpus-sized k — occupancy constant, fold ~scan-bound.
      val (kF, remF, tF) = buildAndFold(Similarity.semDedupKFor(args.head.toLong), "frozen")
      val (kR, remR, tR) = buildAndFold(Similarity.semDedupKFor(n), "refit")
      println(f"""{"n": $n, "k_frozen": $kF, "fold_frozen_secs": $tF%.2f, "removed_frozen": $remF, "k_refit": $kR, "fold_refit_secs": $tR%.2f, "removed_refit": $remR}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      System.gc()
    }
    spark.stop()
  }
}
