package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement harness for incremental connected components: at each arg
  * dir, build corpus-sized old pairs + labels (the persisted artifact,
  * written to parquet and read back — untimed), then time (a) folding a
  * FIXED new-pair batch into the labels incrementally and (b) the batch CC
  * rebuild over the union graph. The incremental path's only corpus-sized
  * work is one broadcast-anti scan of the label table (no shuffle, no
  * propagation rounds), so its time should stay near-flat while the batch
  * rebuild grows with the corpus — the ratio is the claim, measured.
  */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixed-size new batch, ids that exist at every scale
    val newPairs = spark.range(5000).toDF("i")
      .filter(col("i") % 30 === 0)
      .select((col("i") - col("i") % 10).as("id1"),
        (col("i") - col("i") % 100).as("id2"))
      .unionByName(spark.range(5000).toDF("i")
        .filter(col("i") % 40 === 0)
        .select((col("i") + 1000000000L).as("id1"), col("i").as("id2")))
      .localCheckpoint(true)
    for (dir <- args) {
      // corpus-sized old graph: one star edge per lineitem row (600 k at
      // sf0.1, 6 M / 18 M at the scaled dirs) — big enough that batch CC's
      // propagation rounds actually shuffle, unlike the documents table
      val oldPairs = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("pk"))
        .select(col("pk").as("id1"), (col("pk") - col("pk") % 64).as("id2"))
      val labelsPath = "/tmp/graft-d13-labels-" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Dedup.connectedComponents(oldPairs, "id1", "id2")
        .write.mode("overwrite").parquet(labelsPath)
      val labels = spark.read.parquet(labelsPath)
      def incOnce(): Long = Dedup.incrementalConnectedComponents(
        labels, newPairs, "id1", "id2").count()
      def batchOnce(): Long = Dedup.connectedComponents(
        oldPairs.unionByName(newPairs), "id1", "id2").count()
      incOnce(); batchOnce() // warm
      val t0 = System.nanoTime(); val nInc = incOnce()
      val tInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val nBatch = batchOnce()
      val tBatch = (System.nanoTime() - t1) / 1e9
      val nl = labels.count()
      println(f"""{"dir": "$dir", "labels": $nl, "inc_rows": $nInc, "batch_rows": $nBatch, "inc_secs": $tInc%.2f, "batch_secs": $tBatch%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
