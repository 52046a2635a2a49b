package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Measurement harness: d2-shaped pair COUNT + warm TIME at arbitrary
  * ScaleGen dirs (args) — the generalization of [[D2Pairs]] used for the
  * round-8 three-point probe. Separates output growth from pipeline cost:
  * ScaleGen's near-clusters are 5-member at every mult, so past 10× the
  * near fraction dilutes and pair count plateaus — if the band pipeline's
  * cost tracked CORPUS size it would keep rising; tracking OUTPUT it
  * falls with the verify load (measured: PLANS.md round 8). */
object D2Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val aug = docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("toks", expr(
          "slice(toks, 1, greatest(size(toks) - 2, 0))")))
      // warm
      Dedup.minhashLshPairs(aug, "doc_id", "toks", 16, 8, 0.5).count()
      val t0 = System.nanoTime()
      val n = Dedup.minhashLshPairs(aug, "doc_id", "toks", 16, 8, 0.5).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nd = docs.count()
      println(f"""{"dir": "$dir", "docs": $nd, "pairs": $n, "secs": $secs%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
