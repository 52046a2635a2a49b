package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness: d2 duplicate-pair counts at 1x vs the ScaleGen
  * 10x corpus — separates genuine output growth from pipeline
  * inefficiency (PLANS.md round-6 exponent adjudication). */
object D2Pairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      // the exact d2 shape (LlmQueries.scala:227-231)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
      val n = docs.count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(
        docs, "doc_id", "toks", k = 16, bands = 8, threshold = 0.5).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir": "$dir", "docs": $n, "pairs": $pairs, "secs": $secs%.2f}""")
    }
    spark.stop()
  }
}
