package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness: d5-shaped cosine dedup on the ScaleGen 10x
  * embeddings with planes sized by Similarity.lshPlanesFor — reproduces the
  * PLANS.md round-6 scale-probe fix measurement (154 s @ fixed 4 planes vs
  * ~11 s @ corpus-sized planes on the same corpus). */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val aug = e.unionByName(e.filter(col("vid") % 10 === 0)
      .select((col("vid") + 1000000).as("vid"),
        expr("transform(v, x -> x + 0.05d)").as("v")))
    val n = aug.count()
    for ((planes, tables) <- Seq((Similarity.lshPlanesFor(n, 64), 4),
                                 (Similarity.lshPlanesFor(n, 64), 8))) {
      val t0 = System.nanoTime()
      val removed = Similarity.cosineDedupRemovedPinned(aug, threshold = 0.85,
        nPlanes = planes, dim = 64, nTables = tables).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"n": $n, "planes": $planes, "tables": $tables, "removed": $removed, "secs": $secs%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
