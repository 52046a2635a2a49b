package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GeoWriter

/** Measurement harness for the GeoWriter/Hilbert write path — the one
  * custom write path outside the bench catalog: times `hilbertClustered`
  * (extent pass + Hilbert expression + range-repartition + sorted zstd
  * write + footer rewrite) over deterministic hash-derived points at each
  * arg dir's lineitem, and counts the landed files (the bounded-files
  * contract: range partitioner ⇒ ≤ shuffle.partitions files at any scale).
  * Warm run first; the timed run overwrites it.
  */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      // deterministic France-shaped points: lon/lat from a key hash
      val pts = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          (pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(1000000))
            .cast("double") / 1000000.0 * 15.32 - 5.45).as("lon"),
          (pmod(hash(col("l_linenumber"), col("l_orderkey")), lit(1000000))
            .cast("double") / 1000000.0 * 10.07 + 41.26).as("lat"))
      val out = "/tmp/graft-geoprobe-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      GeoWriter.hilbertClustered(pts, "lon", "lat", out) // warm
      val t0 = System.nanoTime()
      GeoWriter.hilbertClustered(pts, "lon", "lat", out)
      val secs = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(out).count()
      val p = new Path(out)
      val files = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      println(f"""{"dir": "$dir", "rows": $n, "files": $files, "secs": $secs%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
