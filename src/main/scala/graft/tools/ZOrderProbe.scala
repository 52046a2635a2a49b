package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{RangeShard, ZOrder}

/** Measurement harness for the z-order layout claim: shards of a
  * z-clustered table have small bounding boxes in BOTH dimensions, so a
  * range predicate on EITHER dimension prunes most shards — where a 1-d
  * sort gives perfect pruning on the sort key and ZERO pruning on the
  * co-dimension. Synthesizes an n-row (x, y) table uniform over
  * 16-bit × 16-bit (md5-derived), lands it through RangeShard under (a)
  * the z-interleave key and (b) the x-major key, then for K probe ranges
  * per dimension reports the fraction of shards whose min/max box
  * intersects the probe (= the fraction a zone-map scan planner must
  * read). Footer-level min/max pruning is exactly what the parquet
  * scanner does with these files — the probe measures the layout, not a
  * simulated reader. */
object ZOrderProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nShards = 64
    val base = spark.range(n)
      .select(
        expr(s"${graft.operators.TextOps.md5LongSql("CAST(id AS STRING)")}" +
          " % 65536").as("x"),
        expr(s"${graft.operators.TextOps.md5LongSql("concat('y:', id)")}" +
          " % 65536").as("y"),
        col("id"))

    def boxes(keyed: DataFrame, tag: String): Array[(Long, Long, Long, Long)] = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-zprobe-$tag").toString
      RangeShard.layout(keyed, "__key", root, nShards)
      val b = spark.read.parquet(root)
        .groupBy("shard")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))
      graft.sources.Writers.deleteTreeOnExit(root)
      b
    }

    val zBoxes = boxes(base.withColumn("__z", expr(ZOrder.zSparkSql("x", "y")))
      .withColumn("__key", col("__z") * 10000000L + col("id"))
      .select("__key", "x", "y"), "z")
    val xBoxes = boxes(base.withColumn("__key", col("x") * 10000000L + col("id"))
      .select("__key", "x", "y"), "x")

    // probe ranges: 1/16th-of-domain slices on each dimension
    val probes = (0 until 16).map(i => (i * 4096L, i * 4096L + 4095L))
    def frac(bs: Array[(Long, Long, Long, Long)], onX: Boolean): Double = {
      val hits = probes.map { case (lo, hi) =>
        bs.count { case (x0, x1, y0, y1) =>
          if (onX) x0 <= hi && x1 >= lo else y0 <= hi && y1 >= lo
        }
      }.sum
      hits.toDouble / (probes.size * bs.length)
    }
    println(f"PROBE n=$n shards=$nShards " +
      f"z_scan_x=${frac(zBoxes, true)}%.3f z_scan_y=${frac(zBoxes, false)}%.3f " +
      f"x_scan_x=${frac(xBoxes, true)}%.3f x_scan_y=${frac(xBoxes, false)}%.3f")
    spark.stop()
  }
}
