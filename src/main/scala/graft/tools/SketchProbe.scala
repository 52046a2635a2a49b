package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Measurement harness for the sketch family — the claim under test: at
  * high cardinality the HLL register aggregation (max per (group, bucket),
  * map-side combined, 256 rows/group out) beats exact COUNT(DISTINCT)
  * (every distinct value crosses the shuffle), and the gap widens with
  * scale while the estimate stays inside the ~6.5% (1.04/√256) envelope.
  * Args are row counts; values are synthesized distinct-per-row over 8
  * groups (spark.range — no testdata dependency), so cardinality is known
  * exactly without a second exact pass at the largest sizes. */
object SketchProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (a <- args) {
      val n = a.toLong
      def base = spark.range(n)
        .select(expr("CAST(id % 8 AS STRING)").as("g"),
          expr("CAST(id AS STRING)").as("v"))
      val tHll = timed {
        noop(Sketches.hllEstimate(Sketches.hllRegister(base, "g", "v"), "g"))
      }
      val tExact = timed {
        noop(base.groupBy("g").agg(countDistinct("v")))
      }
      // one estimate row for the error report (per-group truth = n/8 ± 1)
      val est = Sketches.hllEstimate(Sketches.hllRegister(base, "g", "v"), "g")
        .agg(sum("est")).head().getLong(0)
      println(f"PROBE n=$n hll=$tHll%.2f exact=$tExact%.2f " +
        f"est_total=$est err_pct=${100.0 * (est - n) / n}%.2f")
      System.gc()
    }
    spark.stop()
  }
}
