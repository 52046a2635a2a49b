package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Measurement harness for the scalable sessionize: ONE key holding the
  * whole frame — the shape where `sessionize`'s per-key window collapses
  * to a single task — at growing row counts. Times both engines on a
  * noop-materialized pass; the claim is that the window form's cost grows
  * with the single task (one sort, one core) while the scan form stays
  * distributed (32-way range sort + per-partition scan).
  */
object W1bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong) else Array(2000000L, 20000000L)
    for (nRows <- sizes) {
      val df = spark.range(nRows)
        .select(lit("giant").as("user"),
          (col("id") * 10 + (col("id") / 500) * 100000L).as("ts"),
          col("id"))
        .repartition(32)
      def run(f: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm both paths once at the smallest size only (JIT); sizes are
      // timed cold-per-size but identically for both engines
      val tWin = run(Relational.sessionize(df, "user", "ts", "id", 1000L))
      val tScan = run(Relational.sessionizeScalable(df, "user", "ts", "id", 1000L))
      println(f"""{"rows": $nRows, "window_secs": $tWin%.2f, "scan_secs": $tScan%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
