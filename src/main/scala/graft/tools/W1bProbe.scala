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
    def frame(nRows: Long) = spark.range(nRows)
      // integer div: a 100000-us jump every 500 rows => ~nRows/500
      // sessions (a float `/` here smooths the ramp to ONE session)
      .selectExpr("'giant' AS user",
        "id * 10 + (id div 500) * 100000 AS ts", "id")
      .repartition(32)
    def run(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once on a small frame so the first timed size does
    // not absorb JIT/first-run cost for whichever engine runs first
    locally {
      val w = frame(200000L)
      run(Relational.sessionize(w, "user", "ts", "id", 1000L))
      run(Relational.sessionizeScalable(w, "user", "ts", "id", 1000L))
      System.gc()
    }
    for (nRows <- sizes) {
      val df = frame(nRows)
      val tWin = run(Relational.sessionize(df, "user", "ts", "id", 1000L))
      val tScan = run(Relational.sessionizeScalable(df, "user", "ts", "id", 1000L))
      println(f"""{"rows": $nRows, "window_secs": $tWin%.2f, "scan_secs": $tScan%.2f}""")
      System.gc()
    }
    spark.stop()
  }
}
