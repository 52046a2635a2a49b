package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Measurement harness for sk7's claim: rolling-window distinct counts
  * are where sketch registers beat exact hardest — the exact form fans
  * every (window, member) pair through a shuffle (7× the deduped rows for
  * a 7-day window), while the register form merges 7 tiny day cells per
  * window off the calendar-bounded grid and never rescans raw rows. Args
  * are row counts; rows are (group, day, member) with 8 groups, 30 days,
  * and ~n/60 distinct members per (group, day) (md5-derived), matching
  * the events-table shape. Both forms produce per-(group, day) 7-day
  * results; the probe reports wall time for each and the max estimator
  * error ppm across windows. */
object SlidingProbe {

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
      def base = spark.range(n).select(
        expr("CAST(id % 8 AS STRING)").as("g"),
        expr("id % 30").as("day"),
        expr(s"CAST(${graft.operators.TextOps.md5LongSql("CAST(id AS STRING)")}" +
          s" % ${math.max(n / 60, 1000L)} AS STRING)").as("__v"))
      val days = base.select(col("day").as("gday")).distinct()

      val tReg = timed {
        val reg = Sketches.hllRegisterBy(base, Seq("g", "day"), "__v")
        val win = days.join(reg, col("day").between(col("gday") - 6, col("gday")))
          .groupBy("g", "gday", "bucket").agg(max("mj").as("mj"))
        noop(Sketches.hllEstimateBy(win, Seq("g", "gday")))
      }
      val tExact = timed {
        noop(days.join(base.dropDuplicates("g", "day", "__v"),
            col("day").between(col("gday") - 6, col("gday")))
          .groupBy("g", "gday").agg(countDistinct("__v")))
      }
      // error envelope across all (g, window) cells
      val reg = Sketches.hllRegisterBy(base, Seq("g", "day"), "__v")
      val win = days.join(reg, col("day").between(col("gday") - 6, col("gday")))
        .groupBy("g", "gday", "bucket").agg(max("mj").as("mj"))
      val err = Sketches.hllEstimateBy(win, Seq("g", "gday"))
        .join(days.join(base.dropDuplicates("g", "day", "__v"),
            col("day").between(col("gday") - 6, col("gday")))
          .groupBy("g", "gday").agg(countDistinct("__v").as("ex")),
          Seq("g", "gday"))
        .agg(max(expr("abs(est - ex) * 1000000L div ex"))).head().getLong(0)
      println(f"PROBE n=$n reg=$tReg%.2f exact=$tExact%.2f max_err_ppm=$err")
      System.gc()
    }
    spark.stop()
  }
}
