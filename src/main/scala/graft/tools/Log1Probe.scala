package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipelines.LogMetrics

/** Scale probe for the §3.2 log-metrics spine (log1_end_to_end): parse →
  * pivot → broadcast catalog join → monthly rollup over a synthesized
  * raw-log TEXT fixture at growing line counts. The catalog-gate probe at
  * sf0.01 1x/10x came out overhead-bound (negative exponent, PLANS r13),
  * so it said nothing about the workload the reference actually runs at
  * volume (300 MB HAProxy archives per batch) — this probe spans 100x+.
  *
  * Line mix mirrors the log1 fixture (same path moduli, same status
  * moduli, ~70% of lines matching a pattern) over a fixed 60-day window
  * and the same 97-slug catalog, so the aggregate's GROUP count stays
  * bounded while line volume grows — the production regime: the pivot
  * reduces, the only data-sized cost is the line scan + parse projection.
  *
  * Usage: runMain graft.tools.Log1Probe <nLines> [<nLines> ...]
  */
object Log1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val segs = Seq("fr", "direct", "api")
    val counters = segs.map(sg => s"nb_visit_$sg") :+ "nb_visit_total"
    val catalog = {
      val slugs = spark.range(0, 50)
        .select(concat(lit("D"), col("id").cast("string")).as("slug"),
          col("id").as("num"))
        .unionByName(spark.range(0, 7)
          .select(concat(lit("O"), col("id").cast("string")).as("slug"),
            col("id").as("num")))
        .unionByName(spark.range(0, 40)
          .select(concat(lit("r-"), col("id").cast("string")).as("slug"),
            col("id").as("num")))
      slugs
        .select(col("slug"), col("num"),
          explode(array(lit(0), lit(1), lit(2))).as("v"))
        .select(col("slug"),
          concat(col("slug"), lit("-v"), col("v").cast("string")).as("id"),
          when(col("v") === 0, lit(true))
            .when(col("v") === 1, lit(false))
            .otherwise(col("num") % 3 === 0).as("archived"),
          concat(lit("2024-01-1"), col("v").cast("string")).as("created"))
        .localCheckpoint(true)
    }

    def fixture(n: Long): String = {
      val out = s"${sys.props("java.io.tmpdir")}/graft-log1-probe-$n"
      val p = col("id") % 10
      val dnum = (col("id") % 50).cast("string")
      val onum = (col("id") % 7).cast("string")
      val rs = concat(lit("r-"), (col("id") % 40).cast("string"))
      val path = when(p === 0, concat(lit("GET /fr/datasets/r/"), rs))
        .when(p === 1, concat(lit("GET /datasets/r/"), rs))
        .when(p === 2, concat(lit("GET /api/1/datasets/D"), dnum, lit("/")))
        .when(p === 3 || p === 4, concat(lit("GET /fr/datasets/D"), dnum))
        .when(p === 5, concat(lit("GET /datasets/D"), dnum))
        .when(p === 6, concat(lit("GET /fr/organizations/O"), onum))
        .when(p === 7, concat(lit("GET /organizations/O"), onum))
        .otherwise(lit("GET /static/style.css"))
      val st = when(col("id") % 11 === 0, lit(404))
        .when(col("id") % 7 === 0, lit(301))
        .otherwise(lit(200)).cast("string")
      val dt = concat(lit("2024-"),
        lpad(expr("cast(id % 60 div 31 + 1 as string)"), 2, "0"), lit("-"),
        lpad(expr("cast(id % 60 % 31 + 1 as string)"), 2, "0"))
      spark.range(n)
        .select(concat(dt, lit(" web1 "), path, lit(" "), st, lit(" +0"))
          .as("value"))
        .write.mode("overwrite").text(out)
      out
    }

    def spine(dir: String): DataFrame = {
      val lines = graft.sources.Readers.rawLines(spark, dir)
      val daily = LogMetrics.joinCatalog(
        LogMetrics.aggregate(LogMetrics.parse(lines), segs), catalog)
      LogMetrics.monthlyRollup(daily, counters, extraKeys = Seq("id"))
    }

    for (n <- args.map(_.toLong)) {
      val dir = fixture(n) // untimed: the fixture write is test scaffolding
      def timed(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        spine(dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      timed() // warm (codegen JIT for the parse projection)
      val secs = Seq(timed(), timed(), timed()).sorted.apply(1)
      println(f"""{"n_lines": $n, "median_secs": $secs%.2f}""")
    }
    spark.stop()
  }
}
