package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness: the fixed per-query cost of local-mode Spark
  * (scheduling + codegen + noop-sink) on a 5-row table — the constant every
  * catalog query pays regardless of data size. Reproduces the floor figure
  * behind the PLANS.md round-6 ratio adjudication. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup shape as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy("c_mktsegment").count().write.format("noop").mode("overwrite").save()
    val times = (1 to 25).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/region.parquet")
        .selectExpr("r_regionkey", "upper(r_name) AS n")
        .orderBy("r_regionkey")
        .write.format("noop").mode("overwrite").save()
      System.gc()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"""{"floor_median": ${times(times.size / 2)}%.3f, "floor_min": ${times.head}%.3f, "floor_p90": ${times(22)}%.3f}""")
    spark.stop()
  }
}
