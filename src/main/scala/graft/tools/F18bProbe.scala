package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Distribution

/** Where does f18b's wall go, and is the buffered exact-percentile or the
  * distributed-selection envelope faster for its 3-key shape at sf0.1?
  * The two paths are bit-identical (DistributedQuantilesSpec), so routing
  * is a pure performance choice.
  *
  * Usage: runMain graft.tools.F18bProbe [sfDir]
  */
object F18bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, d)
    def run(tag: String, ndv: Long): Unit = {
      // one warm, three timed
      def once(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        Distribution.priceDistribution(li, Seq("l_returnflag"),
            "l_extendedprice", nBins = 10, step = 100.0, minSupport = 100L,
            maxBufferedNdv = ndv)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once()).sorted
      println(f"[f18bprobe] $tag%-22s median=${ts(1)}%.2f s  $ts")
    }
    run("buffered (default)", 1000000L)
    run("all-distributed", 0L)
    run("pinned-buffered", Long.MaxValue)
    spark.stop()
  }
}
