package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Measurement harness for the dyadic range-sum register — the claim
  * under test: once the register is built (one pass, one aggregation),
  * answering a range count costs a filter over ≤ 2·16 cells of a
  * domain-bounded table instead of a full rescan of the raw rows, so a
  * query workload of K range counts flips from K·scan to build + K·cell
  * lookups. Args are row counts; values are synthesized 16-bit
  * (md5-derived, uniform over [0, 60000)) over 8 groups — no testdata
  * dependency. The probe persists the register (parquet, as a deployment
  * would), then times 8 range queries from the register vs 8 direct
  * filtered scans, and checks the counts agree exactly. */
object DyadicProbe {

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
    val ranges = Seq((0L, 999L), (1000L, 9999L), (12800L, 31999L),
      (30000L, 30000L), (45000L, 59999L), (1L, 59998L), (100L, 163L),
      (52000L, 52999L))

    for (a <- args) {
      val n = a.toLong
      val root = java.nio.file.Files.createTempDirectory("graft-dyprobe").toString
      def base = spark.range(n)
        .select(expr("CAST(id % 8 AS STRING)").as("g"),
          expr(s"${graft.operators.TextOps.md5LongSql("CAST(id AS STRING)")}" +
            " % 60000").as("v"))
      base.write.parquet(s"$root/raw")
      val raw = spark.read.parquet(s"$root/raw")
      val tBuild = timed {
        Sketches.dyadicRegister(raw, Seq("g"), "v")
          .write.parquet(s"$root/reg")
      }
      val reg = spark.read.parquet(s"$root/reg")
      var regSum = 0L; var scanSum = 0L
      val tReg = timed {
        regSum = ranges.map { case (lo, hi) =>
          Sketches.dyadicRangeCount(reg, Seq("g"), lo, hi)
            .agg(sum("range_cnt")).head().getLong(0)
        }.sum
      }
      val tScan = timed {
        scanSum = ranges.map { case (lo, hi) =>
          raw.filter(col("v").between(lo, hi)).count()
        }.sum
      }
      val cells = reg.count()
      require(regSum == scanSum, s"mismatch: $regSum != $scanSum")
      println(f"PROBE n=$n build=$tBuild%.2f reg8=$tReg%.2f scan8=$tScan%.2f " +
        s"cells=$cells agree=$regSum")
      graft.sources.Writers.deleteTreeOnExit(root)
      System.gc()
    }
    spark.stop()
  }
}
