package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Hierarchy

/** Scale probe for the geozones closure (h1/h2): in a hierarchy, DEPTH —
  * not row count — drives the round count (path doubling closes depth d
  * in ceil(log2 d) + 1 self-joins), while the OUTPUT closure size n·≈d/2
  * drives per-round cost. The catalog gate exercises the reference's
  * 2-level geography only; this probe grows depth at fixed node count and
  * checks that wall time tracks the closure SIZE (the unavoidable output),
  * not d rounds of full-relation work (which would be d·n·d).
  *
  * Synthetic forest: n nodes in chains of length d (node i's parent is
  * i−1 unless i starts a chain). Closure pairs = n·(d−1)/2 exactly.
  *
  * Usage: runMain graft.tools.HierProbe <n> <depth> [<depth> ...]
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.head.toLong
    for (d <- args.tail.map(_.toLong)) {
      val edges = spark.range(n).filter(col("id") % d =!= 0)
        .select(col("id").as("child"), (col("id") - 1).as("parent"))
        .localCheckpoint(true)
      def timed(): (Long, Double) = {
        System.gc()
        val t0 = System.nanoTime()
        val c = Hierarchy.transitiveClosure(edges, "child", "parent",
          maxRounds = 40)
        val pairs = c.count()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.Bridge.freeCheckpoint(c)
        (pairs, secs)
      }
      timed() // warm
      val (pairs, secs) = timed()
      val rounds = (math.log(d.toDouble) / math.log(2.0)).ceil.toInt + 1
      println(f"""{"n": $n, "depth": $d, "pairs": $pairs, "rounds_expected": $rounds, "secs": $secs%.2f}""")
    }
    spark.stop()
  }
}
