package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness for the SemDeDup assignment claim (PLANS.md round
  * 10): with corpus-derived k (= n/512), FLAT nearest-centroid assignment
  * is O(n·k·d) = quadratic in the corpus, while the two-level supercell
  * path ([[Similarity.assignClustersApprox]], nSuper = √k) is O(n·√k·d).
  * Times both over the same deterministic synthetic corpus/centroids at
  * growing n, and reports how often the two paths pick the same centroid
  * (the approximation's price, measured).
  *
  * Usage: runMain graft.tools.SemProbe <n> [<n> ...]
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hashVecs(n: Long, salt: Int, idName: String, vecName: String): DataFrame =
      spark.range(n).select(col("id").as(idName),
        expr(s"""transform(sequence(0, 63),
                  j -> (pmod(hash(id * 64 + j + $salt), 1000) / 1000.0d) - 0.5d)""")
          .as(vecName))

    for (n <- args.map(_.toLong)) {
      val k = Similarity.semDedupKFor(n)
      val nSuper = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
      val vecs = hashVecs(n, 0, "vid", "v").localCheckpoint(true)
      val cents = hashVecs(k.toLong, 7919, "cid", "c")
        .withColumn("cid", col("cid").cast("int")).localCheckpoint(true)

      def timeIt(mk: () => DataFrame): (Double, DataFrame) = {
        System.gc()
        val t0 = System.nanoTime()
        val df = mk().localCheckpoint(true)
        ((System.nanoTime() - t0) / 1e9, df)
      }
      val (flatSecs, flat) = timeIt(() =>
        Similarity.assignClusters(vecs, cents, "vid", "v"))
      val (twoSecs, two) = timeIt(() =>
        Similarity.assignClustersApprox(vecs, cents, "vid", "v", nSuper))
      val agree = flat.withColumnRenamed("cid", "fc")
        .join(two.withColumnRenamed("cid", "tc"), Seq("vid"))
        .agg(avg(when(col("fc") === col("tc"), 1.0).otherwise(0.0)).as("a"))
        .head().getDouble(0)
      println(f"""{"n": $n, "k": $k, "n_super": $nSuper, "flat_secs": $flatSecs%.2f, "two_secs": $twoSecs%.2f, "agree_pct": ${agree * 100}%.1f}""")
      Seq(vecs, cents, flat, two).foreach(_.unpersist())
      System.gc()
    }
    spark.stop()
  }
}
