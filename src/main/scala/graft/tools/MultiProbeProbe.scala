package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness for the multi-probe LSH claim (s11): recall can be
  * bought with QUERY-side probes instead of corpus-sized index tables.
  * For each corpus size, compare single-probe at T tables against
  * multi-probe (1 + nPlanes probes) at T/2 and T/4 tables: recall@1 vs
  * brute force over 50 queries, the candidate-pair volume each
  * configuration pushes into the scoring join (the real cost), and the
  * index row count (the artifact cost — what a 100 TB deployment stores
  * and stream-maintains). Plane count sized from the corpus
  * ([[Similarity.lshPlanesFor]]), the scale-safe default.
  *
  * Usage: runMain graft.tools.MultiProbeProbe <n> [<n> ...]
  */
object MultiProbeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64

    for (n <- args.map(_.toLong)) {
      val nPlanes = Similarity.lshPlanesFor(n)
      val e = spark.range(n).select(col("id").as("cid"),
        expr("""transform(sequence(0, 63),
                 j -> (pmod(hash(id * 64 + j), 1000) / 1000.0d) - 0.5d)""").as("cvec"))
        .localCheckpoint(true)
      // plant a near-copy for every query so recall has a real target
      val queries = e.filter(col("cid") < 50)
        .select((col("cid") + n).as("qid"),
          expr("transform(cvec, x -> x + 0.02d)").as("qvec"))
        .localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(queries, e, 1)
        .select(col("qid"), col("cid").as("want")).localCheckpoint(true)

      def recallAndTime(mk: () => DataFrame): (Long, Double) = {
        mk().count() // warm
        val t0 = System.nanoTime()
        val hits = truth.join(mk(), Seq("qid"))
          .filter(col("cid") === col("want")).count()
        (hits, (System.nanoTime() - t0) / 1e9)
      }

      def candCount(nTables: Int, multi: Boolean): Long = {
        def buckets(df: DataFrame, idc: String, vc: String) = df
          .withColumn("__bs", Similarity.lshBucketsExpr(vc, nPlanes, dim, nTables))
          .select(col(idc), posexplode(col("__bs")).as(Seq("tbl", "bucket")))
        val cb = buckets(e, "cid", "cvec")
        val qb0 = buckets(queries, "qid", "qvec")
        val qb = if (!multi) qb0 else qb0
          .select(col("qid"), col("tbl"), explode(array(
            col("bucket") +: (0 until nPlanes).map(p =>
              col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
        cb.join(broadcast(qb), Seq("tbl", "bucket"))
          .select("qid", "cid").distinct().count()
      }

      println(s"n=$n planes=$nPlanes (occupancy target 64)")
      for (t <- Seq(8, 4, 2)) {
        val (hits, secs) = recallAndTime(() =>
          Similarity.lshTopKPinned(queries, e, 1, nPlanes, dim, t))
        println(f"  single T=$t%d: recall@1 $hits%d/50  cand ${candCount(t, multi = false)}%d  " +
          f"index rows ${n * t}%d  ${secs}%.2f s")
      }
      for (t <- Seq(4, 2, 1)) {
        val (hits, secs) = recallAndTime(() =>
          Similarity.multiProbeTopKPinned(queries, e, 1, nPlanes, dim, t))
        println(f"  multi  T=$t%d: recall@1 $hits%d/50  cand ${candCount(t, multi = true)}%d  " +
          f"index rows ${n * t}%d  ${secs}%.2f s")
      }
    }
    spark.stop()
  }
}
