package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Scale probe for d20's cost model: the directed containment join's
  * candidate volume is Σ_prefix-keys df·prefdf (the container side probes
  * FULL postings — a larger constant than d19's C(prefdf, 2)). For each
  * arg dir, replicates the operator's candidate stage (capacity +
  * positional filters included) at the catalog tau 0.8 over hashed
  * 3-gram shingles and reports docs, candidates, verified directed
  * pairs, and wall seconds — compare a base dir against its ScaleGen 10x
  * to read the exponent (PLANS r6 method, d19's PrefixProbe sibling). */
object ContainProbe {

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

    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("__toks", graft.functions.MinhashBands.shingleHashes(
          split(col("text"), " "), 3))
        .select(col("doc_id"), col("__toks"))
      val nDocs = docs.count()

      // candidate stage replicated from the operator (capacity +
      // positional prunes) so the pre-verify volume is observable
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(col("__toks"))).as("__tok"))
      val freq = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
      val sorted = toks.join(freq, "__tok")
        .groupBy("doc_id")
        .agg(expr("transform(array_sort(collect_list(struct(__df, __tok))), x -> x.__tok)")
            .as("__rks"),
          count(lit(1)).as("__n"))
      val pref = sorted.select(Seq(col("doc_id"), col("__n")) :+
        posexplode(expr(
          "slice(__rks, 1, cast(__n - ((800000 * __n + 999999) div 1000000) + 1 as int))"))
          .as(Seq("__p", "__k")): _*)
      val fullPost = sorted.select(Seq(col("doc_id"), col("__n")) :+
        posexplode(col("__rks")).as(Seq("__p", "__k")): _*)
      val nCand = pref.select(col("doc_id").as("id1"), col("__n").as("n1"),
          col("__p").as("__p1"), col("__k"))
        .join(fullPost.select(col("doc_id").as("id2"), col("__n").as("n2"),
          col("__p").as("__p2"), col("__k")), Seq("__k"))
        .filter(col("id1") =!= col("id2"))
        .filter(col("n2") * lit(1000000L) >= lit(800000L) * col("n1"))
        .filter(least(col("n1") - col("__p1"), col("n2") - col("__p2")) *
          lit(1000000L) >= lit(800000L) * col("n1"))
        .select("id1", "id2").dropDuplicates("id1", "id2").count()

      var nPairs = 0L
      val secs = timed {
        nPairs = Dedup.containmentSelfJoin(docs, "doc_id", "__toks", 800000L)
          .count()
      }
      println(f"""{"dir": "$dir", "docs": $nDocs, "candidates": $nCand, "pairs": $nPairs, "secs": $secs%.1f}""")
    }
    spark.stop()
  }
}
