package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Scale probe for d19's claim: prefix-filtered exact Jaccard join stays
  * near-linear on a corpus whose duplicate DENSITY is constant (the
  * ScaleGen model — PLANS r6 method). For each arg dir, runs
  * [[Dedup.prefixJaccardSelfJoin]] over HASHED 3-gram shingles (tau 0.5
  * — the catalog d19 configuration) and reports docs, CANDIDATE pairs
  * (the prefix equi-join's output after the size + positional filters,
  * before verification — the quantity that would go quadratic if the key
  * space stopped growing with the corpus), verified pairs, and wall
  * seconds. Compare a base SF dir against its ScaleGen 10x to read the
  * exponent. */
object PrefixProbe {

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

      // candidate stage replicated from the operator (same exprs incl.
      // the size + positional filters) so the pre-verify volume is
      // observable
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
          "slice(__rks, 1, cast(__n - ((500000 * __n + 999999) div 1000000) + 1 as int))"))
          .as(Seq("__p", "__k")): _*)
      val nCand = pref.select(col("doc_id").as("id1"), col("__n").as("n1"),
          col("__p").as("__p1"), col("__k"))
        .join(pref.select(col("doc_id").as("id2"), col("__n").as("n2"),
          col("__p").as("__p2"), col("__k")), Seq("__k"))
        .filter(col("id1") < col("id2"))
        .filter(least(col("n1"), col("n2")) * lit(1000000L) >=
          lit(500000L) * greatest(col("n1"), col("n2")))
        .filter(least(col("n1") - col("__p1"), col("n2") - col("__p2")) *
          lit(1500000L) >= lit(500000L) * (col("n1") + col("n2")))
        .select("id1", "id2").dropDuplicates("id1", "id2")
        .count()

      var nPairs = 0L
      val secs = timed {
        nPairs = Dedup.prefixJaccardSelfJoin(docs, "doc_id", "__toks", 500000L)
          .count()
      }
      println(f"PREFIX dir=$dir docs=$nDocs candidates=$nCand pairs=$nPairs secs=$secs%.2f")
    }
    spark.stop()
  }
}
