package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantizedVec

/** Measurement harness for the SQ8 bandwidth claim (PLANS.md round 10):
  * materialize the SAME synthetic corpus twice — float64 arrays vs int8
  * binary — and time the brute-force top-k scoring scan over each
  * representation at growing corpus sizes. The hypothesis under test: once
  * the corpus outgrows cache the ANN scan is bandwidth-bound, so the
  * 8×-smaller quantized payload (plus the integer kernel) sets the
  * throughput. Corpus vectors are a pure hash function of (id, dim) —
  * deterministic, re-runnable, in the embeddings value envelope (±0.5).
  *
  * Usage: runMain graft.tools.Int8Probe <n> [<n> ...]
  */
object Int8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- args.map(_.toLong)) {
      val e = spark.range(n).select(col("id").as("cid"),
        expr("""transform(sequence(0, 63),
                 j -> (pmod(hash(id * 64 + j), 1000) / 1000.0d) - 0.5d)""").as("cvec"))
      val scratch = s"/tmp/graft-int8probe-${ProcessHandle.current().pid()}"
      val f64Path = s"$scratch/f64.parquet"
      val q8Path = s"$scratch/q8.parquet"
      e.write.mode("overwrite").parquet(f64Path)
      e.select(col("cid"),
          QuantizedVec.quantizeInt8(col("cvec"), 128.0).as("cq"))
        .write.mode("overwrite").parquet(q8Path)
      val queries = e.filter(col("cid") < 20)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
        .localCheckpoint(true)
      val q8 = queries.select(col("qid"),
        QuantizedVec.quantizeInt8(col("qvec"), 128.0).as("__qq"))
        .localCheckpoint(true)

      def timeIt(mk: () => DataFrame): Double = {
        mk().count() // warm: JIT + page cache
        (1 to 2).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          mk().count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }

      import org.apache.spark.sql.expressions.Window
      import graft.functions.DotProduct.cosine
      val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
      val floatSecs = timeIt(() => {
        spark.read.parquet(f64Path).crossJoin(broadcast(queries))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore", cosine(col("qvec"), col("cvec")))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      })
      val int8Secs = timeIt(() => {
        spark.read.parquet(q8Path).crossJoin(broadcast(q8))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore",
            QuantizedVec.quantizedDot(col("__qq"), col("cq")))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      })
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
      }
      println(f"""{"n": $n, "float_secs": $floatSecs%.2f, "int8_secs": $int8Secs%.2f, "float_bytes": ${dirBytes(f64Path)}, "int8_bytes": ${dirBytes(q8Path)}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      System.gc()
    }
    spark.stop()
  }
}
