package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantizedVec
import graft.operators.Similarity

/** Measurement harness for the SQ8 bandwidth claim (PLANS.md round 10):
  * materialize the SAME corpus twice — float64 arrays vs int8 binary — and
  * time the brute-force top-k scoring scan over each representation at
  * growing corpus sizes. The hypothesis under test: once the corpus
  * outgrows cache, the ANN scan is bandwidth-bound, so the 8×-smaller
  * quantized payload (and the integer kernel) sets the throughput.
  *
  * Usage: runMain graft.tools.Int8Probe <sfDir> [<sfDir> ...]
  * (pass 1×/10×/30× dirs — ScaleGen outputs work unchanged).
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

    for (dir <- args) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      val scratch = s"/tmp/graft-int8probe-${ProcessHandle.current().pid()}"
      val f64Path = s"$scratch/f64.parquet"
      val q8Path = s"$scratch/q8.parquet"
      e.select(col("vec_id").as("cid"), col("v").as("cvec"))
        .write.mode("overwrite").parquet(f64Path)
      e.select(col("vec_id").as("cid"),
          QuantizedVec.quantizeInt8(col("v"), 256.0).as("cq"))
        .write.mode("overwrite").parquet(q8Path)
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qvec"))
        .localCheckpoint(true)
      val q8 = queries.select(col("qid"),
        QuantizedVec.quantizeInt8(col("qvec"), 256.0).as("__qq"))
        .localCheckpoint(true)
      val n = e.count()

      def timeIt(label: String, mk: () => DataFrame): Double = {
        // warm once (JIT + page cache), then best-of-2 timed
        mk().count()
        val secs = (1 to 2).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          mk().count()
          (System.nanoTime() - t0) / 1e9
        }.min
        secs
      }

      val floatSecs = timeIt("float64", () => {
        val c = spark.read.parquet(f64Path)
        Similarity.bruteForceTopK(queries, c, 3)
      })
      val int8Secs = timeIt("int8", () => {
        val c = spark.read.parquet(q8Path)
        val scored = c.crossJoin(broadcast(q8))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore",
            QuantizedVec.quantizedDot(col("__qq"), col("cq")))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
      })
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
      }
      println(f"""{"dir": "$dir", "n": $n, "float_secs": $floatSecs%.2f, "int8_secs": $int8Secs%.2f, "float_bytes": ${dirBytes(f64Path)}, "int8_bytes": ${dirBytes(q8Path)}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      System.gc()
    }
    spark.stop()
  }
}
