package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set and stream
  *    the corpus once — the exact baseline, linear in corpus size;
  *  - random-hyperplane LSH bucketing: the scale path — corpus shuffles
  *    once on a small integer bucket id; candidate generation is an
  *    equi-join on the bucket, never a cartesian product.
  *
  * Hyperplanes are derived deterministically from md5, so results are
  * reproducible and oracle-replayable.
  */
object Similarity {

  /** Cosine similarity between two double-array columns, as a SQL snippet.
    * Left-fold accumulation matches DuckDB's list_sum order, so values are
    * bit-identical across engines. */
  def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0.0d, (acc, v) -> acc + v)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qvec: array<double>) — small, broadcast
    * @param corpus  (cid, cvec: array<double>) — streamed once */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", expr(cosSql("qvec", "cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 5).as("sim"))
  }

  /** Deterministic random-hyperplane bucket id (nPlanes sign bits).
    * The planes are driver-derived md5 literals (DetHash.planes), inlined
    * into the expression — per-row cost is nPlanes dot products, no hashing. */
  def lshBucketExpr(vecCol: String, nPlanes: Int, dim: Int): org.apache.spark.sql.Column = {
    val bits = DetHash.planes(nPlanes, dim).zipWithIndex.map { case (plane, p) =>
      val dot = plane.zipWithIndex.collect {
        case (w, j) if w != 0.0 => s"element_at($vecCol, ${j + 1}) * ($w)"
      }.mkString(" + ")
      s"if(($dot) > 0.0d, ${1L << p}L, 0L)"
    }
    expr(bits.mkString("(", " + ", ")"))
  }

  /** LSH-bucketed approximate top-k: queries only compare against corpus
    * vectors in the same hyperplane bucket. Recall is tunable via nPlanes
    * (fewer planes = bigger buckets = higher recall, more work). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucketExpr("qvec", nPlanes, dim))
    val cb = corpus.withColumn("bucket", lshBucketExpr("cvec", nPlanes, dim))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", expr(cosSql("qvec", "cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 5).as("sim"))
  }
}
