package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct.{cosine, dot}

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

  /** Exact top-k cosine neighbors for each query vector. Scoring uses the
    * native codegen'd [[graft.functions.DotProduct]] (left-fold accumulation
    * matching DuckDB's list_sum order — bit-identical across engines).
    * @param queries (qid, qvec: array<double>) — small, broadcast
    * @param corpus  (cid, cvec: array<double>) — streamed once */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 5).as("sim"))
  }

  /** Deterministic random-hyperplane bucket id (nPlanes sign bits) for one
    * LSH table. The planes are driver-derived md5 literals (DetHash.planes),
    * inlined into the expression — per-row cost is nPlanes dot products, no
    * hashing. `table` offsets into the global plane family so each table
    * gets independent planes. */
  def lshBucketExpr(vecCol: String, nPlanes: Int, dim: Int,
                    table: Int = 0): org.apache.spark.sql.Column = {
    val all = DetHash.planes((table + 1) * nPlanes, dim)
    // Literal plane arrays + the native DotProduct expression per plane:
    // identical FP result to an ascending-index fold, tight codegen'd loop.
    all.slice(table * nPlanes, (table + 1) * nPlanes).zipWithIndex.map {
      case (plane, p) =>
        when(dot(col(vecCol), typedLit(plane)) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** All nTables bucket ids as one array column (one pass over the vector). */
  def lshBucketsExpr(vecCol: String, nPlanes: Int, dim: Int,
                     nTables: Int): org.apache.spark.sql.Column =
    array((0 until nTables).map(t => lshBucketExpr(vecCol, nPlanes, dim, t)): _*)

  /** Multi-table LSH approximate top-k (OR-amplification): a candidate is
    * any corpus vector sharing the query's bucket in AT LEAST ONE of the
    * nTables hash tables — recall 1-(1-p^nPlanes)^nTables for per-plane
    * agreement p. The shuffle key is (table, bucket); per-pair dedup happens
    * before scoring so each candidate is scored once. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
              dim: Int, nTables: Int = 8): DataFrame = {
    def explodeTables(df: DataFrame, vecCol: String) =
      df.withColumn("__bs", lshBucketsExpr(vecCol, nPlanes, dim, nTables))
        .select(df.columns.map(col) :+
          posexplode(col("__bs")).as(Seq("tbl", "bucket")): _*)
    val qb = explodeTables(queries, "qvec")
    val cb = explodeTables(corpus, "cvec")
    val cand = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qvec", "cid", "cvec").dropDuplicates("qid", "cid")
    val scored = cand.withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 5).as("sim"))
  }
}
