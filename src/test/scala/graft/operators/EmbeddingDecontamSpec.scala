package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Similarity.embeddingDecontaminate on planted geometry: exact
  * copies flag, orthogonal vectors don't, the fixed-point threshold is a
  * clean integer compare, and n_contacts counts every benchmark hit. */
class EmbeddingDecontamSpec extends SparkSpec {

  test("copies contaminate, orthogonal vectors do not") {
    import spark.implicits._
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0)),
      (200L, Seq(0.0, 1.0, 0.0))).toDF("bid", "bvec")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // copy of bench 100
      (2L, Seq(0.0, 0.0, 1.0)),   // orthogonal to both
      (3L, Seq(2.0, 0.0, 0.0)),   // scaled copy — cosine 1.0
      (4L, Seq(1.0, 1.0, 0.0))).toDF("cid", "cvec") // 0.707 to both
    val out = Similarity.embeddingDecontaminate(corpus, bench, tauFp = 999000L)
      .orderBy("cid").collect()
    assert(out.map(_.getAs[Boolean]("contaminated")).toSeq ===
      Seq(true, false, true, false))
    assert(out(0).getAs[Long]("max_sim_fp") >= 999000L)
    assert(out(0).getAs[Long]("n_contacts") === 1L)
    assert(out(1).getAs[Long]("n_contacts") === 0L)
    // 0.707... cosine lands at 707106 fixed-point — well under tau
    assert(out(3).getAs[Long]("max_sim_fp") === 707106L)
  }

  test("one row per corpus vector even with zero contacts") {
    import spark.implicits._
    val bench = Seq((1L, Seq(1.0, 0.0))).toDF("bid", "bvec")
    val corpus = Seq((10L, Seq(0.0, 1.0)), (11L, Seq(0.0, -1.0)))
      .toDF("cid", "cvec")
    assert(Similarity.embeddingDecontaminate(corpus, bench, 999000L).count() === 2L)
  }
}
