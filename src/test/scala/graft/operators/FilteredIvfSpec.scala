package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Similarity.ivfTopKFiltered on planted geometry: the globally
  * nearest neighbor with the WRONG attribute never appears, the best
  * same-attribute neighbor ranks first, and with nProbe = all cells the
  * filtered search is exhaustive within each attribute slice. */
class FilteredIvfSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated cells on the x/y axes
  private val centroids = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0))).toDF("cent_id", "centvec")

  test("wrong-attribute nearest neighbor is excluded; same-slice best wins") {
    val corpus = Seq(
      (10L, Seq(0.99, 0.01, 0.0), "en"),  // nearest to q overall — wrong lang
      (11L, Seq(0.90, 0.10, 0.0), "fr"),  // best same-lang
      (12L, Seq(0.80, 0.20, 0.0), "fr"),
      (20L, Seq(0.0, 1.0, 0.0), "fr"))    // other cell
      .toDF("cid", "cvec", "label")
    val q = Seq((1L, Seq(1.0, 0.0, 0.0), "fr")).toDF("qid", "qvec", "label")
    val out = Similarity.ivfTopKFiltered(q, corpus, centroids, "label",
        k = 3, nProbe = 1)
      .orderBy("rank").collect()
    assert(!out.map(_.getAs[Long]("cid")).contains(10L))
    assert(out.head.getAs[Long]("cid") === 11L)
    assert(out.map(_.getAs[Long]("cid")).toSeq === Seq(11L, 12L))
  }

  test("nProbe = all cells ⇒ exhaustive within each slice") {
    val corpus = Seq(
      (10L, Seq(0.9, 0.1, 0.0), "a"), (11L, Seq(0.1, 0.9, 0.0), "a"),
      (12L, Seq(0.7, 0.3, 0.0), "b"), (13L, Seq(0.3, 0.7, 0.0), "a"))
      .toDF("cid", "cvec", "label")
    val q = Seq((1L, Seq(0.6, 0.4, 0.0), "a")).toDF("qid", "qvec", "label")
    val got = Similarity.ivfTopKFiltered(q, corpus, centroids, "label",
        k = 10, nProbe = 2)
      .select("cid").collect().map(_.getLong(0)).toSet
    // every same-label vector scored, the "b" one never did
    assert(got === Set(10L, 11L, 13L))
  }
}
