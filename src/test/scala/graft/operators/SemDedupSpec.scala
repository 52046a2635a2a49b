package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Similarity.semDedupRemoved (cluster-scoped semantic dedup): planted
  * near-identical groups collapse to their min id, distant vectors survive,
  * and the corpus-derived k keeps target cluster size fixed. Rows are read
  * by FIELD NAME. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two tight bundles far apart on orthogonal axes + one lone outlier.
  // Base directions e1/e2 in 4 dims; members get a tiny distinct nudge so
  // ids differ but cosine stays ~1 within a bundle, ~0 across.
  private def planted() = Seq(
    (1L, Seq(1.00, 0.01, 0.0, 0.0)),
    (2L, Seq(1.00, 0.02, 0.0, 0.0)),
    (3L, Seq(1.00, 0.00, 0.03, 0.0)),
    (10L, Seq(0.0, 0.01, 1.00, 0.0)),
    (11L, Seq(0.0, 0.02, 1.00, 0.0)),
    (20L, Seq(0.0, 0.0, 0.0, 1.00))
  ).toDF("vid", "v")

  test("tight bundles collapse to min id; outlier survives") {
    val removed = Similarity
      .semDedupRemovedPinned(planted(), "vid", "v", threshold = 0.99,
        k = 3, iters = 2)
      .orderBy("removed_id").collect()
    val ids = removed.map(_.getAs[Long]("removed_id")).toSeq
    assert(ids === Seq(2L, 3L, 11L))
    val byId = removed.map(r => r.getAs[Long]("removed_id") -> r).toMap
    assert(byId(2L).getAs[Long]("dup_of") === 1L)
    assert(byId(3L).getAs[Long]("dup_of") === 1L)
    assert(byId(11L).getAs[Long]("dup_of") === 10L)
    assert(byId(2L).getAs[Double]("max_sim") > 0.999)
  }

  test("threshold gates removal: nothing at tau above any pair sim") {
    val removed = Similarity.semDedupRemovedPinned(planted(), "vid", "v",
      threshold = 0.999999, k = 3, iters = 2)
    assert(removed.count() === 0L)
  }

  test("default entry sizes k from the corpus (fixed target cluster size)") {
    assert(Similarity.semDedupKFor(100, targetClusterSize = 512) === 2)
    assert(Similarity.semDedupKFor(10_000, targetClusterSize = 512) === 20)
    assert(Similarity.semDedupKFor(10_000_000, targetClusterSize = 512) === 19532)
    // 100x the corpus -> ~100x the clusters, cluster size unchanged
    val k1 = Similarity.semDedupKFor(1_000_000)
    val k2 = Similarity.semDedupKFor(100_000_000)
    assert(k2.toDouble / k1 > 99 && k2.toDouble / k1 < 101)
  }

  test("default and pinned agree when pinned uses the derived k") {
    val df = planted()
    val k = Similarity.semDedupKFor(df.count(), targetClusterSize = 2)
    val a = Similarity.semDedupRemoved(df, "vid", "v", threshold = 0.99)
      .collect().map(_.getAs[Long]("removed_id")).toSet
    val b = Similarity
      .semDedupRemovedPinned(df, "vid", "v", threshold = 0.99,
        Similarity.semDedupKFor(df.count()), iters = 2)
      .collect().map(_.getAs[Long]("removed_id")).toSet
    assert(a === b)
    assert(k === 3)
  }
}
