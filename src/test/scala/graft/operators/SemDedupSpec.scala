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
    assert(byId(2L).getAs[Long]("max_sim_fp") > 999000L)
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

  test("two-level assignment matches flat on well-separated geometry") {
    // bundles sit on orthogonal axes: the nearest supercell always
    // contains the true nearest centroid, so the approximate path must
    // reproduce the flat removals exactly here
    val flat = Similarity.semDedupRemovedPinned(planted(), "vid", "v",
      threshold = 0.99, k = 3, iters = 2)
      .collect().map(_.getAs[Long]("removed_id")).toSet
    val scaled = Similarity.semDedupRemovedScaledPinned(planted(), "vid", "v",
      threshold = 0.99, k = 3, nSuper = 2, iters = 2)
      .collect().map(_.getAs[Long]("removed_id")).toSet
    assert(scaled === flat)
    assert(flat === Set(2L, 3L, 11L))
  }

  test("two-level assignment covers every vector whose supercell is live") {
    val df = planted()
    val cents = Similarity.kmeansLloyd(
      df.select(col("vid").as("__vid"), col("v").as("__v")),
      "__vid", "__v", k = 3, iters = 2)
    val assigned = Similarity.assignClustersApprox(
      df.select(col("vid").as("__vid"), col("v").as("__v")),
      cents, "__vid", "__v", nSuper = 2)
    // every input id assigned exactly once, to a cluster that exists
    val rows = assigned.collect()
    assert(rows.map(_.getAs[Long]("__vid")).sorted.toSeq ===
      Seq(1L, 2L, 3L, 10L, 11L, 20L))
    val cids = cents.select("cid").collect().map(_.getAs[Int]("cid")).toSet
    rows.foreach(r => assert(cids.contains(r.getAs[Int]("cid"))))
  }

  test("incremental semdedup: cross + within legs, append-only retention") {
    val corpus = planted()
    val (cents, idx) = Similarity.semClusterIndex(corpus, "vid", "v",
      k = 3, iters = 2)
    // batch: a near-copy of corpus vec 1 (cross dup), an identical pair
    // (within dup), and a genuinely new direction (kept)
    val batch = Seq(
      (101L, Seq(1.00, 0.015, 0.0, 0.0)),   // ~ corpus 1 -> cross-removed
      (102L, Seq(0.0, 0.0, 0.5, 0.5)),      // new direction
      (103L, Seq(0.0, 0.0, 0.5, 0.5))       // identical to 102 -> within-removed
    ).toDF("vid", "v")
    val out = Similarity.incrementalSemDedup(batch, cents, idx, "vid", "v",
      threshold = 0.99).orderBy("removed_id").collect()
    val byId = out.map(r => r.getAs[Long]("removed_id") -> r).toMap
    // only BATCH ids can be removed, and 102 (first of the identical pair
    // by id) plus the novel direction survive
    assert(byId.keySet === Set(101L, 103L))
    assert(byId(101L).getAs[Long]("dup_of") === 1L)     // vs the corpus
    assert(byId(103L).getAs[Long]("dup_of") === 102L)   // within the batch
    // identical vectors: cosine evaluates to 1.0 − ulp (dot/(‖·‖‖·‖) in
    // doubles), so ⌊sim·10⁶⌋ is 999999 or 1000000 depending on dims
    assert(byId(103L).getAs[Long]("max_sim_fp") >= 999999L)
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
