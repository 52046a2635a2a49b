package graft.operators

import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** Iterative operators checkpoint every round; these tests pin the storage
  * contract: superseded rounds' blocks are actually freed (the LogicalRDD
  * match in Bridge.freeCheckpoint fires — a silent non-match would quietly
  * reintroduce unbounded growth on deep fixpoints).
  */
class CheckpointHygieneSpec extends SparkSpec {
  import spark.implicits._

  /** Ids of currently-resident persisted RDDs. Assertions compare the set
    * of NEW ids (after -- before), never global counts: the shared
    * session's ContextCleaner may concurrently unpersist blocks leaked by
    * an earlier suite, which shrinks a global count mid-test but can never
    * add ids to the new-ids delta. */
  private def residentIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.collect {
      case (id, r) if r.getStorageLevel.isValid => id
    }.toSet

  private def persistedCount(): Int = residentIds().size

  test("freeCheckpoint releases a localCheckpoint's blocks") {
    // new-ids delta, not global counts (see scaladoc above): a global
    // count races the ContextCleaner collecting an earlier suite's leak
    val before = residentIds()
    val df = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(df)
    assert((residentIds() -- before).isEmpty)
  }

  test("freeCheckpoint is a no-op on a non-checkpointed frame") {
    val before = persistedCount()
    Bridge.freeCheckpoint(Seq(1).toDF("x"))
    assert(persistedCount() === before)
  }

  test("transitiveClosure leaves only its result resident") {
    val before = residentIds()
    // depth-9 chain: 4 doubling rounds + 1 convergence round
    val edges = (0 until 9).map(i => (s"n$i", s"n${i + 1}")).toDF("child", "parent")
    val closure = Hierarchy.transitiveClosure(edges, "child", "parent")
    assert(closure.count() === (9 * 10) / 2)
    // resident: exactly the returned (checkpointed) closure
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(closure)
    assert((residentIds() -- before).isEmpty)
  }

  test("connectedComponents leaves only its labels resident") {
    val before = residentIds()
    // chain of 6 → one component, a few propagation rounds
    val pairs = (0 until 5).map(i => (s"d$i", s"d${i + 1}")).toDF("a", "b")
    val labels = Dedup.connectedComponents(pairs, "a", "b")
    assert(labels.filter("component = 'd0'").count() === 6)
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(labels)
    assert((residentIds() -- before).isEmpty)
  }

  test("closestExportedParents keeps resident storage bounded") {
    val before = residentIds()
    // 5-level chain, only the top exported → 4 climb rounds
    val edges = (0 until 5).map(i => (s"L$i", s"L${i + 1}")).toDF("child", "parent")
    val exported = Seq("L5").toDF("id")
    val parents = Hierarchy.closestExportedParents(edges, "child", "parent", exported, "id")
    assert(parents.count() === 5) // every level resolves to L5
    // resident: only the final result checkpoint (distinct() is derived
    // from it, and freeCheckpoint traverses the plan to that leaf)
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(parents)
    assert((residentIds() -- before).isEmpty)
  }

  // ——— composition: an iterative operator must NEVER free its caller's
  // blocks (the r10 regression: kmeansLloyd's hygiene free plan-walked
  // round-0 centroids, reached a checkpointed INPUT, and freed it —
  // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on every later read; VERDICT r10 #1)

  private def hashVec(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = ((seed * 1315423911L + d * 2654435761L) & 0xffffL).toDouble
      h / 65536.0
    }

  test("kmeansLloyd over a checkpointed input leaves the input readable") {
    val vecs = (0 until 40).map(i => (i.toLong, hashVec(i, 8)))
      .toDF("id", "v").localCheckpoint(true)
    val before = residentIds()
    assert(before.nonEmpty) // the input checkpoint itself is resident
    val cents = Similarity.kmeansLloyd(vecs, "id", "v", 4, 3)
    assert(cents.count() === 4)
    // the INPUT's blocks must have survived every loop-round hygiene free
    assert(vecs.count() === 40)
    // resident delta: exactly the final-round centroid checkpoint
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(cents)
    assert(vecs.count() === 40)
  }

  test("nested Lloyd (assignClustersApprox) reads outer checkpointed centroids") {
    val vecs = (0 until 60).map(i => (i.toLong, hashVec(i * 7 + 1, 8)))
      .toDF("id", "v")
    // outer Lloyd result checkpointed — exactly the semDedupRemovedScaled
    // composition: the inner supercell Lloyd runs OVER these blocks
    val cents = Similarity.kmeansLloyd(vecs, "id", "v", 8, 2).localCheckpoint(true)
    val nCents = cents.count() // ≤ 8: Lloyd drops emptied clusters
    assert(nCents >= 2)
    val assigned = Similarity.assignClustersApprox(vecs, cents, "id", "v", 3)
    assert(assigned.count() > 0)
    // centroids still readable after the inner Lloyd's hygiene frees
    assert(cents.count() === nCents)
  }

  test("pqCodebook over a checkpointed corpus leaves the corpus readable") {
    val vecs = (0 until 40).map(i => (i.toLong, hashVec(i * 13 + 5, 8)))
      .toDF("id", "v").localCheckpoint(true)
    val cb = Similarity.pqCodebook(vecs, "id", "v", dim = 8, nSub = 2,
      kCodes = 4, iters = 2)
    assert(cb.count() === 8) // nSub * kCodes
    assert(vecs.count() === 40) // corpus blocks survived the per-block frees
    Bridge.freeCheckpoint(cb)
    assert(vecs.count() === 40)
  }

  test("kcorePeel leaves only the final degree frame resident") {
    val before = residentIds()
    // dense-ish G(16, p) with a pendant path so ≥ 2 removal waves fire
    val edges = ((for {
      a <- 0L until 16L; b <- 0L until 16L if a < b
      if DetHash.md5Long(s"khyg:$a:$b") % 3 == 0
    } yield (a, b)) ++ Seq((0L, 100L), (100L, 101L))).toDF("a", "b")
    val core = Graph.kcorePeel(edges, "a", "b", 3, 10)
    assert(core.count() > 0L)
    // the node-partitioned incidence frame and every superseded round's
    // degree table are freed; only the final degree checkpoint remains
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(core)
    assert((residentIds() -- before).isEmpty)
  }

  test("hits leaves only the final output frame resident") {
    val before = residentIds()
    val docs = Seq("a b c a b", "b c d", "d a", "c c b a").toDF("text")
    val out = Graph.hits(Graph.adjacencyEdges(docs, "text"), iters = 3)
    assert(out.count() > 0L)
    // edges/nodes/per-round raw materializations freed; ONE output frame
    // (the materialized all-nodes join) remains
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(out)
    assert((residentIds() -- before).isEmpty)
  }

  test("multiSourceSssp leaves only the final distance frame resident") {
    val before = residentIds()
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 4L, 10L), (1L, 4L, 50L))
      .toDF("a", "b", "w")
    val dist = Graph.multiSourceSssp(edges, "a", "b", "w",
      Seq(1L).toDF("node"), rounds = 3)
    assert(dist.count() === 4L)
    assert((residentIds() -- before).size === 1)
    Bridge.freeCheckpoint(dist)
    assert((residentIds() -- before).isEmpty)
  }

  test("semDedupRemovedScaled end-to-end (the r10 broken composition)") {
    // near-duplicate pairs: 2i and 2i+1 share a base vector
    val vecs = (0 until 30).flatMap { i =>
      val base = hashVec(i * 31 + 2, 8)
      Seq((2L * i, base), (2L * i + 1, base.map(_ * 1.000001)))
    }.toDF("id", "v")
    val removed = Similarity.semDedupRemovedScaledPinned(
      vecs, "id", "v", threshold = 0.999, k = 6, nSuper = 2, iters = 2)
    // every pair collapses: the odd twin is removed (min-id retention)
    assert(removed.count() > 0)
  }
}
