package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** `incrementalConnectedComponents` must be row-identical to a batch
  * `connectedComponents` run over old ∪ new pairs — the contraction
  * argument (labels are min member ids, so one member→label super-edge per
  * seed reproduces component connectivity) made executable. */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Long]("component"))).toSet

  test("incremental fold-in == batch CC over the union graph") {
    // old graph: two chains, two stars, one isolated pair
    val oldPairs = Seq((10L, 12L), (12L, 14L), (20L, 22L), (30L, 31L),
      (40L, 41L), (5L, 6L)).toDF("id1", "id2")
    // new pairs exercise every interesting case:
    //  (14,22)  merges the 10- and 20-components (both touched, min wins)
    //  (99,31)  brand-new vertex joins an old component, larger id
    //  (1,41)   brand-new vertex joins an old component, SMALLER than its
    //           old min — the whole component must relabel to 1
    //  (10,14)  intra-component no-op pair
    //  (100,101) pure-new component never seen before
    val newPairs = Seq((14L, 22L), (99L, 31L), (1L, 41L), (10L, 14L),
      (100L, 101L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(oldPairs, "id1", "id2")
    val inc = Dedup.incrementalConnectedComponents(labels, newPairs, "id1", "id2")
    val batch = Dedup.connectedComponents(
      oldPairs.unionByName(newPairs), "id1", "id2")
    assert(labelsOf(inc) === labelsOf(batch))
    // spot checks: merge landed on the global min, untouched passed through
    val byId = labelsOf(inc).toMap
    assert(byId(22L) == 10L)   // merged 20-star into the 10-chain
    assert(byId(40L) == 1L)    // relabeled below its old min
    assert(byId(99L) == 30L)   // new vertex took the old component label
    assert(byId(100L) == 100L) // pure-new pair forms its own component
    assert(byId(5L) == 5L && byId(6L) == 5L) // untouched component intact
  }

  test("non-convergence fails loudly instead of returning partial labels") {
    // a 30-edge path needs ~30 propagation rounds — at maxRounds=3 the
    // run must throw, never hand back non-min labels that would poison
    // every incremental/streaming consumer downstream
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("id1", "id2")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "id1", "id2", maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    val ok = Dedup.connectedComponents(chain, "id1", "id2", maxRounds = 40)
    assert(ok.select("component").distinct().count() == 1)
  }

  test("chained incremental batches stay identical to one batch run") {
    val oldPairs = Seq((10L, 11L), (20L, 21L), (30L, 31L)).toDF("id1", "id2")
    val b1 = Seq((11L, 21L)).toDF("id1", "id2")          // merge 10+20
    val b2 = Seq((21L, 31L), (7L, 30L)).toDF("id1", "id2") // merge all + low id
    val l0 = Dedup.connectedComponents(oldPairs, "id1", "id2")
    val l1 = Dedup.incrementalConnectedComponents(l0, b1, "id1", "id2")
    val l2 = Dedup.incrementalConnectedComponents(l1, b2, "id1", "id2")
    val batch = Dedup.connectedComponents(
      oldPairs.unionByName(b1).unionByName(b2), "id1", "id2")
    assert(labelsOf(l2) === labelsOf(batch))
    assert(labelsOf(l2).toMap.apply(10L) == 7L)
  }
}
