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

  private def persistedCount(): Int =
    spark.sparkContext.getPersistentRDDs.count { case (_, r) =>
      r.getStorageLevel.isValid && r.getNumPartitions >= 0
    }

  test("freeCheckpoint releases a localCheckpoint's blocks") {
    val before = persistedCount()
    val df = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert(persistedCount() === before + 1)
    Bridge.freeCheckpoint(df)
    assert(persistedCount() === before)
  }

  test("freeCheckpoint is a no-op on a non-checkpointed frame") {
    val before = persistedCount()
    Bridge.freeCheckpoint(Seq(1).toDF("x"))
    assert(persistedCount() === before)
  }

  test("transitiveClosure leaves only its result resident") {
    val before = persistedCount()
    // depth-9 chain: 4 doubling rounds + 1 convergence round
    val edges = (0 until 9).map(i => (s"n$i", s"n${i + 1}")).toDF("child", "parent")
    val closure = Hierarchy.transitiveClosure(edges, "child", "parent")
    assert(closure.count() === (9 * 10) / 2)
    // resident: exactly the returned (checkpointed) closure
    assert(persistedCount() === before + 1)
    Bridge.freeCheckpoint(closure)
    assert(persistedCount() === before)
  }

  test("connectedComponents leaves only its labels resident") {
    val before = persistedCount()
    // chain of 6 → one component, a few propagation rounds
    val pairs = (0 until 5).map(i => (s"d$i", s"d${i + 1}")).toDF("a", "b")
    val labels = Dedup.connectedComponents(pairs, "a", "b")
    assert(labels.filter("component = 'd0'").count() === 6)
    assert(persistedCount() === before + 1)
    Bridge.freeCheckpoint(labels)
    assert(persistedCount() === before)
  }

  test("closestExportedParents keeps resident storage bounded") {
    val before = persistedCount()
    // 5-level chain, only the top exported → 4 climb rounds
    val edges = (0 until 5).map(i => (s"L$i", s"L${i + 1}")).toDF("child", "parent")
    val exported = Seq("L5").toDF("id")
    val parents = Hierarchy.closestExportedParents(edges, "child", "parent", exported, "id")
    assert(parents.count() === 5) // every level resolves to L5
    // resident: only the final result checkpoint (distinct() is derived
    // from it, and freeCheckpoint traverses the plan to that leaf)
    assert(persistedCount() === before + 1)
    Bridge.freeCheckpoint(parents)
    assert(persistedCount() === before)
  }
}
