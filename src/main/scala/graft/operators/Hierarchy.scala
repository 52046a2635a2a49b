package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-hierarchy transitive closure
  * (`data_processing/geozones/task_functions.py:53-177`: commune → EPCI →
  * département → région parent edges, DFS-with-memoization ancestors).
  *
  * Spark-first shape: iterative self-join to fixpoint. Each round doubles
  * the reachable path length (path-doubling), so a depth-d hierarchy
  * closes in ceil(log2 d) + 1 joins — for the reference's 4-level
  * geography that is 2 rounds. The frontier is re-keyed each round; with
  * ~40k zones this is broadcast-sized, but the algorithm stays a pure
  * shuffle join chain and scales to deep hierarchies.
  */
object Hierarchy {

  /** @param edges (child, parent) pairs — parent == direct parent.
    * @return (node, ancestor) pairs: every transitive ancestor, direct
    *         parents included.
    *
    * DISTANCE-ANNOTATED doubling, not the naive closure⋈closure: naive
    * doubling re-derives a distance-D pair once per midpoint split whose
    * halves are already known, so for deep chains the pre-distinct join
    * output blows up quadratically in depth (HierProbe measured 200k
    * nodes / depth 64: 6.3M closure pairs but 90.9 s). Annotating each
    * pair with its MIN path length and joining only the dist == 2^(r-1)
    * slice against the closure makes every derivation UNIQUE — pair at
    * min-dist D lands in exactly one round, decomposed as its exact-2^(r-1)
    * prefix (min by optimal substructure) plus a ≤ 2^(r-1) remainder — so
    * total join output across all rounds equals the closure itself.
    * Rounds stay ceil(log2 d) + 1; the min-agg replaces the distinct
    * (same per-round shuffle count). Cycles converge like the naive form:
    * min distances are bounded by cycle length, so the exact-dist frontier
    * empties once 2^(r-1) passes the deepest min path. */
  def transitiveClosure(edges: DataFrame, childCol: String, parentCol: String,
                        maxRounds: Int = 20): DataFrame = {
    // ADVERTISED node layout (r15 opt): the doubling join probes the
    // closure by b.node every round — advertised, the closure-side
    // exchange disappears (only the exact-dist frontier re-keys by
    // ancestor). The merge agg below then reuses the same layout.
    // The frontier-emptiness probe rides each checkpoint action via
    // `observe` (r16 opt): counting rows at the NEXT doubling step during
    // the materialization replaces the old per-round isEmpty job.
    def frontierObs(df: DataFrame, nextStep: Long)
        : (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs,
        count(when(col("__dist") === nextStep, 1)).as("__front")), obs)
    }
    val (c0, obs0) = frontierObs(
      edges
        .select(col(childCol).as("node"), col(parentCol).as("ancestor"))
        .distinct()
        .withColumn("__dist", lit(1L)),
      nextStep = 1L)
    var closure = org.apache.spark.sql.graft.Bridge.localCheckpointPartitioned(
      c0, Seq("node"))
    var frontierN = obs0.get("__front").asInstanceOf[Long]
    var step = 1L
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // frontier: pairs whose min distance is EXACTLY the doubling step —
      // served from the checkpointed blocks
      val frontier = closure.filter(col("__dist") === step)
      if (frontierN == 0L) converged = true
      else {
        val next = frontier.as("a")
          .join(closure.as("b"), col("a.ancestor") === col("b.node"))
          .select(col("a.node").as("node"), col("b.ancestor").as("ancestor"),
            (col("a.__dist") + col("b.__dist")).as("__dist"))
        // min-agg, not distinct: a DAG can reach the same ancestor along
        // paths of different lengths; keeping the min preserves the
        // unique-decomposition invariant for every later round.
        // The union is re-keyed by NODE alone before the agg: a node-hash
        // layout clusters the (node, ancestor) groups too (per-node group
        // count is bounded by the hierarchy depth, so no skew), the agg
        // runs in place on it, and the node-layout checkpoint right after
        // reuses the same count — one shuffle serves merge AND layout.
        val nParts = org.apache.spark.sql.graft.Bridge
          .advertisedNumPartitions(closure)
          .getOrElse(closure.sparkSession.conf
            .get("spark.sql.shuffle.partitions").toInt)
        val (m0, obs) = frontierObs(
          closure.unionByName(next)
            .repartition(nParts, col("node"))
            .groupBy("node", "ancestor").agg(min("__dist").as("__dist")),
          nextStep = step * 2)
        val merged = org.apache.spark.sql.graft.Bridge.localCheckpointPartitioned(
          m0, Seq("node"), numParts = nParts)
        frontierN = obs.get("__front").asInstanceOf[Long]
        // merged is materialized: the superseded round's blocks are dead weight
        org.apache.spark.sql.graft.Bridge.freeCheckpoint(closure)
        closure = merged
        step *= 2
        round += 1
      }
    }
    closure.select("node", "ancestor")
  }

  /** Denormalized sorted ancestor arrays (`geozones/task_functions.py:175-176`). */
  def ancestorArrays(closure: DataFrame): DataFrame =
    closure.groupBy("node").agg(array_sort(collect_set("ancestor")).as("ancestors"))

  /** Closest exported parents (`geozones/task_functions.py:149-164`): a
    * node's direct parents that are in the export, climbing THROUGH
    * filtered-out parents until an exported one is found on each path (the
    * reference skips non-exported levels like canton/arrondissement).
    *
    * Spark-first shape: the frontier holds only still-unresolved (node,
    * via) paths, so each round is one equi-join of the shrinking frontier
    * against the edge set — resolved paths leave the loop immediately.
    * Cycles are cut by `maxRounds` (the reference cuts back-edges with a
    * visiting set; a cyclic all-non-exported component simply resolves to
    * no parent here too).
    *
    * @return (node, parent) pairs, parent ∈ exported. Roots and nodes whose
    *         every path dead-ends produce no rows (reference: empty set).
    */
  def closestExportedParents(edges: DataFrame, childCol: String, parentCol: String,
                             exported: DataFrame, exportedCol: String,
                             maxRounds: Int = 20): DataFrame = {
    // resident frames (r15 opt): `e` is probed by child every round and
    // `x` classifies every round's step — un-checkpointed, both re-ran
    // their build per round; advertised child layout keeps the per-round
    // join exchange on the shrinking frontier side only
    val e = org.apache.spark.sql.graft.Bridge.localCheckpointPartitioned(
      edges.select(col(childCol).as("child"), col(parentCol).as("parent"))
        .filter(col("child") =!= col("parent")).distinct(),
      Seq("child"))
    val x = exported.select(col(exportedCol).as("__xid")).distinct()
      .localCheckpoint(true)
    // the frontier-emptiness probe rides each tagged checkpoint via
    // `observe` (r16 opt) — counting the misses during the materialization
    // replaces the old per-round isEmpty job
    def classify(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.join(x, df("parent") === x("__xid"), "left")
        .select(col("node"), col("parent"), col("__xid").isNotNull.as("__hit"))
        .observe(obs, count(when(!col("__hit"), 1)).as("__miss")), obs)
    }
    val (t0, obs0) = classify(e.select(col("child").as("node"), col("parent")))
    var tagged = t0.localCheckpoint(true)
    var missN = obs0.get("__miss").asInstanceOf[Long]
    // result is re-checkpointed (and the superseded copy freed) each round so
    // resident storage stays bounded at {edges, current tagged, current
    // result} instead of accumulating every round's hit slice.
    var result = tagged.filter(col("__hit")).select("node", "parent")
      .localCheckpoint(true)
    var frontier = tagged.filter(!col("__hit"))
      .select(col("node"), col("parent").as("via"))
    var round = 0
    while (round < maxRounds && missN > 0L) {
      // qualified alias: the checkpointed leaf PRESERVES its output attr
      // ids across rounds, so the frontier's lineage and `e` share ids —
      // an unqualified e("parent") is ambiguous to the self-join check
      val step = frontier.join(e.as("__e"), frontier("via") === col("__e.child"))
        .select(col("node"), col("__e.parent").as("parent")).distinct()
      val (nt0, obs) = classify(step)
      val nextTagged = nt0.localCheckpoint(true)
      missN = obs.get("__miss").asInstanceOf[Long]
      val nextResult = result
        .union(nextTagged.filter(col("__hit")).select("node", "parent"))
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.freeCheckpoint(tagged)
      org.apache.spark.sql.graft.Bridge.freeCheckpoint(result)
      tagged = nextTagged
      result = nextResult
      frontier = tagged.filter(!col("__hit")).select(col("node"), col("parent").as("via"))
      round += 1
    }
    org.apache.spark.sql.graft.Bridge.freeCheckpoint(tagged)
    // the resident edge/export frames are dead once the loop exits — the
    // returned frame reads only the (checkpointed) result leaf
    org.apache.spark.sql.graft.Bridge.freeCheckpoint(e)
    org.apache.spark.sql.graft.Bridge.freeCheckpoint(x)
    result.distinct()
  }

  /** Denormalized sorted closest-parent arrays (`task_functions.py:177`). */
  def parentArrays(parents: DataFrame): DataFrame =
    parents.groupBy("node").agg(array_sort(collect_set("parent")).as("parents"))

  /** [[parentArrays]] with the parent list flattened to a pipe-joined string —
    * the exchange-friendly flat-scalar form (array cells don't survive every
    * downstream tabular consumer).
    */
  def parentList(parents: DataFrame): DataFrame =
    parentArrays(parents).withColumn("parents", array_join(col("parents"), "|"))
}
