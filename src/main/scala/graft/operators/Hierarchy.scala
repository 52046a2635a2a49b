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
    *         parents included. */
  def transitiveClosure(edges: DataFrame, childCol: String, parentCol: String,
                        maxRounds: Int = 20): DataFrame = {
    var closure = edges.select(col(childCol).as("node"), col(parentCol).as("ancestor"))
      .distinct().localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // path doubling: join closure with itself (ancestor -> its ancestors)
      val prevCount = closure.count()
      // checkpoint BEFORE counting so each round's join/distinct runs once
      // (the count is then served from the checkpointed blocks) and the
      // lineage never grows.
      val next = closure.as("a")
        .join(closure.as("b"), col("a.ancestor") === col("b.node"))
        .select(col("a.node").as("node"), col("b.ancestor").as("ancestor"))
        .union(closure).distinct()
        .localCheckpoint(true)
      converged = next.count() == prevCount
      closure = next
      round += 1
    }
    closure
  }

  /** Denormalized sorted ancestor arrays (`geozones/task_functions.py:175-176`). */
  def ancestorArrays(closure: DataFrame): DataFrame =
    closure.groupBy("node").agg(array_sort(collect_set("ancestor")).as("ancestors"))
}
