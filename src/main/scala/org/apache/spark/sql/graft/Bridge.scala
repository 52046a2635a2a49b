package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr` / `new Column(Expression)` from the public
  * API; the supported conversion lives in `org.apache.spark.sql.classic.
  * ExpressionUtils`, which is `private[sql]`. This bridge re-exports the two
  * conversions to graft. It is the only place graft touches a non-public
  * Spark API, and it goes through the blessed classic conversion path.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint(true)`-ed
    * frame. Iterative operators (transitive closure, label propagation)
    * checkpoint every round; without this, every superseded round's blocks
    * stay resident until the session dies — unbounded storage growth on
    * deep fixpoints. Call ONLY once nothing will read the frame again: the
    * checkpoint truncated its lineage, so freed blocks cannot be recomputed.
    */
  def freeCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    freeCheckpointExcept(df, Set.empty)

  /** RDD ids of every `LogicalRDD` reachable in `df`'s analyzed plan.
    * An iterative operator snapshots its INPUT's set before the loop so
    * [[freeCheckpointExcept]] can free the loop's own superseded
    * checkpoints without ever unpersisting a block the caller still owns
    * (a round-0 frame derives from the input, so a bare plan walk would
    * reach — and free — a checkpointed caller frame; see the r10
    * assignClustersApprox regression, VERDICT r10 #1). */
  def checkpointIds(df: org.apache.spark.sql.Dataset[_]): Set[Int] = {
    val b = Set.newBuilder[Int]
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => b += lr.rdd.id
        case _ => ()
      }
    b.result()
  }

  /** True when `df`'s analyzed plan is already a bare LogicalRDD leaf —
    * an eager checkpoint / materialized artifact that re-reads without
    * recomputation. Iterative operators use this to materialize an
    * unmaterialized input ONCE instead of re-running its build subtree
    * every round, while passing an already-checkpointed artifact (the
    * g5/g6 co-purchase frame) through untouched. */
  def isBareCheckpoint(df: org.apache.spark.sql.Dataset[_]): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  /** [[freeCheckpoint]], but LogicalRDDs whose rdd id is in `keep` are
    * left alone — the iterative-operator hygiene primitive: pair with
    * [[checkpointIds]] on the operator's input. */
  def freeCheckpointExcept(df: org.apache.spark.sql.Dataset[_],
                           keep: Set[Int]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD
            if !keep.contains(lr.rdd.id) => lr.rdd.unpersist(false)
        case _ => ()
      }
}
