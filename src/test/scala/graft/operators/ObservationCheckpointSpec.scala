package graft.operators

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** The r16 fixpoint-probe fusion rides `Dataset.observe` metrics on the
  * round's ONE eager-localCheckpoint action (kcorePeel's wave count,
  * connectedComponents' changed-label count, the Hierarchy frontier
  * probes) instead of paying a separate probe job per round. That only
  * works if a checkpoint materialization actually DELIVERS the observed
  * metrics — this spec pins that behavior (plain, repartitioned-sorted,
  * and Bridge-advertised checkpoints) so a Spark upgrade that stops firing
  * the listener on the checkpoint action fails loudly here, not as a hang
  * in an operator loop.
  */
class ObservationCheckpointSpec extends SparkSpec {

  test("observe delivers on a plain eager localCheckpoint") {
    val obs = Observation()
    val cp = spark.range(100).toDF("id")
      .observe(obs, count(when(col("id") < 10, 1)).as("small"),
        sum(col("id")).as("s"))
      .localCheckpoint(true)
    assert(obs.get("small") === 10L)
    assert(obs.get("s") === 4950L)
    assert(Bridge.isBareCheckpoint(cp))
    assert(cp.count() === 100L)
    Bridge.freeCheckpoint(cp)
  }

  test("observe delivers through repartition + sortWithinPartitions") {
    val obs = Observation()
    val cp = spark.range(50).toDF("id")
      .observe(obs, count(when(col("id") % 2 === 0, 1)).as("even"))
      .repartition(4, col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint(true)
    assert(obs.get("even") === 25L)
    assert(cp.count() === 50L)
    Bridge.freeCheckpoint(cp)
  }

  test("observe delivers through localCheckpointPartitioned (advertised layout)") {
    val obs = Observation()
    val cp = Bridge.localCheckpointPartitioned(
      spark.range(60).toDF("id")
        .observe(obs, count(when(col("id") > 9, 1)).as("big")),
      Seq("id"), sorted = true)
    assert(obs.get("big") === 50L)
    assert(cp.count() === 60L)
    Bridge.freeCheckpoint(cp)
  }
}
