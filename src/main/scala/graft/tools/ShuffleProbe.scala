package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Total shuffle bytes written/read + task count for catalog queries —
  * the r15 optimization-round evidence probe. The advertised-layout
  * checkpoint work (Bridge.localCheckpointPartitioned) claims iterative
  * operators stop re-writing their resident frames to shuffle storage
  * every round; stage-level shuffle-write totals are the direct,
  * plan-independent measurement of exactly that claim (a static explain
  * cannot show it: each round's plan hides behind the checkpoint action).
  *
  * Usage: runMain graft.tools.ShuffleProbe <q1,q2,...>
  * Prints per query: median wall s over 3 warm runs, and per-run total
  * shuffle write/read MB and task count (identical across runs when the
  * plan is deterministic).
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ShuffleProbe <names>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sw = new LongAdder; val sr = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        sw.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        sr.add(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        tasks.add(sc.stageInfo.numTasks)
      }
    })
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n"))
      SparkEntry.setups.get(n).foreach(_(spark, sfDir))
      // one untimed warm pass (codegen JIT), then 3 measured
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.gc()
      val runs = (1 to 3).map { _ =>
        // drain BEFORE reset and AFTER the action: listener events arrive
        // asynchronously — without the drain a late stage-completed event
        // is lost from this run or miscounted into the next
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        sw.reset(); sr.reset(); tasks.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        System.gc()
        (dt, sw.sum() / 1e6, sr.sum() / 1e6, tasks.sum())
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"[shuffleprobe] $n%-28s ${med}%6.2f s  " +
        runs.map { case (t, w, r, k) =>
          f"[t=$t%.2f w=${w}%.1fMB r=${r}%.1fMB tasks=$k]" }.mkString(" "))
    }
    spark.stop()
  }
}
