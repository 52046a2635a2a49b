package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** Where does g4's time go — the distinct co-purchase edge build, or the
  * peel rounds? And does the membership semi-join broadcast (the keep
  * frame is node-dimension) or shuffle the edges every round? */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"KCORE $label n=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val items = T.lineitem(spark, d)
      .select("l_orderkey", "l_partkey").distinct()
    val edges = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .filter(col("p1") < col("p2"))
      .select("p1", "p2").distinct()
    timed("edge_build")(edges.count())
    val e0 = edges.localCheckpoint()
    timed("peel_from_checkpointed")(
      graft.operators.Graph.kcorePeel(e0, "p1", "p2", 75, 8).count())
    // variant B: per-round keep materialized once (checkpoint) so the
    // degree agg runs once and AQE sees a sized tiny join side
    timed("peel_keep_checkpointed") {
      var cur = e0
      var curCnt = cur.count()
      var done = false
      var rounds = 0
      while (!done && rounds < 8) {
        val keep = cur.select(col("p1").as("n")).unionByName(cur.select(col("p2").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 75).select("n").localCheckpoint()
        val next = cur
          .join(keep.withColumnRenamed("n", "p1"), "p1")
          .join(keep.withColumnRenamed("n", "p2"), "p2")
          .select("p1", "p2")
          .localCheckpoint()
        val nextCnt = next.count()
        if (nextCnt == curCnt) done = true
        else { cur = next; curCnt = nextCnt }
        rounds += 1
      }
      curCnt
    }

    // Scale exponent (r14 verdict item #3): the peel at 1x vs 10x edge
    // volume. ScaleGen scales documents/embeddings only, so the graph is
    // scaled by REPLICATION — 10 id-shifted copies of the co-purchase edge
    // set (disjoint components, identical structure, identical round
    // count), which isolates how the peel's per-round degree agg +
    // decrement join scale with pure volume.
    val offset = 10L * 1000L * 1000L
    def replicated(m: Int) = e0
      .crossJoin(spark.range(m).select(col("id").as("__r")))
      .select((col("p1") + col("__r") * offset).as("p1"),
        (col("p2") + col("__r") * offset).as("p2"))
      .localCheckpoint(true)
    val times = Seq(1, 10).map { m =>
      val em = replicated(m)
      val ne = em.count()
      System.gc()
      val t0 = System.nanoTime()
      val surv = graft.operators.Graph.kcorePeel(em, "p1", "p2", 75, 8).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""KCORE scale m=$m edges=$ne survivors=$surv secs=$secs%.2f""")
      org.apache.spark.sql.graft.Bridge.freeCheckpoint(em)
      secs
    }
    println(f"""KCORE scale_exponent=${math.log(times(1) / times(0)) / math.log(10.0)}%.2f""")
    spark.stop()
  }
}
