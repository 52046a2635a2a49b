package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** Pins [[Bridge.localCheckpointPartitioned]] — the advertised-layout
  * checkpoint behind every iterative operator's resident frame (kcore,
  * pagerank, HITS, SSSP, components): (1) the advertisement must be
  * visible to the planner and remove the resident side's per-join
  * Exchange, (2) results must be bit-identical to the plain checkpoint
  * under joins, aggregations and alias-renamed keys (a WRONG advertised
  * layout would silently mis-join — the whole feature is only safe
  * because these parity pins exist), (3) checkpoint hygiene
  * (checkpointIds/freeCheckpointExcept) must see the rebuilt leaf.
  */
class BridgePartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  /** Run `body` with auto-broadcast off: these pins prove the SHUFFLE
    * layout is advertised, so the tiny test frames must not be salvaged
    * by a broadcast join instead. */
  private def noAutoBroadcast[A](body: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, prev)
  }

  private def exchanges(p: String): Int =
    "(?<!Reused)Exchange".r.findAllIn(p).length

  // deliberately nasty key set: duplicates, negatives, and a null
  private def bigDf =
    (Seq.tabulate(400)(i => (Some((i % 13).toLong - 3L), i.toLong)) :+
      ((None: Option[Long], 999L))).toDF("k", "v")

  test("advertisement round-trip: partitioned checkpoint exposes its hash cols") {
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"))
    assert(Bridge.advertisedHashCols(adv) === Some(Seq("k")))
    val plain = bigDf.localCheckpoint(true)
    assert(Bridge.advertisedHashCols(plain) === None)
    Bridge.freeCheckpoint(adv); Bridge.freeCheckpoint(plain)
  }

  test("join on the advertised key: resident side exchange-free, results identical") {
    noAutoBroadcast {
    val frontier = Seq(0L, 1L, 5L, -3L, 42L).toDF("k")
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"))
    val plain = bigDf.localCheckpoint(true)
    val jAdv = adv.join(frontier, "k").groupBy("k").agg(sum("v").as("s"))
    val jPlain = plain.join(frontier, "k").groupBy("k").agg(sum("v").as("s"))
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("s"))).sortBy(_._1)
    assert(rows(jAdv).toSeq === rows(jPlain).toSeq)
    // advertised side satisfies the join + agg distribution in place: only
    // the frontier's exchange remains (plain pays two or more)
    val pAdv = finalPlan(adv.join(frontier, "k").groupBy("k").agg(sum("v")))
    assert(exchanges(pAdv) === 1, pAdv)
    Bridge.freeCheckpoint(adv); Bridge.freeCheckpoint(plain)
    }
  }

  test("aggregation on the advertised key runs without any exchange") {
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"))
    val p = finalPlan(adv.groupBy("k").agg(sum("v").as("s")))
    assert(exchanges(p) === 0, p)
    // parity incl. the null key group
    val a = adv.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (Option(r.getAs[java.lang.Long]("k")), r.getAs[Long]("s"))).toMap
    val b = bigDf.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (Option(r.getAs[java.lang.Long]("k")), r.getAs[Long]("s"))).toMap
    assert(a === b)
    Bridge.freeCheckpoint(adv)
  }

  test("alias rename keeps the advertised layout (the pagerank frontier shape)") {
    noAutoBroadcast {
    // rank frames checkpoint partitioned by `node` and re-enter the next
    // round's edge join renamed to `src`: ProjectExec's alias-aware
    // partitioning must carry the advertisement through the rename
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"))
    val renamed = adv.withColumnRenamed("k", "src")
    val other = Bridge.localCheckpointPartitioned(
      bigDf.select(col("k").as("src"), col("v").as("w")), Seq("src"))
    val j = renamed.join(other, "src")
    val p = finalPlan(j)
    assert(exchanges(p) === 0, p)
    val viaAdv = j.groupBy("src").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("c"))).sortBy(_._1)
    val jp = bigDf.withColumnRenamed("k", "src")
      .join(bigDf.select(col("k").as("src"), col("v").as("w")), "src")
      .groupBy("src").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("c"))).sortBy(_._1)
    assert(viaAdv.toSeq === jp.toSeq)
    Bridge.freeCheckpoint(adv); Bridge.freeCheckpoint(other)
    }
  }

  test("sorted=true advertises an ordering and keeps parity") {
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"), sorted = true)
    assert(Bridge.advertisedHashCols(adv) === Some(Seq("k")))
    val a = adv.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (Option(r.getAs[java.lang.Long]("k")), r.getAs[Long]("s"))).toMap
    val b = bigDf.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => (Option(r.getAs[java.lang.Long]("k")), r.getAs[Long]("s"))).toMap
    assert(a === b)
    Bridge.freeCheckpoint(adv)
  }

  test("float-family layout keys are rejected (ADVICE r15 #1)") {
    // join equality on floats goes through NormalizeFloatingNumbers
    // (-0.0 == 0.0, canonical NaN); a raw-bytes hash advertisement could
    // disagree, so the helper refuses the key class outright
    val fdf = Seq((1.0, 10L), (2.0, 20L)).toDF("fk", "v")
    val e = intercept[IllegalArgumentException] {
      Bridge.localCheckpointPartitioned(fdf, Seq("fk"))
    }
    assert(e.getMessage.contains("float-family"), e.getMessage)
    val ndf = Seq((1.0, 10L)).toDF("x", "v")
      .select(struct(col("x")).as("sk"), col("v"))
    val e2 = intercept[IllegalArgumentException] {
      Bridge.localCheckpointPartitioned(ndf, Seq("sk"))
    }
    assert(e2.getMessage.contains("float-family"), e2.getMessage)
  }

  test("checkpoint hygiene sees the rebuilt leaf") {
    val adv = Bridge.localCheckpointPartitioned(bigDf, Seq("k"))
    val ids = Bridge.checkpointIds(adv)
    assert(ids.nonEmpty)
    // freeing with the ids protected must leave the frame readable
    Bridge.freeCheckpointExcept(adv, ids)
    assert(adv.count() === 401L)
    Bridge.freeCheckpoint(adv)
  }
}
