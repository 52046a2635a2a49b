package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Sketches

/** The streamed dyadic register store, sum-merged, must equal the
  * batch-built register over the full history — and survive idle re-runs
  * and crash replay without double-counting (sum is associative but NOT
  * idempotent: replay safety is the batch_id-partition overwrite). */
class StreamingDyadicRegisterSpec extends SparkSpec {
  import spark.implicits._

  test("streamed registers sum-merge to the batch register; range counts agree") {
    val root = Files.createTempDirectory("graft-dyadic-store").toString
    val in = s"$root/raw"
    val evAll = Tables.events(spark, sf())
      .select(col("event_type"),
        floor(col("value") * lit(128)).cast("long").as("v"),
        col("event_id"))
    val batch1 = evAll.filter($"event_id" % 3 =!= 0).drop("event_id")
    val batch2 = evAll.filter($"event_id" % 3 === 0).drop("event_id")
    batch1.write.parquet(s"$in/f1")

    def runOnce(): Unit = StreamingDyadicRegister.run(spark, s"$in/*", batch1,
      "event_type", "v", s"$root/store", s"$root/ckpt")
    def merged() =
      StreamingDyadicRegister.mergedRegister(spark, s"$root/store", "event_type")
    def batchReg(df: org.apache.spark.sql.DataFrame) =
      Sketches.dyadicRegister(df, Seq("event_type"), "v")

    runOnce()
    assert(merged().exceptAll(batchReg(batch1)).count() == 0)
    assert(batchReg(batch1).exceptAll(merged()).count() == 0)

    // idle re-run: no new partitions, merged view unchanged (no recount)
    runOnce()
    assert(merged().exceptAll(batchReg(batch1)).count() == 0)

    // incremental drain folds batch2 in; merged == batch over the union
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(merged().exceptAll(batchReg(union)).count() == 0)
    assert(batchReg(union).exceptAll(merged()).count() == 0)

    // and the consumer-facing range counts agree with a direct scan
    val got = Sketches.dyadicRangeCount(merged(), Seq("event_type"), 12800L, 31999L)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("range_cnt"))
      .toMap
    val want = union.filter($"v".between(12800L, 31999L))
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(got === want)

    // crash replay: re-land a batch's partition by hand with the same rows
    // (what a replayed foreachBatch does) — the overwrite keeps sums exact
    ExactlyOnce.landBatchPartition(batchReg(batch2), s"$root/store", 1L)
    assert(merged().exceptAll(batchReg(union)).count() == 0)
    assert(batchReg(union).exceptAll(merged()).count() == 0)

    // quantiles off the streamed store: rank-select (sk6's consumer) over
    // the merged register == sort-based median over the raw union
    val reg = merged().localCheckpoint(true)
    val ranks = reg.filter($"key" === Sketches.dyadicKey(16, 0L))
      .select($"event_type", expr("(cnt + 1) div 2").as("k"))
    val med = Sketches.dyadicRankSelect(reg, Seq("event_type"), ranks, "k")
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("value"))
      .toMap
    val wantMed = union.collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rows) =>
        val vs = rows.map(_.getAs[Long]("v")).sorted
        t -> vs((vs.length + 1) / 2 - 1)
      }
    assert(med === wantMed)
  }
}
