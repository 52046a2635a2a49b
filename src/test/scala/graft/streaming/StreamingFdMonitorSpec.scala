package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.operators.Checks

/** The streamed FD/uniqueness audit, count-merged across batch
  * partitions, must equal the batch audit over the full history — and
  * survive idle re-runs and crash replay byte-identically (count-merge
  * associativity is the protocol). */
class StreamingFdMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("streamed FD audit count-merges to the batch audit across drains, idle runs, replay") {
    val root = Files.createTempDirectory("graft-fd-store").toString
    val in = s"$root/raw"
    val all = Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val batch1 = all.filter($"o_orderkey" % 3 =!= 0)
    val batch2 = all.filter($"o_orderkey" % 3 === 0)
    batch1.write.parquet(s"$in/f1")

    val rule = "orders: o_custkey -> o_orderpriority"
    def runOnce(): Unit = StreamingFdMonitor.run(spark, s"$in/*", batch1,
      Seq("o_custkey"), Some("o_orderpriority"), s"$root/store", s"$root/ckpt")
    def merged() = StreamingFdMonitor.mergedAudit(spark, s"$root/store",
      rule, Seq("o_custkey"), Some("o_orderpriority"))
    def batchAudit(df: org.apache.spark.sql.DataFrame) =
      Checks.fdAudit(df, rule, Seq("o_custkey"), Some("o_orderpriority"))

    runOnce()
    assert(merged().exceptAll(batchAudit(batch1)).count() == 0)
    assert(batchAudit(batch1).exceptAll(merged()).count() == 0)

    // idle re-run: no new input, merged view unchanged
    runOnce()
    assert(merged().exceptAll(batchAudit(batch1)).count() == 0)

    // incremental drain folds batch2 in; merged == batch over the union —
    // including groups SPLIT across batches (a custkey in both halves must
    // count once with summed rows, the cross-batch shape that would expose
    // a non-associative fold)
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assert(merged().exceptAll(batchAudit(union)).count() == 0)
    assert(batchAudit(union).exceptAll(merged()).count() == 0)
    // the fixture genuinely splits groups across the two batches
    val split = batch1.select("o_custkey").intersect(batch2.select("o_custkey")).count()
    assert(split > 0, "fixture must split LHS groups across batches")

    // crash replay: re-land batch2's partition by hand with the same rows
    // (what a replayed foreachBatch does) — store still merges clean
    ExactlyOnce.landBatchPartition(
      batch2.groupBy($"o_custkey", $"o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt")),
      s"$root/store", 1L)
    assert(merged().exceptAll(batchAudit(union)).count() == 0)
    assert(batchAudit(union).exceptAll(merged()).count() == 0)
  }

  test("uniqueness rule: streamed store catches a duplicate key split across batches") {
    val root = Files.createTempDirectory("graft-fd-uniq").toString
    val in = s"$root/raw"
    val base = Tables.orders(spark, sf()).select("o_orderkey").limit(50)
    val batch1 = base
    val batch2 = base.limit(5) // re-sends 5 keys: duplicates ONLY cross-batch
    batch1.write.parquet(s"$in/f1")
    batch2.write.parquet(s"$in/f2")

    val rule = "orders: o_orderkey unique"
    StreamingFdMonitor.run(spark, s"$in/*", batch1,
      Seq("o_orderkey"), None, s"$root/store", s"$root/ckpt")
    val got = StreamingFdMonitor.mergedAudit(spark, s"$root/store",
      rule, Seq("o_orderkey"), None).head()
    val want = Checks.fdAudit(batch1.unionByName(batch2), rule,
      Seq("o_orderkey"), None).head()
    assert(got === want)
    // per-batch the key is unique — only the merged view can see this
    assert(!got.getAs[Boolean]("holds"))
    assert(got.getAs[Long]("n_violating") === 5L)
  }
}
