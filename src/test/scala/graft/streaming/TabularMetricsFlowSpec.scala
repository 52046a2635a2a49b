package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Writers

/** The reference's tabular-metrics daily loop end-to-end
  * (`dgv/tabular_metrics/task_functions.py:88-229`): detect never-seen log
  * files (St1 exactly-once streaming ingestion), filter+aggregate per
  * (date, resource) call counts, and upsert into the serving counts table
  * with summed-on-conflict semantics (S19). Day re-runs are idempotent —
  * the registry prevents double ingestion, and a genuinely new file adds
  * exactly its delta.
  */
class TabularMetricsFlowSpec extends SparkSpec {
  import spark.implicits._

  test("new-file detect → aggregate → upsert; re-run adds only new deltas") {
    val root = Files.createTempDirectory("tabflow").toString
    val in = s"$root/in"; val staged = s"$root/staged"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(in))

    def logBatch(name: String, rows: Seq[(String, String, Int)]): Unit =
      rows.toDF("date_metric", "resource_id", "status")
        .write.mode("append").parquet(s"$in/$name")

    // day 1 files: resource r1 called twice OK, r2 once OK, one 404 dropped
    logBatch("f1", Seq(("2024-03-01", "r1", 200), ("2024-03-01", "r1", 302),
      ("2024-03-01", "r2", 200), ("2024-03-01", "r2", 404)))

    val schemaSource = Seq(("", "", 0)).toDF("date_metric", "resource_id", "status")
    def drain(): Unit = Incremental.processNewFiles(spark, s"$in/*", schemaSource,
      df => df.filter(col("status").between(200, 399)), staged, ckpt)
    def aggregateStaged() = spark.read.parquet(staged)
      .groupBy("date_metric", "resource_id").agg(count(lit(1)).as("nb_calls"))

    drain()
    var counts = Writers.upsertCounts(
      Seq.empty[(String, String, Long)].toDF("date_metric", "resource_id", "nb_calls"),
      aggregateStaged(), Seq("date_metric", "resource_id"), "nb_calls")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    assert(asMap(counts) == Map(("2024-03-01", "r1") -> 2L, ("2024-03-01", "r2") -> 1L))

    // re-run with NO new files: the registry yields nothing new, and
    // upserting the resulting EMPTY delta leaves the table unchanged
    // (idempotent day re-run)
    drain()
    assert(spark.read.parquet(staged).count() == 3) // checkpoint never re-ingests f1
    val emptyDelta = aggregateStaged().limit(0)
    val afterEmpty = Writers.upsertCounts(counts, emptyDelta,
      Seq("date_metric", "resource_id"), "nb_calls")
    assert(asMap(afterEmpty) == asMap(counts))

    // day 2 file arrives: exactly its rows land in staged, and its
    // aggregated increment upserts with summed-on-conflict semantics
    logBatch("f2", Seq(("2024-03-02", "r1", 200), ("2024-03-01", "r1", 200)))
    drain()
    assert(spark.read.parquet(staged).count() == 5) // 3 + the 2 new rows
    val dayTwoDelta = Seq(("2024-03-02", "r1", 1L), ("2024-03-01", "r1", 1L))
      .toDF("date_metric", "resource_id", "nb_calls")
    counts = Writers.upsertCounts(counts, dayTwoDelta,
      Seq("date_metric", "resource_id"), "nb_calls")
    assert(asMap(counts) == Map(
      ("2024-03-01", "r1") -> 3L, // 2 + conflict-summed 1
      ("2024-03-01", "r2") -> 1L,
      ("2024-03-02", "r1") -> 1L))
  }
}
