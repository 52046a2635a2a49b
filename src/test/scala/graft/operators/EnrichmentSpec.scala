package graft.operators

import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

/** Cache-join enrichment (SURVEY §7.4.5): fetch runs ONLY for cache misses,
  * the cache grows by exactly the unseen keys, and re-runs fetch nothing.
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  // standalone value so the closure captures only the accumulator, not the spec
  private def stubFetch(calls: LongAccumulator): Iterator[String] => Iterator[(String, String)] =
    EnrichmentSpec.stub(calls)

  test("fetches only misses; cache grows; enrichment is complete") {
    val input = Seq("a", "b", "a", "c", "b").toDF("addr")
    val cache = Seq(("a", "geo(a)")).toDF("addr", "geo")
    val calls = spark.sparkContext.longAccumulator("fetch-calls")
    val (enriched, updated) =
      Enrichment.enrichWithCache(input, "addr", cache, "geo")(stubFetch(calls))
    val rows = enriched.as[(String, String)].collect().toSeq.sorted
    assert(rows == Seq("a" -> "geo(a)", "a" -> "geo(a)", "b" -> "geo(b)",
      "b" -> "geo(b)", "c" -> "geo(c)"))
    assert(updated.count() == 3)
    // fetch ran ONCE per miss even though two downstream actions consumed it
    assert(calls.value == 2)

    // idempotent re-run against the updated cache: zero fetches
    val calls2 = spark.sparkContext.longAccumulator("fetch-calls-2")
    val (again, cache2) =
      Enrichment.enrichWithCache(input, "addr", updated, "geo")(stubFetch(calls2))
    again.collect()
    cache2.collect()
    assert(calls2.value == 0)
  }

  test("durable fetchedDir pins fetched rows to parquet, one fetch per miss") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString
    val input = Seq("x", "y").toDF("addr")
    val cache = Seq.empty[(String, String)].toDF("addr", "geo")
    val calls = spark.sparkContext.longAccumulator("fetch-durable")
    val (enriched, updated) = Enrichment.enrichWithCache(
      input, "addr", cache, "geo", Some(s"$dir/fetched"))(stubFetch(calls))
    assert(enriched.count() == 2)
    assert(updated.count() == 2)
    assert(calls.value == 2) // both downstream actions served from parquet
    // the durable copy is on disk and matches
    assert(spark.read.parquet(s"$dir/fetched").count() == 2)
  }

  test("DST switch day parses unambiguously under the UTC session tz (§7.4.6)") {
    // Europe/Paris fell back on 2024-10-27: 02:30 exists at +02:00 AND +01:00.
    // With offsets in the data and a UTC session, the two map to distinct
    // instants 1h apart — the reference's utc=True cast for DST days
    // (dgv/tabular_metrics/task_functions.py:134-135).
    val df = Seq("2024-10-27T02:30:00+02:00", "2024-10-27T02:30:00+01:00")
      .toDF("iso")
      .selectExpr("unix_timestamp(to_timestamp(iso)) AS epoch")
    val e = df.as[Long].collect().toSeq
    assert(e(1) - e(0) == 3600L)
    assert(java.time.Instant.ofEpochSecond(e(0)).toString == "2024-10-27T00:30:00Z")
  }
}

object EnrichmentSpec {
  def stub(calls: LongAccumulator): Iterator[String] => Iterator[(String, String)] =
    keys => keys.map { k => calls.add(1); (k, s"geo($k)") }
}
