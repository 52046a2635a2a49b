package graft.pipelines

import graft.SparkSpec

/** Golden-fixture test of the metrics spine (SURVEY §7.2), mirroring the
  * reference's `dgv/metrics/test/task_functions_test.py:27-106` shape:
  * raw lines → parse → pivot-aggregate → catalog join → monthly rollup. */
class LogMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    // dataset page hits (fr segment) — two on day 1, one on day 2
    """2024-03-01T00:16:57+02:00 slb lb: 1.2.3.4 200 +100 "GET /fr/datasets/air-quality HTTP/1.1"""",
    """2024-03-01T08:00:00+02:00 slb lb: 1.2.3.4 200 +100 "GET /fr/datasets/air-quality HTTP/1.1"""",
    """2024-03-02T01:00:00+02:00 slb lb: 1.2.3.4 302 +100 "GET /fr/datasets/air-quality HTTP/1.1"""",
    // resource download — must classify as resources, not datasets (pattern order)
    """2024-03-01T02:00:00+02:00 slb lb: 1.2.3.4 200 +100 "GET /fr/datasets/r/abc-123 HTTP/1.1"""",
    // api segment
    """2024-03-01T03:00:00+02:00 slb lb: 1.2.3.4 200 +100 "GET /api/2/datasets/water-data/ HTTP/1.1"""",
    // organization page
    """2024-03-01T04:00:00+02:00 slb lb: 1.2.3.4 200 +100 "GET /organizations/insee HTTP/1.1"""",
    // 404 — dropped by the status band filter
    """2024-03-01T05:00:00+02:00 slb lb: 1.2.3.4 404 +100 "GET /fr/datasets/air-quality HTTP/1.1"""",
    // unclassifiable — dropped
    """2024-03-01T06:00:00+02:00 slb lb: 1.2.3.4 200 +100 "GET /static/style.css HTTP/1.1"""")

  private val catalog = Seq(
    ("air-quality", "d-1", false, "2024-01-01"),
    ("air-quality", "d-1-old", true, "2023-01-01"),   // archived duplicate → dropped
    ("water-data", "d-2", false, "2024-01-05"),
    ("insee", "o-1", false, "2024-01-02")
  ).toDF("slug", "id", "archived", "created")

  test("a pattern whose group captures empty is a NON-match (filter exactness)") {
    // the raw-line rlike screen alone would pass this line; the exact
    // extract-based disjunction must drop it, like the old isNotNull filter
    val starPatterns = Seq(LogMetrics.LogPattern("datasets", "fr",
      """GET /fr/datasets/([\w-]*)"""))
    val rows = LogMetrics.parse(Seq(
      """2024-03-01 x 200 + "GET /fr/datasets/ HTTP/1.1"""", // empty capture
      """2024-03-01 x 200 + "GET /fr/datasets/ok HTTP/1.1""""
    ).toDF("value"), starPatterns).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("slug") == "ok")
  }

  test("parse → aggregate → catalog join matches the golden expectation") {
    val hits = LogMetrics.parse(lines.toDF("value"))
    assert(hits.count() == 6) // 404 and static dropped

    val agg = LogMetrics.aggregate(hits, Seq("fr", "direct", "api"))
    val byKey = agg.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(byKey(("2024-03-01", "datasets", "air-quality")) == ((2L, 0L, 0L, 2L)))
    assert(byKey(("2024-03-02", "datasets", "air-quality")) == ((1L, 0L, 0L, 1L)))
    assert(byKey(("2024-03-01", "resources", "abc-123")) == ((1L, 0L, 0L, 1L)))
    assert(byKey(("2024-03-01", "datasets", "water-data")) == ((0L, 0L, 1L, 1L)))
    assert(byKey(("2024-03-01", "organizations", "insee")) == ((0L, 1L, 0L, 1L)))

    val joined = LogMetrics.joinCatalog(agg, catalog)
    val ids = joined.select("slug", "id").as[(String, String)].collect().toMap
    assert(ids("air-quality") == "d-1") // unarchived wins the dedup rule
    assert(ids("water-data") == "d-2")
    assert(ids.get("abc-123").orNull == null) // not in catalog → left join null

    val monthly = LogMetrics.monthlyRollup(joined, Seq("nb_visit_fr", "nb_visit_total"))
    val m = monthly.filter($"slug" === "air-quality")
      .select("month", "nb_visit_fr", "nb_visit_total")
      .as[(String, Long, Long)].collect().toSeq
    assert(m == Seq(("2024-03", 3L, 3L)))
  }

  test("full §3.2 chain: logs → parse → aggregate → base facts → matview DAG → site") {
    import org.apache.spark.sql.functions._
    val agg = LogMetrics.aggregate(LogMetrics.parse(lines.toDF("value")),
      Seq("fr", "direct", "api"))
    val joined = LogMetrics.joinCatalog(agg, catalog)

    // shape the aggregated hits into the metrics base-fact tables
    val visitsDatasets = joined
      .filter($"entity_type" === "datasets" && $"id".isNotNull)
      .select(monotonically_increasing_id().as("__id"),
        $"date".as("date_metric"), $"id".as("dataset_id"),
        lit("org-1").as("organization_id"), $"nb_visit_total".as("nb_visit"))
    val emptyLike = visitsDatasets.limit(0)
    val base = MetricsViews.Base(
      visitsDatasets = visitsDatasets,
      visitsResources = joined.filter($"entity_type" === "resources")
        .select(monotonically_increasing_id().as("__id"), $"date".as("date_metric"),
          $"slug".as("resource_id"), lit("d-1").as("dataset_id"),
          lit("org-1").as("organization_id"), $"nb_visit_total".as("nb_visit")),
      visitsOrganizations = joined.filter($"entity_type" === "organizations")
        .select(monotonically_increasing_id().as("__id"), $"date".as("date_metric"),
          $"id".as("organization_id"), $"nb_visit_total".as("nb_visit")),
      visitsReuses = emptyLike.withColumnRenamed("dataset_id", "reuse_id"),
      visitsDataservices = emptyLike.withColumnRenamed("dataset_id", "dataservice_id"),
      matomoDatasets = emptyLike.withColumnRenamed("nb_visit", "nb_outlink"),
      matomoReuses = emptyLike.withColumnRenamed("dataset_id", "reuse_id")
        .withColumnRenamed("nb_visit", "nb_outlink"),
      matomoOrganizations = emptyLike.drop("dataset_id")
        .withColumnRenamed("nb_visit", "nb_outlink"),
      matomoDataservices = emptyLike.withColumnRenamed("dataset_id", "dataservice_id")
        .withColumnRenamed("nb_visit", "nb_outlink"))

    val views = MetricsViews.compose(base)
    // air-quality 2+1, water-data 1 → monthly dataset visits = 4; resources
    // roll into the dataset download column via the dataset_id attribution
    val site = views("site").collect()
    assert(site.length == 1)
    val row = views("site").select("metric_month", "monthly_visit_dataset",
      "monthly_download_resource").head()
    assert(row.getString(0) == "2024-03")
    assert(row.getLong(1) == 4L)
    assert(row.getLong(2) == 1L)
    // lifetime totals agree with the log-derived counts
    val totals = views("datasets_total").select("dataset_id", "visit")
      .as[(String, Long)].collect().toMap
    assert(totals == Map("d-1" -> 3L, "d-2" -> 1L))
  }
}
