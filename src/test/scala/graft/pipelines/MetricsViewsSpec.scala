package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materializer semantics for the 15-matview metrics DAG: refresh order,
  * idempotent overwrite, and cross-view consistency invariants that the
  * reference's layered views guarantee by construction.
  */
class MetricsViewsSpec extends SparkSpec {

  private lazy val base = MetricsViews.deriveBase(spark, sf())
  private lazy val outDir = Files.createTempDirectory("mviews").toString
  private lazy val views = MetricsViews.materialize(spark, base, outDir)

  test("materializes all 15 views in the reference refresh order") {
    assert(MetricsViews.materializedViews.size == 15)
    assert(views.keySet == MetricsViews.materializedViews.toSet)
    // every view landed on disk as parquet
    MetricsViews.materializedViews.foreach { name =>
      assert(Files.exists(java.nio.file.Paths.get(outDir, name)), name)
    }
  }

  test("site view totals equal the monthly dataset/reuse sums") {
    val fromSite = views("site")
      .agg(sum("monthly_visit_dataset"), sum("monthly_visit_reuse"))
      .head()
    val dsSum = views("datasets").agg(sum("monthly_visit")).head().getLong(0)
    val ruSum = views("reuses").agg(sum("monthly_visit")).head().getLong(0)
    assert(fromSite.getLong(0) == dsSum)
    assert(fromSite.getLong(1) == ruSum)
  }

  test("lifetime totals match base-fact sums (datasets_total vs visits)") {
    val totalVisit = views("datasets_total").agg(sum("visit")).head().getLong(0)
    val baseVisit = base.visitsDatasets.agg(sum("nb_visit")).head().getLong(0)
    assert(totalVisit == baseVisit)
    val totalOutlink = views("datasets_total").agg(sum("outlink")).head().getLong(0)
    val baseOutlink = base.matomoDatasets.agg(sum("nb_outlink")).head().getLong(0)
    assert(totalOutlink == baseOutlink)
  }

  test("metrics_datasets preserves every visit and matomo row (full outer)") {
    val m = views("metrics_datasets")
    assert(m.filter(col("nb_visit").isNotNull).count() == base.visitsDatasets.count())
    assert(m.filter(col("nb_outlink").isNotNull).count() == base.matomoDatasets.count())
    // coalesced keys are never null
    assert(m.filter(col("date_metric").isNull || col("dataset_id").isNull).count() == 0)
  }

  test("surrogate __id is unique within every base table") {
    Seq(base.visitsDatasets, base.visitsResources, base.visitsOrganizations,
      base.visitsReuses, base.visitsDataservices).foreach { t =>
      assert(t.select("__id").distinct().count() == t.count())
    }
  }

  // Last two on purpose: overwriting the parquet invalidates the file
  // listings captured by the DataFrames in `views`, so nothing may read
  // them afterwards.
  test("re-materialization is idempotent (overwrite, same rows)") {
    val before = views("site").orderBy("metric_month").collect().toSeq
    val again = MetricsViews.materialize(spark, base, outDir)
    assert(again("site").orderBy("metric_month").collect().toSeq == before)
  }

  test("daily delete-day-then-reload replaces exactly that day, views follow") {
    val day = base.visitsDatasets.agg(min("date_metric")).head().getString(0)
    def one(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("date_metric") === day)
    val dayVisits = one(base.visitsDatasets).agg(sum("nb_visit")).head().getLong(0)
    val before = spark.read.parquet(s"$outDir/datasets_total")
      .agg(sum("visit")).head().getLong(0)
    // re-load the day with doubled visit counts (the duplication-safety
    // re-run of task.py:199-221, here with changed data)
    val doubled = MetricsViews.Base(
      visitsDatasets = one(base.visitsDatasets)
        .withColumn("nb_visit", col("nb_visit") * 2),
      visitsResources = one(base.visitsResources),
      visitsOrganizations = one(base.visitsOrganizations),
      visitsReuses = one(base.visitsReuses),
      visitsDataservices = one(base.visitsDataservices),
      matomoDatasets = one(base.matomoDatasets),
      matomoReuses = one(base.matomoReuses),
      matomoOrganizations = one(base.matomoOrganizations),
      matomoDataservices = one(base.matomoDataservices))
    MetricsViews.loadBase(doubled, outDir)
    val after = MetricsViews.refreshViews(spark, outDir)
    // only that day's partitions changed: total gains exactly the day's visits
    assert(after("datasets_total").agg(sum("visit")).head().getLong(0)
      == before + dayVisits)
    // untouched days keep their original counts
    val otherDays = after("metrics_datasets")
      .filter(col("date_metric") =!= day && col("nb_visit").isNotNull)
      .agg(sum("nb_visit")).head().getLong(0)
    val origOther = base.visitsDatasets.filter(col("date_metric") =!= day)
      .agg(sum("nb_visit")).head().getLong(0)
    assert(otherDays == origOther)
  }
}
