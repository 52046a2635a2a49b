package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's 15-materialized-view metrics DAG re-expressed Spark-first.
  *
  * Reference: `dgv/metrics/sql/create_tables.sql:125-345` defines the views,
  * `dgv/metrics/task.py:254-283` (`MATERIALIZED_VIEWS`) is the refresh order —
  * base full-outer join views first, then monthly rollups, then lifetime
  * totals, then the global `site` view. Each view reads the *materialized*
  * upstream, so [[materialize]] writes parquet in that same topological order
  * and re-reads the written parquet for downstream views (the Spark twin of
  * `REFRESH MATERIALIZED VIEW` in a loop), idempotent under re-run
  * (`mode("overwrite")`).
  *
  * Faithfulness notes (quirks preserved on purpose):
  *   - `metrics_dataservices` names its coalesced id column `dataservice`
  *     (not `dataservice_id`) — `create_tables.sql:168`.
  *   - The monthly `dataservices`/`resources` views and their `_total` twins
  *     read the *base* visit tables, not the `metrics_*` views
  *     (`create_tables.sql:252-268,322-345`).
  *   - `site` full-outer-joins the monthly `dataservices` view but selects no
  *     column from it, and joins it on `datasets.metric_month` only
  *     (`create_tables.sql:270-293`).
  *
  * Scale design: the reference's `__id SERIAL` surrogate is replaced by a
  * deterministic arithmetic key (datecode*100000 + entity*10 + family) — no
  * global window / zipWithIndex, so base-fact construction stays an
  * embarrassingly-parallel projection at any scale. The only shuffles in the
  * whole DAG are the groupBys and the fact-fact full-outer joins on
  * (entity_id, date) — exactly the shuffles the semantics require; every
  * aggregate feeding a left join is pre-aggregated (partial map-side combine)
  * before the join.
  */
object MetricsViews {

  /** The 9 base tables the DAG reads (visit + matomo facts). */
  final case class Base(
      visitsDatasets: DataFrame,
      visitsResources: DataFrame,
      visitsOrganizations: DataFrame,
      visitsReuses: DataFrame,
      visitsDataservices: DataFrame,
      matomoDatasets: DataFrame,
      matomoReuses: DataFrame,
      matomoOrganizations: DataFrame,
      matomoDataservices: DataFrame)

  /** Refresh order — verbatim from `dgv/metrics/task.py:256-271`. */
  val materializedViews: Seq[String] = Seq(
    "metrics_datasets", "metrics_reuses", "metrics_dataservices",
    "metrics_organizations",
    "datasets", "reuses", "dataservices", "organizations", "resources",
    "site",
    "datasets_total", "reuses_total", "dataservices_total",
    "organizations_total", "resources_total")

  // ---------------------------------------------------------------------
  // Base-fact derivation from the synthetic `events` table (test harness).
  // Every formula here has a byte-identical DuckDB twin in
  // queries/MetricsQueries.baseCte, so the oracle replays the whole DAG.
  // ---------------------------------------------------------------------

  /** Deterministic surrogate `__id`: yyyymmdd*100000 + entity*10 + family.
    * Unique per (date, entity, table-family); pure arithmetic, no window. */
  private def surrogateId(dt: Column, num: Column, family: Int): Column =
    (regexp_replace(dt, "-", "").cast("long") * 100000L +
      num * 10L + family).as("__id")

  private def org(num: Column): Column = concat(lit("O"), (num % 7).cast("string"))

  /** The shared pre-aggregated event spine all 9 base facts derive from —
    * UNMATERIALIZED (exposed for plan tests; [[deriveBase]] checkpoints
    * it). Every event routes to EXACTLY ONE fact family: view/click events
    * by disjoint `event_id % 12` slice ranges (datasets ≤3, resources 4–6,
    * reuses 7–8, dataservices 9, organizations ≥10), purchase events by
    * `event_id % 4` (datasets/reuses/organizations/dataservices). So ONE
    * aggregation keyed (dt, family, num[, dnum]) — num already reduced by
    * the family's own modulus — computes all nine fact tables' counts in
    * one events pass and one shuffle whose volume is the SUM of the nine
    * facts' group counts (bounded: ≤ days × 377 groups at any corpus
    * size, and map-side combine collapses to it before the exchange —
    * guide §2.3/§2.4). The nine facts become filters of the one
    * materialized spine instead of nine separate full scans of events
    * (r16 opt: mv plans carried 9 events scans each; at 100 TB that is
    * 9 full passes → 1). */
  private[graft] def baseSpine(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts_us"), "yyyy-MM-dd").as("dt"))
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("dt"),
        col("event_type").isin("view", "click").as("__hit"),
        (col("event_id") % 12).as("__e12"),
        col("user_id").as("__u"))
    val hs = col("__e12") // visit slice (event_id % 12)
    val os = col("__e12") % 4 // outlink slice (event_id % 4; 4 divides 12)
    // Every arm is EXPLICIT — no otherwise(): a NULL or out-of-domain
    // slice (negative event_id outlink, NULL event_id) matched NONE of the
    // old per-fact filters and none of the oracle's WHERE slice = N
    // predicates, so it must fall through to a NULL family and be dropped
    // here too, never silently rerouted to the last arm.
    ev.select(col("dt"),
        when(col("__hit"),
          when(hs <= 3, lit(0)).when(hs.between(4, 6), lit(1))
            .when(hs.between(7, 8), lit(2)).when(hs === 9, lit(3))
            .when(hs >= 10, lit(4)))
          .otherwise(
            when(os === 0, lit(5)).when(os === 1, lit(6))
              .when(os === 2, lit(7)).when(os === 3, lit(8))).as("__fam"),
        when(col("__hit"),
          when(hs <= 3, col("__u") % 50)
            // resources: rnum = dnum*4 + (event_id % 4)
            .when(hs.between(4, 6), (col("__u") % 50) * 4 + col("__e12") % 4)
            .when(hs.between(7, 8), col("__u") % 30)
            .when(hs === 9, col("__u") % 10)
            .when(hs >= 10, col("__u") % 7))
          .otherwise(
            when(os === 0, col("__u") % 50).when(os === 1, col("__u") % 30)
              .when(os === 2, col("__u") % 7)
              .when(os === 3, col("__u") % 10)).as("num"),
        // resources carry the owning dataset's num separately — exact for
        // any id sign (deriving it back from rnum would floor-divide)
        when(col("__hit") && hs.between(4, 6), col("__u") % 50)
          .otherwise(lit(0L)).as("dnum"))
      .filter(col("__fam").isNotNull)
      .groupBy("dt", "__fam", "num", "dnum")
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Derive the 9 base tables from `events`: view/click events are page
    * visits routed to an entity family by `event_id % 12`; purchase events
    * are matomo outlinks routed by `event_id % 4`. All nine are FILTERS of
    * the one materialized [[baseSpine]] — its (dt, family, num) groups are
    * exactly each fact's (dt, num) groups, same counts (each event belongs
    * to one family, so no re-aggregation is even needed). */
  def deriveBase(spark: SparkSession, dir: String): Base = {
    val pre = baseSpine(spark, dir).localCheckpoint(true)

    /** One fact table = one family slice of the spine. The routing family
      * IS the surrogate-id family code (one numbering, by construction). */
    def fact(family: Int, prefix: String, idName: String,
             counter: String): DataFrame =
      pre.filter(col("__fam") === family)
        .select(
          surrogateId(col("dt"), col("num"), family),
          col("dt").as("date_metric"),
          concat(lit(prefix), col("num").cast("string")).as(idName),
          org(col("num")).as("organization_id"),
          col("__cnt").as(counter))

    // Resources carry two ids (resource + owning dataset).
    val visitsResources = pre.filter(col("__fam") === 1)
      .select(
        surrogateId(col("dt"), col("num"), 1),
        col("dt").as("date_metric"),
        concat(lit("C"), col("num").cast("string")).as("resource_id"),
        concat(lit("D"), col("dnum").cast("string")).as("dataset_id"),
        org(col("dnum")).as("organization_id"),
        col("__cnt").as("nb_visit"))

    // Organization-page visits key directly on the org id (no separate org()).
    val visitsOrganizations = pre.filter(col("__fam") === 4)
      .select(
        surrogateId(col("dt"), col("num"), 4),
        col("dt").as("date_metric"),
        concat(lit("O"), col("num").cast("string")).as("organization_id"),
        col("__cnt").as("nb_visit"))

    val matomoOrganizations = pre.filter(col("__fam") === 7)
      .select(
        surrogateId(col("dt"), col("num"), 7),
        col("dt").as("date_metric"),
        concat(lit("O"), col("num").cast("string")).as("organization_id"),
        col("__cnt").as("nb_outlink"))

    Base(
      visitsDatasets = fact(0, "D", "dataset_id", "nb_visit"),
      visitsResources = visitsResources,
      visitsOrganizations = visitsOrganizations,
      visitsReuses = fact(2, "R", "reuse_id", "nb_visit"),
      visitsDataservices = fact(3, "S", "dataservice_id", "nb_visit"),
      matomoDatasets = fact(5, "D", "dataset_id", "nb_outlink"),
      matomoReuses = fact(6, "R", "reuse_id", "nb_outlink"),
      matomoOrganizations = matomoOrganizations,
      matomoDataservices = fact(8, "S", "dataservice_id", "nb_outlink"))
  }

  // ---------------------------------------------------------------------
  // The 15 views — each a pure DataFrame transform of its upstreams.
  // ---------------------------------------------------------------------

  /** visits FULL OUTER matomo on (id, date) with COALESCE'd keys — the
    * shared shape of the four `metrics_*` views (`create_tables.sql:129-207`). */
  private def visitsOuterMatomo(visits: DataFrame, matomo: DataFrame,
                                idCol: String, outIdCol: String): DataFrame = {
    val v = visits.select(col("__id") +: visits.columns.filterNot(_ == "__id")
      .map(c => col(c).as(s"v_$c")): _*)
    val m = matomo.select(matomo.columns.filterNot(_ == "__id")
      .map(c => col(c).as(s"m_$c")): _*)
    v.join(m,
        col(s"v_$idCol") === col(s"m_$idCol") &&
          col("v_date_metric") === col("m_date_metric"), "full")
      .withColumn("date_metric", coalesce(col("v_date_metric"), col("m_date_metric")))
      .withColumn(outIdCol, coalesce(col(s"v_$idCol"), col(s"m_$idCol")))
      .withColumn("organization_id",
        coalesce(col("v_organization_id"), col("m_organization_id")))
  }

  /** `metric.metrics_datasets` (`create_tables.sql:129-150`): visits ⟗ matomo
    * plus per-(dataset, date) resource-download sums. */
  def metricsDatasets(visitsDatasets: DataFrame, matomoDatasets: DataFrame,
                      visitsResources: DataFrame): DataFrame = {
    val resources = visitsResources
      .groupBy(col("dataset_id").as("r_dataset_id"), col("date_metric").as("r_date"))
      .agg(sum("nb_visit").as("resource_nb_download"))
    visitsOuterMatomo(visitsDatasets, matomoDatasets, "dataset_id", "dataset_id")
      .join(resources,
        col("dataset_id") === col("r_dataset_id") && col("date_metric") === col("r_date"),
        "left")
      .select(col("__id"), col("date_metric"), col("dataset_id"),
        col("organization_id"), col("v_nb_visit").as("nb_visit"),
        col("m_nb_outlink").as("nb_outlink"), col("resource_nb_download"))
  }

  /** `metric.metrics_reuses` (`create_tables.sql:153-164`). */
  def metricsReuses(visitsReuses: DataFrame, matomoReuses: DataFrame): DataFrame =
    visitsOuterMatomo(visitsReuses, matomoReuses, "reuse_id", "reuse_id")
      .select(col("__id"), col("date_metric"), col("reuse_id"),
        col("organization_id"), col("v_nb_visit").as("nb_visit"),
        col("m_nb_outlink").as("nb_outlink"))

  /** `metric.metrics_dataservices` (`create_tables.sql:166-178`) — note the
    * reference names the coalesced id column `dataservice`. */
  def metricsDataservices(visitsDataservices: DataFrame,
                          matomoDataservices: DataFrame): DataFrame =
    visitsOuterMatomo(visitsDataservices, matomoDataservices,
        "dataservice_id", "dataservice")
      .select(col("__id"), col("date_metric"), col("dataservice"),
        col("organization_id"), col("v_nb_visit").as("nb_visit"),
        col("m_nb_outlink").as("nb_outlink"))

  /** `metric.metrics_organizations` (`create_tables.sql:180-207`): org visits
    * ⟗ matomo, plus per-(org, date) sums of the three upstream metrics views. */
  def metricsOrganizations(visitsOrganizations: DataFrame,
                           matomoOrganizations: DataFrame,
                           metricsDatasets: DataFrame,
                           metricsReuses: DataFrame,
                           metricsDataservices: DataFrame): DataFrame = {
    val datasets = metricsDatasets
      .groupBy(col("organization_id").as("d_org"), col("date_metric").as("d_date"))
      .agg(sum("nb_visit").as("dataset_nb_visit"),
        sum("resource_nb_download").as("resource_nb_download"))
    val reuses = metricsReuses
      .groupBy(col("organization_id").as("r_org"), col("date_metric").as("r_date"))
      .agg(sum("nb_visit").as("reuse_nb_visit"))
    val dataservices = metricsDataservices
      .groupBy(col("organization_id").as("s_org"), col("date_metric").as("s_date"))
      .agg(sum("nb_visit").as("dataservice_nb_visit"))
    visitsOuterMatomo(visitsOrganizations, matomoOrganizations,
        "organization_id", "organization_id")
      .join(datasets, col("organization_id") === col("d_org") &&
        col("date_metric") === col("d_date"), "left")
      .join(reuses, col("organization_id") === col("r_org") &&
        col("date_metric") === col("r_date"), "left")
      .join(dataservices, col("organization_id") === col("s_org") &&
        col("date_metric") === col("s_date"), "left")
      .select(col("__id"), col("date_metric"), col("organization_id"),
        col("dataset_nb_visit"), col("resource_nb_download"),
        col("reuse_nb_visit"), col("dataservice_nb_visit"),
        col("m_nb_outlink").as("nb_outlink"))
  }

  private def month(dateCol: String): Column =
    substring(col(dateCol), 1, 7).as("metric_month")

  /** `metric.datasets` monthly rollup (`create_tables.sql:210-221`). */
  def datasetsMonthly(metricsDatasets: DataFrame): DataFrame =
    metricsDatasets
      .groupBy(month("date_metric"), col("dataset_id"), col("organization_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("monthly_visit"),
        sum("resource_nb_download").as("monthly_download_resource"))
      .select("__id", "dataset_id", "organization_id", "metric_month",
        "monthly_visit", "monthly_download_resource")

  /** `metric.reuses` monthly rollup (`create_tables.sql:223-231`). */
  def reusesMonthly(metricsReuses: DataFrame): DataFrame =
    metricsReuses.groupBy(month("date_metric"), col("reuse_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("monthly_visit"))
      .select("__id", "reuse_id", "metric_month", "monthly_visit")

  /** `metric.organizations` monthly rollup (`create_tables.sql:233-244`). */
  def organizationsMonthly(metricsOrganizations: DataFrame): DataFrame =
    metricsOrganizations.groupBy(month("date_metric"), col("organization_id"))
      .agg(min("__id").as("__id"),
        sum("dataset_nb_visit").as("monthly_visit_dataset"),
        sum("resource_nb_download").as("monthly_download_resource"),
        sum("reuse_nb_visit").as("monthly_visit_reuse"),
        sum("dataservice_nb_visit").as("monthly_visit_dataservice"))
      .select("__id", "organization_id", "metric_month", "monthly_visit_dataset",
        "monthly_download_resource", "monthly_visit_reuse",
        "monthly_visit_dataservice")

  /** `metric.resources` monthly rollup — reads the *base* visits table
    * (`create_tables.sql:246-257`). */
  def resourcesMonthly(visitsResources: DataFrame): DataFrame =
    visitsResources
      .groupBy(month("date_metric"), col("resource_id"), col("dataset_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("monthly_download_resource"))
      .select("__id", "resource_id", "dataset_id", "metric_month",
        "monthly_download_resource")

  /** `metric.dataservices` monthly rollup — reads the *base* visits table
    * (`create_tables.sql:259-268`). */
  def dataservicesMonthly(visitsDataservices: DataFrame): DataFrame =
    visitsDataservices.groupBy(month("date_metric"), col("dataservice_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("monthly_visit"))
      .select("__id", "dataservice_id", "metric_month", "monthly_visit")

  /** `metric.site` global view (`create_tables.sql:270-293`): monthly dataset
    * sums ⟗ monthly reuse sums ⟗ monthly dataservice sums (the last joined on
    * the datasets key and contributing no output column — reference quirk). */
  def site(datasetsMonthly: DataFrame, reusesMonthly: DataFrame,
           dataservicesMonthly: DataFrame): DataFrame = {
    val d = datasetsMonthly.groupBy(col("metric_month").as("d_month"))
      .agg(min("__id").as("__id"), sum("monthly_visit").as("monthly_visit_dataset"),
        sum("monthly_download_resource").as("monthly_download_resource"))
    val r = reusesMonthly.groupBy(col("metric_month").as("r_month"))
      .agg(sum("monthly_visit").as("monthly_visit_reuse"))
    val s = dataservicesMonthly.groupBy(col("metric_month").as("s_month"))
      .agg(sum("monthly_visit").as("s_visit"))
    d.join(r, col("d_month") === col("r_month"), "full")
      .join(s, col("d_month") === col("s_month"), "full")
      .select(col("__id"), coalesce(col("d_month"), col("r_month")).as("metric_month"),
        col("monthly_visit_dataset"), col("monthly_download_resource"),
        col("monthly_visit_reuse"))
  }

  /** `metric.datasets_total` lifetime sums (`create_tables.sql:296-306`). */
  def datasetsTotal(metricsDatasets: DataFrame): DataFrame =
    metricsDatasets.groupBy(col("dataset_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("visit"),
        sum("nb_outlink").as("outlink"),
        sum("resource_nb_download").as("download_resource"))
      .select("__id", "dataset_id", "visit", "outlink", "download_resource")

  /** `metric.reuses_total` (`create_tables.sql:308-317`). */
  def reusesTotal(metricsReuses: DataFrame): DataFrame =
    metricsReuses.groupBy(col("reuse_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("visit"),
        sum("nb_outlink").as("outlink"))
      .select("__id", "reuse_id", "visit", "outlink")

  /** `metric.organizations_total` (`create_tables.sql:319-331`). */
  def organizationsTotal(metricsOrganizations: DataFrame): DataFrame =
    metricsOrganizations.groupBy(col("organization_id"))
      .agg(min("__id").as("__id"), sum("dataset_nb_visit").as("visit_dataset"),
        sum("resource_nb_download").as("download_resource"),
        sum("reuse_nb_visit").as("visit_reuse"),
        sum("dataservice_nb_visit").as("visit_dataservice"),
        sum("nb_outlink").as("outlink"))
      .select("__id", "organization_id", "visit_dataset", "download_resource",
        "visit_reuse", "visit_dataservice", "outlink")

  /** `metric.resources_total` — reads the base visits table
    * (`create_tables.sql:333-343`). */
  def resourcesTotal(visitsResources: DataFrame): DataFrame =
    visitsResources.groupBy(col("resource_id"), col("dataset_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("download_resource"))
      .select("__id", "resource_id", "dataset_id", "download_resource")

  /** `metric.dataservices_total` — reads the base visits table
    * (`create_tables.sql:345-353`). */
  def dataservicesTotal(visitsDataservices: DataFrame): DataFrame =
    visitsDataservices.groupBy(col("dataservice_id"))
      .agg(min("__id").as("__id"), sum("nb_visit").as("visit"))
      .select("__id", "dataservice_id", "visit")

  // ---------------------------------------------------------------------
  // Composition + materializer
  // ---------------------------------------------------------------------

  /** All 15 views composed lazily over the base tables (no materialization —
    * one Catalyst plan per view; used by the oracle-checked catalog queries). */
  def compose(base: Base): Map[String, DataFrame] = {
    val mDatasets = metricsDatasets(base.visitsDatasets, base.matomoDatasets,
      base.visitsResources)
    val mReuses = metricsReuses(base.visitsReuses, base.matomoReuses)
    val mDataservices = metricsDataservices(base.visitsDataservices,
      base.matomoDataservices)
    val mOrganizations = metricsOrganizations(base.visitsOrganizations,
      base.matomoOrganizations, mDatasets, mReuses, mDataservices)
    val dsMonthly = datasetsMonthly(mDatasets)
    val ruMonthly = reusesMonthly(mReuses)
    val svMonthly = dataservicesMonthly(base.visitsDataservices)
    Map(
      "metrics_datasets" -> mDatasets,
      "metrics_reuses" -> mReuses,
      "metrics_dataservices" -> mDataservices,
      "metrics_organizations" -> mOrganizations,
      "datasets" -> dsMonthly,
      "reuses" -> ruMonthly,
      "dataservices" -> svMonthly,
      "organizations" -> organizationsMonthly(mOrganizations),
      "resources" -> resourcesMonthly(base.visitsResources),
      "site" -> site(dsMonthly, ruMonthly, svMonthly),
      "datasets_total" -> datasetsTotal(mDatasets),
      "reuses_total" -> reusesTotal(mReuses),
      "dataservices_total" -> dataservicesTotal(base.visitsDataservices),
      "organizations_total" -> organizationsTotal(mOrganizations),
      "resources_total" -> resourcesTotal(base.visitsResources))
  }

  private def baseTables(b: Base): Seq[(String, DataFrame)] = Seq(
    "visits_datasets" -> b.visitsDatasets,
    "visits_resources" -> b.visitsResources,
    "visits_organizations" -> b.visitsOrganizations,
    "visits_reuses" -> b.visitsReuses,
    "visits_dataservices" -> b.visitsDataservices,
    "matomo_datasets" -> b.matomoDatasets,
    "matomo_reuses" -> b.matomoReuses,
    "matomo_organizations" -> b.matomoOrganizations,
    "matomo_dataservices" -> b.matomoDataservices)

  /** Load base facts partitioned by date_metric with DYNAMIC partition
    * overwrite — the reference's duplication-safety delete-day-then-reload
    * (`dgv/metrics/task.py:199-221`): re-running a day replaces exactly that
    * day's partitions and touches nothing else. Pass a Base filtered to the
    * new day(s) for the daily increment; pass the full Base for a backfill. */
  def loadBase(base: Base, outDir: String): Unit =
    baseTables(base).foreach { case (name, df) =>
      graft.sources.Writers.overwritePartitions(df, s"$outDir/$name",
        Seq("date_metric"))
    }

  /** Refresh loop (`dgv/metrics/task.py:276-283`): recompute every view from
    * the materialized base tables into `outDir/<name>` in
    * [[materializedViews]] order, each downstream view reading the parquet
    * its upstream just wrote. Idempotent overwrite. */
  def refreshViews(spark: SparkSession, outDir: String): Map[String, DataFrame] = {
    // partition values must come back as the strings the views expect
    val prev = spark.conf.getOption("spark.sql.sources.partitionColumnTypeInference.enabled")
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try refreshViews0(spark, outDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.partitionColumnTypeInference.enabled")
    }
  }

  private def refreshViews0(spark: SparkSession, outDir: String): Map[String, DataFrame] = {
    def readBase(name: String): DataFrame = spark.read.parquet(s"$outDir/$name")
    def write(name: String, df: DataFrame): DataFrame = {
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      spark.read.parquet(s"$outDir/$name")
    }
    val b = Base(
      visitsDatasets = readBase("visits_datasets"),
      visitsResources = readBase("visits_resources"),
      visitsOrganizations = readBase("visits_organizations"),
      visitsReuses = readBase("visits_reuses"),
      visitsDataservices = readBase("visits_dataservices"),
      matomoDatasets = readBase("matomo_datasets"),
      matomoReuses = readBase("matomo_reuses"),
      matomoOrganizations = readBase("matomo_organizations"),
      matomoDataservices = readBase("matomo_dataservices"))

    val done = scala.collection.mutable.Map[String, DataFrame]()
    materializedViews.foreach { name =>
      val df = name match {
        case "metrics_datasets" =>
          metricsDatasets(b.visitsDatasets, b.matomoDatasets, b.visitsResources)
        case "metrics_reuses" => metricsReuses(b.visitsReuses, b.matomoReuses)
        case "metrics_dataservices" =>
          metricsDataservices(b.visitsDataservices, b.matomoDataservices)
        case "metrics_organizations" =>
          metricsOrganizations(b.visitsOrganizations, b.matomoOrganizations,
            done("metrics_datasets"), done("metrics_reuses"),
            done("metrics_dataservices"))
        case "datasets" => datasetsMonthly(done("metrics_datasets"))
        case "reuses" => reusesMonthly(done("metrics_reuses"))
        case "dataservices" => dataservicesMonthly(b.visitsDataservices)
        case "organizations" => organizationsMonthly(done("metrics_organizations"))
        case "resources" => resourcesMonthly(b.visitsResources)
        case "site" => site(done("datasets"), done("reuses"), done("dataservices"))
        case "datasets_total" => datasetsTotal(done("metrics_datasets"))
        case "reuses_total" => reusesTotal(done("metrics_reuses"))
        case "dataservices_total" => dataservicesTotal(b.visitsDataservices)
        case "organizations_total" => organizationsTotal(done("metrics_organizations"))
        case "resources_total" => resourcesTotal(b.visitsResources)
      }
      done(name) = write(name, df)
    }
    done.toMap
  }

  /** Full backfill: load every base fact, then refresh all 15 views —
    * `loadBase` + `refreshViews`. The daily flow loads ONLY the new day's
    * Base and calls [[refreshViews]]. */
  def materialize(spark: SparkSession, base: Base, outDir: String): Map[String, DataFrame] = {
    loadBase(base, outDir)
    refreshViews(spark, outDir)
  }
}
