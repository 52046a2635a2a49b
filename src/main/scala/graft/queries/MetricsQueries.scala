package graft.queries

import org.apache.spark.sql.functions._

import graft.pipelines.MetricsViews

/** Catalog entries exercising the 15-matview metrics DAG
  * ([[graft.pipelines.MetricsViews]]) end-to-end against a DuckDB oracle that
  * replays the *entire* DAG as one WITH-chain: base-fact derivation from
  * `events` → the four `metrics_*` full-outer views → monthly rollups →
  * lifetime totals → the global `site` view.
  *
  * Both engines derive the base visit/matomo facts with byte-identical
  * arithmetic (see `MetricsViews.deriveBase`), so every COALESCE/NULL path of
  * the reference SQL (`dgv/metrics/sql/create_tables.sql:125-345`) is
  * engine-vs-engine verified, not just shape-tested.
  */
object MetricsQueries {

  /** DuckDB twin of `MetricsViews.deriveBase`: same slices, same moduli, same
    * arithmetic surrogate `__id` (yyyymmdd*100000 + entity*10 + family). */
  private def baseFact(name: String, src: String, cond: String, prefix: String,
                       modulus: Int, idName: String, family: Int,
                       counter: String): String =
    s"""$name AS (
       |  SELECT CAST(REPLACE(dt,'-','') AS BIGINT)*100000 + num*10 + $family AS __id,
       |         dt AS date_metric, '$prefix' || CAST(num AS VARCHAR) AS $idName,
       |         'O' || CAST(num % 7 AS VARCHAR) AS organization_id,
       |         COUNT(*) AS $counter
       |  FROM (SELECT dt, user_id % $modulus AS num FROM $src WHERE $cond) t
       |  GROUP BY dt, num)""".stripMargin

  private val baseCte: String =
    s"""ev AS (SELECT event_id, user_id, event_type,
       |         strftime(ts::TIMESTAMP, '%Y-%m-%d') AS dt FROM events),
       |hits AS (SELECT event_id, user_id, event_id % 12 AS slice, dt
       |         FROM ev WHERE event_type IN ('view','click')),
       |outl AS (SELECT event_id, user_id, event_id % 4 AS slice, dt
       |         FROM ev WHERE event_type = 'purchase'),
       |${baseFact("visits_datasets", "hits", "slice <= 3", "D", 50, "dataset_id", 0, "nb_visit")},
       |visits_resources AS (
       |  SELECT CAST(REPLACE(dt,'-','') AS BIGINT)*100000 + rnum*10 + 1 AS __id,
       |         dt AS date_metric, 'C' || CAST(rnum AS VARCHAR) AS resource_id,
       |         'D' || CAST(dnum AS VARCHAR) AS dataset_id,
       |         'O' || CAST(dnum % 7 AS VARCHAR) AS organization_id,
       |         COUNT(*) AS nb_visit
       |  FROM (SELECT dt, user_id % 50 AS dnum, (user_id % 50)*4 + event_id % 4 AS rnum
       |        FROM hits WHERE slice BETWEEN 4 AND 6) t
       |  GROUP BY dt, dnum, rnum),
       |visits_organizations AS (
       |  SELECT CAST(REPLACE(dt,'-','') AS BIGINT)*100000 + num*10 + 4 AS __id,
       |         dt AS date_metric, 'O' || CAST(num AS VARCHAR) AS organization_id,
       |         COUNT(*) AS nb_visit
       |  FROM (SELECT dt, user_id % 7 AS num FROM hits WHERE slice >= 10) t
       |  GROUP BY dt, num),
       |${baseFact("visits_reuses", "hits", "slice BETWEEN 7 AND 8", "R", 30, "reuse_id", 2, "nb_visit")},
       |${baseFact("visits_dataservices", "hits", "slice = 9", "S", 10, "dataservice_id", 3, "nb_visit")},
       |${baseFact("matomo_datasets", "outl", "slice = 0", "D", 50, "dataset_id", 5, "nb_outlink")},
       |${baseFact("matomo_reuses", "outl", "slice = 1", "R", 30, "reuse_id", 6, "nb_outlink")},
       |matomo_organizations AS (
       |  SELECT CAST(REPLACE(dt,'-','') AS BIGINT)*100000 + num*10 + 7 AS __id,
       |         dt AS date_metric, 'O' || CAST(num AS VARCHAR) AS organization_id,
       |         COUNT(*) AS nb_outlink
       |  FROM (SELECT dt, user_id % 7 AS num FROM outl WHERE slice = 2) t
       |  GROUP BY dt, num),
       |${baseFact("matomo_dataservices", "outl", "slice = 3", "S", 10, "dataservice_id", 8, "nb_outlink")}""".stripMargin

  /** DuckDB twin of the 15 view definitions (`create_tables.sql:125-345`). */
  private val viewsCte: String =
    """metrics_datasets AS (
      |  SELECT v.__id AS __id,
      |         COALESCE(v.date_metric, m.date_metric) AS date_metric,
      |         COALESCE(v.dataset_id, m.dataset_id) AS dataset_id,
      |         COALESCE(v.organization_id, m.organization_id) AS organization_id,
      |         v.nb_visit AS nb_visit, m.nb_outlink AS nb_outlink,
      |         r.nb_visit AS resource_nb_download
      |  FROM visits_datasets v
      |  FULL JOIN matomo_datasets m
      |    ON v.dataset_id = m.dataset_id AND v.date_metric = m.date_metric
      |  LEFT JOIN (SELECT dataset_id, date_metric,
      |               CAST(SUM(nb_visit) AS BIGINT) AS nb_visit
      |             FROM visits_resources GROUP BY 1, 2) r
      |    ON COALESCE(v.dataset_id, m.dataset_id) = r.dataset_id AND
      |       COALESCE(v.date_metric, m.date_metric) = r.date_metric),
      |metrics_reuses AS (
      |  SELECT v.__id AS __id,
      |         COALESCE(v.date_metric, m.date_metric) AS date_metric,
      |         COALESCE(v.reuse_id, m.reuse_id) AS reuse_id,
      |         COALESCE(v.organization_id, m.organization_id) AS organization_id,
      |         v.nb_visit AS nb_visit, m.nb_outlink AS nb_outlink
      |  FROM visits_reuses v
      |  FULL JOIN matomo_reuses m
      |    ON v.reuse_id = m.reuse_id AND v.date_metric = m.date_metric),
      |metrics_dataservices AS (
      |  SELECT v.__id AS __id,
      |         COALESCE(v.date_metric, m.date_metric) AS date_metric,
      |         COALESCE(v.dataservice_id, m.dataservice_id) AS dataservice,
      |         COALESCE(v.organization_id, m.organization_id) AS organization_id,
      |         v.nb_visit AS nb_visit, m.nb_outlink AS nb_outlink
      |  FROM visits_dataservices v
      |  FULL JOIN matomo_dataservices m
      |    ON v.dataservice_id = m.dataservice_id AND v.date_metric = m.date_metric),
      |metrics_organizations AS (
      |  SELECT v.__id AS __id,
      |         COALESCE(v.date_metric, m.date_metric) AS date_metric,
      |         COALESCE(v.organization_id, m.organization_id) AS organization_id,
      |         d.nb_visit AS dataset_nb_visit,
      |         d.resource_nb_download AS resource_nb_download,
      |         r.nb_visit AS reuse_nb_visit,
      |         s.nb_visit AS dataservice_nb_visit,
      |         m.nb_outlink AS nb_outlink
      |  FROM visits_organizations v
      |  FULL JOIN matomo_organizations m
      |    ON v.organization_id = m.organization_id AND v.date_metric = m.date_metric
      |  LEFT JOIN (SELECT organization_id, date_metric,
      |               CAST(SUM(nb_visit) AS BIGINT) AS nb_visit,
      |               CAST(SUM(resource_nb_download) AS BIGINT) AS resource_nb_download
      |             FROM metrics_datasets GROUP BY 1, 2) d
      |    ON COALESCE(v.organization_id, m.organization_id) = d.organization_id AND
      |       COALESCE(v.date_metric, m.date_metric) = d.date_metric
      |  LEFT JOIN (SELECT organization_id, date_metric,
      |               CAST(SUM(nb_visit) AS BIGINT) AS nb_visit
      |             FROM metrics_reuses GROUP BY 1, 2) r
      |    ON COALESCE(v.organization_id, m.organization_id) = r.organization_id AND
      |       COALESCE(v.date_metric, m.date_metric) = r.date_metric
      |  LEFT JOIN (SELECT organization_id, date_metric,
      |               CAST(SUM(nb_visit) AS BIGINT) AS nb_visit
      |             FROM metrics_dataservices GROUP BY 1, 2) s
      |    ON COALESCE(v.organization_id, m.organization_id) = s.organization_id AND
      |       COALESCE(v.date_metric, m.date_metric) = s.date_metric),
      |datasets AS (
      |  SELECT MIN(__id) AS __id, dataset_id, organization_id,
      |         substr(date_metric, 1, 7) AS metric_month,
      |         CAST(SUM(nb_visit) AS BIGINT) AS monthly_visit,
      |         CAST(SUM(resource_nb_download) AS BIGINT) AS monthly_download_resource
      |  FROM metrics_datasets GROUP BY metric_month, dataset_id, organization_id),
      |reuses AS (
      |  SELECT MIN(__id) AS __id, reuse_id,
      |         substr(date_metric, 1, 7) AS metric_month,
      |         CAST(SUM(nb_visit) AS BIGINT) AS monthly_visit
      |  FROM metrics_reuses GROUP BY metric_month, reuse_id),
      |organizations AS (
      |  SELECT MIN(__id) AS __id, organization_id,
      |         substr(date_metric, 1, 7) AS metric_month,
      |         CAST(SUM(dataset_nb_visit) AS BIGINT) AS monthly_visit_dataset,
      |         CAST(SUM(resource_nb_download) AS BIGINT) AS monthly_download_resource,
      |         CAST(SUM(reuse_nb_visit) AS BIGINT) AS monthly_visit_reuse,
      |         CAST(SUM(dataservice_nb_visit) AS BIGINT) AS monthly_visit_dataservice
      |  FROM metrics_organizations GROUP BY metric_month, organization_id),
      |resources AS (
      |  SELECT MIN(__id) AS __id, resource_id, dataset_id,
      |         substr(date_metric, 1, 7) AS metric_month,
      |         CAST(SUM(nb_visit) AS BIGINT) AS monthly_download_resource
      |  FROM visits_resources GROUP BY metric_month, resource_id, dataset_id),
      |dataservices AS (
      |  SELECT MIN(__id) AS __id, dataservice_id,
      |         substr(date_metric, 1, 7) AS metric_month,
      |         CAST(SUM(nb_visit) AS BIGINT) AS monthly_visit
      |  FROM visits_dataservices GROUP BY metric_month, dataservice_id),
      |site AS (
      |  SELECT d.__id AS __id,
      |         COALESCE(d.metric_month, r.metric_month) AS metric_month,
      |         d.monthly_visit AS monthly_visit_dataset,
      |         d.monthly_download_resource AS monthly_download_resource,
      |         r.monthly_visit AS monthly_visit_reuse
      |  FROM (SELECT MIN(__id) AS __id, metric_month,
      |          CAST(SUM(monthly_visit) AS BIGINT) AS monthly_visit,
      |          CAST(SUM(monthly_download_resource) AS BIGINT) AS monthly_download_resource
      |        FROM datasets GROUP BY metric_month) d
      |  FULL JOIN (SELECT metric_month,
      |          CAST(SUM(monthly_visit) AS BIGINT) AS monthly_visit
      |        FROM reuses GROUP BY metric_month) r
      |    ON d.metric_month = r.metric_month
      |  FULL JOIN (SELECT metric_month,
      |          CAST(SUM(monthly_visit) AS BIGINT) AS monthly_visit
      |        FROM dataservices GROUP BY metric_month) s
      |    ON d.metric_month = s.metric_month),
      |organizations_total AS (
      |  SELECT MIN(__id) AS __id, organization_id,
      |         CAST(SUM(dataset_nb_visit) AS BIGINT) AS visit_dataset,
      |         CAST(SUM(resource_nb_download) AS BIGINT) AS download_resource,
      |         CAST(SUM(reuse_nb_visit) AS BIGINT) AS visit_reuse,
      |         CAST(SUM(dataservice_nb_visit) AS BIGINT) AS visit_dataservice,
      |         CAST(SUM(nb_outlink) AS BIGINT) AS outlink
      |  FROM metrics_organizations GROUP BY organization_id),
      |resources_total AS (
      |  SELECT MIN(__id) AS __id, resource_id, dataset_id,
      |         CAST(SUM(nb_visit) AS BIGINT) AS download_resource
      |  FROM visits_resources GROUP BY resource_id, dataset_id),
      |datasets_total AS (
      |  SELECT MIN(__id) AS __id, dataset_id,
      |         CAST(SUM(nb_visit) AS BIGINT) AS visit,
      |         CAST(SUM(nb_outlink) AS BIGINT) AS outlink,
      |         CAST(SUM(resource_nb_download) AS BIGINT) AS download_resource
      |  FROM metrics_datasets GROUP BY dataset_id),
      |reuses_total AS (
      |  SELECT MIN(__id) AS __id, reuse_id,
      |         CAST(SUM(nb_visit) AS BIGINT) AS visit,
      |         CAST(SUM(nb_outlink) AS BIGINT) AS outlink
      |  FROM metrics_reuses GROUP BY reuse_id),
      |dataservices_total AS (
      |  SELECT MIN(__id) AS __id, dataservice_id,
      |         CAST(SUM(nb_visit) AS BIGINT) AS visit
      |  FROM visits_dataservices GROUP BY dataservice_id)""".stripMargin

  private def oracle(finalSelect: String): String =
    s"WITH $baseCte,\n$viewsCte\n$finalSelect"

  /** Catalog entry selecting one composed view with a deterministic
    * unique-tiebreak ORDER BY applied identically on both engines. */
  private def view(qName: String, viewName: String, order: String*): Q =
    Q(qName,
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views(viewName).orderBy(order.head, order.tail: _*)
      },
      Some(oracle(
        s"SELECT * FROM $viewName ORDER BY ${order.mkString(", ")}")))

  val all: Seq[Q] = Seq(
    Q("mv1_metrics_datasets",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("metrics_datasets").orderBy("date_metric", "dataset_id")
      },
      Some(oracle(
        "SELECT * FROM metrics_datasets ORDER BY date_metric, dataset_id"))),

    Q("mv2_metrics_organizations",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("metrics_organizations").orderBy("date_metric", "organization_id")
      },
      Some(oracle(
        "SELECT * FROM metrics_organizations ORDER BY date_metric, organization_id"))),

    Q("mv3_datasets_monthly",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("datasets").orderBy("metric_month", "dataset_id")
      },
      Some(oracle(
        "SELECT * FROM datasets ORDER BY metric_month, dataset_id"))),

    Q("mv4_site",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("site").orderBy("metric_month")
      },
      Some(oracle("SELECT * FROM site ORDER BY metric_month"))),

    Q("mv5_organizations_total",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("organizations_total").orderBy("organization_id")
      },
      Some(oracle(
        "SELECT * FROM organizations_total ORDER BY organization_id"))),

    Q("mv6_resources_total",
      (s, d) => {
        val views = MetricsViews.compose(MetricsViews.deriveBase(s, d))
        views("resources_total").orderBy("resource_id", "dataset_id")
      },
      Some(oracle(
        "SELECT * FROM resources_total ORDER BY resource_id, dataset_id"))),

    view("mv7_metrics_reuses", "metrics_reuses", "date_metric", "reuse_id"),
    view("mv8_metrics_dataservices", "metrics_dataservices",
      "date_metric", "dataservice"),
    view("mv9_reuses_monthly", "reuses", "metric_month", "reuse_id"),
    view("mv10_organizations_monthly", "organizations",
      "metric_month", "organization_id"),
    view("mv11_resources_monthly", "resources",
      "metric_month", "resource_id", "dataset_id"),
    view("mv12_dataservices_monthly", "dataservices",
      "metric_month", "dataservice_id"),
    view("mv13_datasets_total", "datasets_total", "dataset_id"),
    view("mv14_reuses_total", "reuses_total", "reuse_id"),
    view("mv15_dataservices_total", "dataservices_total", "dataservice_id"),

    // ——— §3.2 log-metrics flagship spine in ONE gated query ———————
    // Raw HAProxy-style lines (synthesized deterministically from events
    // on BOTH engines — date + method/path by event moduli + status code —
    // and landed as TEXT files by a memoized distributed write, so the
    // timed plan parses a raw log SCAN exactly like production §3.2; an
    // inline line-generator would instead be re-inlined into every pushed
    // regex predicate, rebuilding the line per pattern — measured 3.2 s vs
    // 0.3 s on 100k lines) → LogMetrics.parse (ordered first-match-wins
    // regex table, 2xx/3xx filter) → conditional-count pivot per (date,
    // entity, slug) → broadcast catalog join with the prefer-unarchived-
    // then-most-recent dedup rule (catalog from range(): 3 variants per
    // slug so BOTH rule levels decide winners) → monthly rollup.
    // Previously this glue was ScalaTest-only (r12 verdict item 3); now
    // any regression in pipelines/LogMetrics.scala fails the driver's
    // hash gate. Scale: parse is one codegen'd projection over the line
    // scan, the pivot is the only data-sized shuffle, the catalog is
    // broadcast.
    Q("log1_end_to_end",
      (s, d) => {
        import graft.pipelines.LogMetrics
        val lines = graft.sources.Readers.rawLines(s, log1Fixture(s, d))
        val slugs = s.range(0, 50)
          .select(concat(lit("D"), col("id").cast("string")).as("slug"),
            col("id").as("num"))
          .unionByName(s.range(0, 7)
            .select(concat(lit("O"), col("id").cast("string")).as("slug"),
              col("id").as("num")))
          .unionByName(s.range(0, 40)
            .select(concat(lit("r-"), col("id").cast("string")).as("slug"),
              col("id").as("num")))
        val catalog = slugs
          .select(col("slug"), col("num"),
            explode(array(lit(0), lit(1), lit(2))).as("v"))
          .select(col("slug"),
            concat(col("slug"), lit("-v"), col("v").cast("string")).as("id"),
            when(col("v") === 0, lit(true))
              .when(col("v") === 1, lit(false))
              .otherwise(col("num") % 3 === 0).as("archived"),
            concat(lit("2024-01-1"), col("v").cast("string")).as("created"))
        val segs = Seq("fr", "direct", "api")
        val counters = segs.map(sg => s"nb_visit_$sg") :+ "nb_visit_total"
        val daily = LogMetrics.joinCatalog(
          LogMetrics.aggregate(LogMetrics.parse(lines), segs), catalog)
        LogMetrics.monthlyRollup(daily, counters, extraKeys = Seq("id"))
          .orderBy("month", "entity_type", "slug")
      },
      Some(
        """WITH ev AS (SELECT event_id, user_id,
          |       strftime(ts::TIMESTAMP, '%Y-%m-%d') AS dt FROM events),
          |lines AS (SELECT dt || ' web1 ' ||
          |    CASE
          |      WHEN event_id % 10 = 0 THEN 'GET /fr/datasets/r/r-' || (user_id % 40)
          |      WHEN event_id % 10 = 1 THEN 'GET /datasets/r/r-' || (user_id % 40)
          |      WHEN event_id % 10 = 2 THEN 'GET /api/1/datasets/D' || (user_id % 50) || '/'
          |      WHEN event_id % 10 IN (3, 4) THEN 'GET /fr/datasets/D' || (user_id % 50)
          |      WHEN event_id % 10 = 5 THEN 'GET /datasets/D' || (user_id % 50)
          |      WHEN event_id % 10 = 6 THEN 'GET /fr/organizations/O' || (user_id % 7)
          |      WHEN event_id % 10 = 7 THEN 'GET /organizations/O' || (user_id % 7)
          |      ELSE 'GET /static/style.css' END
          |    || ' ' || CASE WHEN event_id % 11 = 0 THEN 404
          |                   WHEN event_id % 7 = 0 THEN 301 ELSE 200 END
          |    || ' +0' AS value
          |  FROM ev),
          |p AS (SELECT regexp_extract(value, '^(\d{4}-\d{2}-\d{2})', 1) AS date,
          |   CAST(regexp_extract(value, ' (\d{3}) \+', 1) AS INTEGER) AS status,
          |   regexp_extract(value, 'GET /fr/datasets/r/([\w-]+)', 1) AS m1,
          |   regexp_extract(value, 'GET /datasets/r/([\w-]+)', 1) AS m2,
          |   regexp_extract(value, 'GET /api/[12]/datasets/([\w-]+)/', 1) AS m3,
          |   regexp_extract(value, 'GET /fr/datasets/([\w-]+)', 1) AS m4,
          |   regexp_extract(value, 'GET /datasets/([\w-]+)', 1) AS m5,
          |   regexp_extract(value, 'GET /fr/organizations/([\w-]+)', 1) AS m6,
          |   regexp_extract(value, 'GET /organizations/([\w-]+)', 1) AS m7
          | FROM lines),
          |hits AS (SELECT date,
          |   CASE WHEN m1 <> '' THEN 'resources' WHEN m2 <> '' THEN 'resources'
          |        WHEN m3 <> '' THEN 'datasets' WHEN m4 <> '' THEN 'datasets'
          |        WHEN m5 <> '' THEN 'datasets' WHEN m6 <> '' THEN 'organizations'
          |        WHEN m7 <> '' THEN 'organizations' END AS entity_type,
          |   CASE WHEN m1 <> '' THEN m1 WHEN m2 <> '' THEN m2
          |        WHEN m3 <> '' THEN m3 WHEN m4 <> '' THEN m4
          |        WHEN m5 <> '' THEN m5 WHEN m6 <> '' THEN m6
          |        WHEN m7 <> '' THEN m7 END AS slug,
          |   CASE WHEN m1 <> '' THEN 'fr' WHEN m2 <> '' THEN 'direct'
          |        WHEN m3 <> '' THEN 'api' WHEN m4 <> '' THEN 'fr'
          |        WHEN m5 <> '' THEN 'direct' WHEN m6 <> '' THEN 'fr'
          |        WHEN m7 <> '' THEN 'direct' END AS segment
          | FROM p WHERE status BETWEEN 200 AND 399 AND date <> ''),
          |daily AS (SELECT date, entity_type, slug,
          |   CAST(SUM(CASE WHEN segment = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
          |     AS nb_visit_fr,
          |   CAST(SUM(CASE WHEN segment = 'direct' THEN 1 ELSE 0 END) AS BIGINT)
          |     AS nb_visit_direct,
          |   CAST(SUM(CASE WHEN segment = 'api' THEN 1 ELSE 0 END) AS BIGINT)
          |     AS nb_visit_api,
          |   COUNT(*) AS nb_visit_total
          | FROM hits WHERE entity_type IS NOT NULL GROUP BY 1, 2, 3),
          |slugs AS (SELECT 'D' || r AS slug, r AS num FROM range(0, 50) t(r)
          |   UNION ALL SELECT 'O' || r, r FROM range(0, 7) t(r)
          |   UNION ALL SELECT 'r-' || r, r FROM range(0, 40) t(r)),
          |cat AS (SELECT slug, slug || '-v' || v AS id,
          |   CASE WHEN v = 0 THEN TRUE WHEN v = 1 THEN FALSE
          |        ELSE num % 3 = 0 END AS archived,
          |   '2024-01-1' || v AS created
          | FROM slugs CROSS JOIN (VALUES (0), (1), (2)) vv(v)),
          |catd AS (SELECT slug, id FROM (SELECT slug, id, row_number() OVER
          |   (PARTITION BY slug ORDER BY archived ASC, created DESC) AS rn
          |   FROM cat) WHERE rn = 1),
          |j AS (SELECT d.*, c.id FROM daily d LEFT JOIN catd c USING (slug))
          |SELECT substr(date, 1, 7) AS month, entity_type, slug, id,
          |  CAST(SUM(nb_visit_fr) AS BIGINT) AS nb_visit_fr,
          |  CAST(SUM(nb_visit_direct) AS BIGINT) AS nb_visit_direct,
          |  CAST(SUM(nb_visit_api) AS BIGINT) AS nb_visit_api,
          |  CAST(SUM(nb_visit_total) AS BIGINT) AS nb_visit_total
          |FROM j GROUP BY 1, 2, 3, 4
          |ORDER BY month, entity_type, slug""".stripMargin),
      setup = Some((s, d) => { log1Fixture(s, d); () })))

  /** Synthesized raw-log TEXT fixture for log1 — one line per event, every
    * byte a pure function of integer event fields (the oracle rebuilds the
    * identical strings in SQL). Distributed write (never a driver
    * collect), memoized per (sfDir) and pre-warmed by Bench's untimed
    * setup; the query fn builds it on first call so Verify needs no
    * setup. */
  private val log1Memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def log1Fixture(s: org.apache.spark.sql.SparkSession,
                          d: String): String =
    log1Memo.computeIfAbsent(d, { _ =>
      val safe = d.replaceAll("[^A-Za-z0-9.]", "_")
      val out = s"${sys.props("java.io.tmpdir")}/graft-log1-$safe"
      val ev = graft.Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        date_format(col("ts_us"), "yyyy-MM-dd").as("dt"))
      val p = col("event_id") % 10
      val dnum = (col("user_id") % 50).cast("string")
      val onum = (col("user_id") % 7).cast("string")
      val rs = concat(lit("r-"), (col("user_id") % 40).cast("string"))
      val path = when(p === 0, concat(lit("GET /fr/datasets/r/"), rs))
        .when(p === 1, concat(lit("GET /datasets/r/"), rs))
        .when(p === 2, concat(lit("GET /api/1/datasets/D"), dnum, lit("/")))
        .when(p === 3 || p === 4, concat(lit("GET /fr/datasets/D"), dnum))
        .when(p === 5, concat(lit("GET /datasets/D"), dnum))
        .when(p === 6, concat(lit("GET /fr/organizations/O"), onum))
        .when(p === 7, concat(lit("GET /organizations/O"), onum))
        .otherwise(lit("GET /static/style.css"))
      val st = when(col("event_id") % 11 === 0, lit(404))
        .when(col("event_id") % 7 === 0, lit(301))
        .otherwise(lit(200)).cast("string")
      ev.select(concat(col("dt"), lit(" web1 "), path,
          lit(" "), st, lit(" +0")).as("value"))
        .write.mode("overwrite").text(out)
      out
    })
}
