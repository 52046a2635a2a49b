package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, CorpusQueries, ExtraQueries, FunctionQueries, GeoQueries, GraphQueries, IrQueries, LlmQueries, MetricsQueries, Q, RelationalQueries, SketchQueries, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query, each paired with its DuckDB oracle.
    * private[graft]: EntrySpec audits the raw Seq for name collisions —
    * `queries`' .toMap would silently shadow a duplicated name. */
  private[graft] def catalog: Seq[Q] =
    RelationalQueries.all ++ FunctionQueries.all ++ LlmQueries.all ++
      CorpusQueries.all ++ ExtraQueries.all ++ GeoQueries.all ++
      MetricsQueries.all ++ SourceQueries.all ++ IrQueries.all ++
      SketchQueries.all ++ GraphQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * DVF-style multi-scale monthly stats: lineitem×orders×customer×nation×
    * region, monthly revenue/count/median at (region, nation) rollup grains —
    * the reference's A1+A4 shape (`dvf/explore/task_functions.py:452-588`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val l = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("l_extendedprice"), col("l_discount"))
      .createOrReplaceTempView("v_flagship")
    // ROLLUP via SQL: one Expand+shuffle produces all three grains at once
    // (referencing rollup grouping columns post-agg via the DataFrame API
    // trips Spark's ambiguous-self-join detector).
    spark.sql(
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COALESCE(month, 'ALL') AS month, COUNT(*) AS n_sales,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  ROUND(MEDIAN(l_extendedprice), 2) AS median_price
        |FROM v_flagship
        |GROUP BY ROLLUP(r_name, n_name, month)
        |ORDER BY region, nation, month""".stripMargin)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Untimed preparation steps (see [[graft.queries.Q.setup]]): Bench runs
    * a query's setup before its timed window so incremental-work queries
    * are timed on the increment, not on building the persisted artifact
    * their premise assumes. Results never depend on setup having run. */
  def setups: Map[String, (SparkSession, String) => Unit] =
    catalog.flatMap(q => q.setup.map(q.name -> _)).toMap
}
