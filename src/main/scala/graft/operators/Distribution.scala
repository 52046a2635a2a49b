package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's price-distribution stage
  * (`dvf/explore/task_functions.py:839-896`, SURVEY §7.4.1): per group,
  * quantile bin edges computed on the DISTINCT value set (not the
  * multiset), edges rounded to a step with collision repair (a rounded
  * edge that does not exceed its predecessor is pushed one step up), then
  * a histogram over the repaired (non-uniform) bins. Groups under the
  * support threshold get a null distribution
  * (`dvf/explore/task_functions.py:1009,1069`).
  *
  * Everything is column expressions — the repair fold and the bucket
  * search run as higher-order functions on an (nBins+1)-element array per
  * GROUP (not per row), so the cost sits in the aggregation, where it
  * belongs.
  */
object Distribution {

  /** Driver-side twin of the repair fold (for tests/documentation). */
  def repairBins(bins: Seq[Double], step: Double): Seq[Double] =
    bins.foldLeft(Vector.empty[Double]) { (acc, b) =>
      val r = math.rint(b / step) * step
      acc :+ (if (acc.nonEmpty && r <= acc.last) acc.last + step else r)
    }

  /** SQL fold over a bin-edge array column: round each edge to `step`,
    * pushing collisions up one step. */
  private def repairSql(binsCol: String, step: Double): Column = expr(
    s"""aggregate($binsCol, cast(array() as array<double>),
       |  (acc, b) -> concat(acc, array(
       |    if(size(acc) > 0 AND rint(b / ${step}d) * ${step}d <= element_at(acc, -1),
       |       element_at(acc, -1) + ${step}d,
       |       rint(b / ${step}d) * ${step}d))))""".stripMargin)

  /** Per-key distribution: repaired bin edges + per-bin counts; keys with
    * fewer than `minSupport` rows keep a null distribution.
    *
    * Scale note: exact `percentile` holds one buffer of the group's DISTINCT
    * values. In the reference workload the groups are geographic units
    * (communes/EPCI/départements — many groups, each bounded), so buffers
    * stay small at any corpus size; the few-huge-groups shape (like the
    * 3-flag TPC-H demo) is where exact quantiles stop scaling and
    * `approx_percentile` or distributed selection takes over. */
  def priceDistribution(df: DataFrame, keyCols: Seq[String], valueCol: String,
                        nBins: Int = 10, step: Double = 100.0,
                        minSupport: Long = 100L): DataFrame = {
    val qs = (0 to nBins).map(i => i.toDouble / nBins).mkString("array(", ", ", ")")
    val edges = df.select((keyCols :+ valueCol).map(col): _*).distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $qs)").as("raw_edges"))
      .withColumn("edges", repairSql("raw_edges", step)).drop("raw_edges")
    val support = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    // bucket(v) = #edges (excluding the last) that are <= v, clamped to >= 1
    // — native codegen'd scan, not the CodegenFallback HOF form
    val bucket = graft.functions.BucketIndex.bucketIndex(
      col("edges"), col(valueCol), nBins)
    val counts = df.join(edges, keyCols)
      .withColumn("bucket", bucket)
      .groupBy((keyCols.map(col) :+ col("edges")): _*)
      .pivot("bucket", (1 to nBins).map(_.toString))
      .agg(count(lit(1)))
    counts.join(support, keyCols)
      .select((keyCols.map(col) :+ col("n") :+
        when(col("n") >= minSupport, col("edges")).as("edges")) ++
        (1 to nBins).map(i => when(col("n") >= minSupport,
          coalesce(col(s"$i"), lit(0L))).as(s"bin_$i")): _*)
  }
}
