package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Distribution, Relational}

/** The reference's flagship analytical pipeline — DVF real-estate stats
  * (`dvf/explore/task_functions.py:416-827`, SURVEY §3.1) — as one lazy
  * Spark plan over a generic sales frame:
  *
  *  1. exact-duplicate removal (the raw files carry 4–8% dups, `:466`)
  *  2. keep single-item transactions ("monobien" semi-join, `:507-511`)
  *  3. unit price with divide-by-zero/inf cleanup (`:519-527`)
  *  4. MULTI-SCALE stats: the reference loops one aggregation per
  *     geographic level; here the frame is melted to (echelle, code_geo)
  *     with `stack`, so ALL levels aggregate in ONE shuffle
  *  5. count/avg/exact-median per (echelle, code_geo, month, type), pivoted
  *     wide per type (`:543-616`)
  *  6. price distributions with support threshold (`:831-1124`) via
  *     [[Distribution]]
  *
  * Input columns: saleId, levels (name -> geo-code column), month, type,
  * price, qty.
  */
object DvfStats {

  /** Stages 1–3: dedup, monobien, unit price.
    *
    * One exchange serves the whole chain (r15 opt, guide §2.4): the
    * frame is clustered by sale id up front, and every downstream
    * requirement is a SUPERSET-compatible clustering — the full-row
    * distinct (ClusteredDistribution over all columns is satisfied by the
    * sale-id hash layout), the monobien count (exact key), and the
    * caller's sale-id equi-join. Unkeyed `dropDuplicates` used to shuffle
    * on all columns, the count on sale id, and the join again — three
    * exchanges of the fact frame for one. The keyless `repartition(col)`
    * stays AQE-coalescible (scale-adaptive), and a coalesced read keeps
    * the clustering property, so the elision holds at any size. */
  def prepare(sales: DataFrame, saleIdCol: String, priceCol: String,
              qtyCol: String): DataFrame = {
    val clustered = sales.repartition(col(saleIdCol))
    val deduped = clustered.dropDuplicates()
    val mono = Relational.keepKeysWithCount(deduped, saleIdCol, 1L)
    mono.withColumn("unit_price",
      when(col(qtyCol) =!= 0.0, col(priceCol) / col(qtyCol)))
      .filter(col("unit_price").isNotNull)
  }

  /** Stage-4 melt on its own: (echelle, code_geo, month, type, unit_price)
    * rows for EVERY geographic level at once — one stack projection, so all
    * scales aggregate in a single downstream shuffle. Shared by
    * [[multiScaleStats]] and callers that need exact (oracle-parity)
    * measures over the same melt. */
  def multiScaleMelt(prepared: DataFrame, levels: Seq[(String, String)],
                     monthCol: String, typeCol: String): DataFrame = {
    val stackExpr = levels.map { case (name, c) =>
      s"'${name.replace("'", "\\'")}', `${c.replace("`", "``")}`"
    }.mkString(", ")
    prepared.selectExpr(
      s"stack(${levels.size}, $stackExpr) as (echelle, code_geo)",
      s"`$monthCol` as month", s"`$typeCol` as type", "unit_price")
  }

  /** Stages 4–5: melt geography levels then aggregate every scale in one
    * pass; wide per-type columns. */
  def multiScaleStats(prepared: DataFrame, levels: Seq[(String, String)],
                      monthCol: String, typeCol: String,
                      types: Seq[String]): DataFrame = {
    val melted = multiScaleMelt(prepared, levels, monthCol, typeCol)
      // exact ⌊·100⌋ cents: the mean runs as an exact long sum (partition
      // order — and Spark task retries — cannot change it) and one final
      // deterministic division; median of longs interpolates exactly.
      // A raw double avg() here would be retry-nondeterministic at scale.
      .withColumn("__cents", floor(col("unit_price") * lit(100.0)).cast("long"))
    val stats = melted.groupBy("echelle", "code_geo", "month", "type")
      .agg(count(lit(1)).as("nb"),
        (sum("__cents").cast("double") / (count(lit(1)) * 100)).as("moy"),
        (median(col("__cents").cast("double")) / 100.0).as("med"))
    stats.groupBy("echelle", "code_geo", "month")
      .pivot("type", types)
      .agg(first("nb").as("nb_ventes"), first("moy").as("prix_moyen"),
        first("med").as("prix_median"))
  }

  /** Stage 6: per-(finest level, type) price distributions. */
  def distributions(prepared: DataFrame, geoCol: String, typeCol: String,
                    minSupport: Long = 100L): DataFrame =
    Distribution.priceDistribution(
      prepared.select(col(geoCol), col(typeCol), col("unit_price")),
      Seq(geoCol, typeCol), "unit_price", minSupport = minSupport)
}
