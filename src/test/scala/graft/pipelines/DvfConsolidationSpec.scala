package graft.pipelines

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class DvfConsolidationSpec extends SparkSpec {
  import spark.implicits._

  test("dvf pipeline: dedup + monobien + unit price + one-shuffle multi-scale stats") {
    // TPC-H analog of the sales frame: order = mutation, lineitem = bien
    val sales = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sf())), col("c_nationkey") === col("n_nationkey"))
      .select(col("l_orderkey").as("sale_id"), col("n_name").as("code_nation"),
        col("c_mktsegment").as("code_segment"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("l_returnflag").as("type"), col("l_extendedprice").as("price"),
        col("l_quantity").as("qty"))

    val prepared = DvfStats.prepare(sales, "sale_id", "price", "qty")
    // monobien: every surviving sale_id appears exactly once
    assert(prepared.groupBy("sale_id").count().filter($"count" > 1).count() == 0)
    assert(prepared.filter($"unit_price".isNull).count() == 0)

    val stats = DvfStats.multiScaleStats(prepared,
      Seq("nation" -> "code_nation", "segment" -> "code_segment"),
      "month", "type", Seq("A", "N", "R"))
    // both scales materialize from the single melted aggregation
    val echelles = stats.select("echelle").distinct().as[String].collect().toSet
    assert(echelles == Set("nation", "segment"))
    // spot-check: summed pivoted counts at the nation scale == direct count
    val cell = stats.filter($"echelle" === "nation")
      .agg(sum(coalesce($"A_nb_ventes", lit(0L)))).head().getLong(0)
    val direct = prepared.filter($"type" === "A").count()
    assert(cell == direct, s"pivoted nation count $cell != direct $direct")
  }

  test("consolidation: schema projection, required-null drop, keep-most-recent") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("val", IntegerType),
      StructField("opt", StringType), StructField("modified", LongType)))
    val f1 = Seq(("a", 1, 10L), ("b", 2, 10L), (null, 9, 10L))
      .toDF("id", "val", "modified") // missing 'opt'
    val f2 = Seq(("a", "5", "x", 20L), ("c", "3", "y", 20L))
      .toDF("id", "val", "opt", "modified") // val as string -> cast
      .withColumn("extra", lit("dropme"))
    val out = Consolidation.consolidate(Seq(f1, f2), schema,
        requiredCols = Seq("id", "val"), primaryKey = Seq("id"), recencyCol = "modified")
      .as[(String, Int, Option[String], Long)].collect().toSet
    assert(out == Set(("a", 5, Some("x"), 20L), ("b", 2, None, 10L), ("c", 3, Some("y"), 20L)))
  }
}
