package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The auto-routed quantile envelope of `Distribution.priceDistribution`:
  * the operator itself must pick buffered `percentile` vs the distributed
  * two-pass selection from the measured max per-key distinct-value count —
  * and the two routes must produce IDENTICAL rows (the engines are
  * bit-identical, so routing may change only the memory envelope).
  */
class DistributionRoutingSpec extends SparkSpec {
  import spark.implicits._

  // Two keys with very different distinct-value counts, values with ties,
  // spread over several partitions.
  private def data: DataFrame = (0 until 6000).map { i =>
    val k = s"g${i % 2}"
    val dept = i % 3
    val v = if (i % 2 == 0) ((i * 48271L) % 401).toDouble * 25.0
            else ((i * 16807L) % 89).toDouble * 25.0
    (k, dept, v)
  }.toDF("k", "dept", "v").repartition(11)

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq
      .map(r => r.schema.fieldNames.sorted.toSeq.map(f => r.getAs[Any](f)))
      .sortBy(_.mkString("|"))

  test("forced distributed route matches the buffered route bit-for-bit") {
    val buffered = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = Long.MaxValue)
    val routed = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = 1L) // every group exceeds 1 distinct value
    assert(rowsOf(routed) === rowsOf(buffered))
  }

  test("multi-column keys route identically") {
    val buffered = Distribution.priceDistribution(
      data, Seq("k", "dept"), "v", nBins = 3, step = 50.0, minSupport = 5L,
      maxBufferedNdv = Long.MaxValue)
    val routed = Distribution.priceDistribution(
      data, Seq("k", "dept"), "v", nBins = 3, step = 50.0, minSupport = 5L,
      maxBufferedNdv = 1L)
    assert(rowsOf(routed) === rowsOf(buffered))
  }

  test("default threshold keeps the small-groups shape on the buffered plan") {
    // Sanity of the signal itself: max NDV here is ~401 << the 1M default,
    // so the default call must equal the explicitly-buffered call (and, per
    // the tests above, the routed one — the property is total agreement).
    val default = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L)
    val buffered = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = Long.MaxValue)
    assert(rowsOf(default) === rowsOf(buffered))
  }

  test("mixed shape routes per key: huge keys distributed, the rest buffered") {
    // g0 has ~401 distinct values, g1 ~89: threshold 200 sends ONLY g0
    // through distributed selection; result must still equal all-buffered
    val mixed = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = 200L)
    val buffered = Distribution.priceDistribution(
      data, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = Long.MaxValue)
    assert(rowsOf(mixed) === rowsOf(buffered))
  }

  test("all-null-value keys keep their null distribution on every route") {
    val withNullKey = data.unionByName(
      (0 until 40).map(i => ("gnull", 9, null.asInstanceOf[java.lang.Double]))
        .toDF("k", "dept", "v").select($"k", $"dept", $"v".cast("double").as("v")))
    val buffered = Distribution.priceDistribution(
      withNullKey, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = Long.MaxValue)
    val mixed = Distribution.priceDistribution(
      withNullKey, Seq("k"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = 200L)
    assert(rowsOf(mixed) === rowsOf(buffered))
    // the all-null key is present with a null edges array
    val row = mixed.filter($"k" === "gnull").collect()
    assert(row.length == 1 && row.head.getAs[Seq[Double]]("edges") == null)
  }

  test("FloatType keys route without dropping rows") {
    // strKey must not widen float to double before the string cast: the
    // widened rendering ("1.100000023841858") would never match the
    // aggregate side's direct float cast ("1.1"), silently dropping every
    // routed float-keyed row.
    val floatKeyed = data
      .withColumn("fk",
        when($"k" === "g0", lit(1.1f)).otherwise(lit(-0.0f)).cast("float"))
      .select($"fk", $"v")
    val buffered = Distribution.priceDistribution(
      floatKeyed, Seq("fk"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = Long.MaxValue)
    val routed = Distribution.priceDistribution(
      floatKeyed, Seq("fk"), "v", nBins = 4, step = 100.0, minSupport = 10L,
      maxBufferedNdv = 1L)
    assert(rowsOf(routed).nonEmpty)
    assert(rowsOf(routed) === rowsOf(buffered))
  }

  test("single-key distributedQuantiles keeps its public schema") {
    val out = Distribution.distributedQuantiles(
      data, "k", "v", Seq(0.0, 0.5, 1.0))
    assert(out.schema.fieldNames.toSeq === Seq("k", "n", "qs"))
    val byKey = out.collect().map(r =>
      r.getAs[String]("k") -> r.getAs[Long]("n")).toMap
    assert(byKey.keySet === Set("g0", "g1"))
    assert(byKey.values.sum === 6000L)
  }
}
