package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed selection must be BIT-identical to the buffered exact
  * `percentile` aggregate — same type-7 position p·(n−1) and the same
  * weight-form interpolation — or the oracle hashes would drift.
  */
class DistributedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def referenceQs(df: DataFrame, key: String, value: String): Map[String, (Long, Seq[Double])] = {
    val arr = probs.mkString("array(", ", ", ")")
    df.filter(col(value).isNotNull)
      .groupBy(col(key).cast("string").as("k"))
      .agg(expr(s"percentile($value, $arr)").as("qs"), count(col(value)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getSeq[Double](1)))
      .toMap
  }

  private def distributedQs(df: DataFrame, key: String, value: String): Map[String, (Long, Seq[Double])] =
    Distribution.distributedQuantiles(df, key, value, probs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2)))
      .toMap

  test("bit-identical to percentile on a skewed multi-partition multiset") {
    // deterministic pseudo-data: 3 huge groups + 1 tiny, heavy ties
    val df = (0 until 20000).map { i =>
      val k = if (i % 1000 == 0) "tiny" else s"g${i % 3}"
      val v = ((i * 2654435761L) % 997).toDouble / 7.0
      (k, v)
    }.toDF("k", "v").repartition(13)
    val ref = referenceQs(df, "k", "v")
    val got = distributedQs(df, "k", "v")
    assert(got.keySet === ref.keySet)
    ref.foreach { case (k, (n, qs)) =>
      val (gn, gqs) = got(k)
      assert(gn === n, s"count mismatch for $k")
      qs.zip(gqs).zipWithIndex.foreach { case ((e, a), i) =>
        assert(java.lang.Double.compare(e, a) === 0, s"q($i) of $k: expected $e got $a")
      }
    }
  }

  test("single-element and two-element groups") {
    val df = Seq(("a", 42.0), ("b", 1.0), ("b", 2.0)).toDF("k", "v")
    val ref = referenceQs(df, "k", "v")
    assert(distributedQs(df, "k", "v") === ref)
  }

  test("null keys form their own group; null values are ignored") {
    val df = Seq((null.asInstanceOf[String], 1.0), (null.asInstanceOf[String], 3.0),
      ("a", 5.0)).toDF("k", "v")
      .union(Seq(("a", null.asInstanceOf[java.lang.Double])).toDF("k", "v"))
    val got = distributedQs(df, "k", "v")
    assert(got(null)._1 === 2L)
    assert(got(null)._2(3) === 2.0) // median of {1, 3}
    assert(got("a") === ((1L, Seq.fill(probs.size)(5.0))))
  }

  test("distinct-set quantiles compose by pre-distincting") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val got = distributedQs(df.distinct(), "k", "v")
    assert(got("a")._1 === 3L)
    assert(got("a")._2(3) === 2.0) // median of distinct {1,2,3}, not multiset
  }
}
