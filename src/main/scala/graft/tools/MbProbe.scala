package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for mb1/mb2's cost model: the within-basket pair expansion
  * is Σ_baskets C(|pruned basket|, 2) — linear in baskets when basket SIZE
  * is bounded (TPC-H baskets ≤ 7), quadratic in any basket whose size
  * GROWS with the data (a loyalty-card mega-customer, a crawl's catch-all
  * session). For each arg dir this measures the natural regime (real
  * lineitem baskets) and a SKEWED synthetic (one injected basket holding
  * every 20th part — its size scales with the part table), reporting
  * basket count, max pruned-basket size, post-prune pair-expansion rows,
  * and wall seconds. Compare two SFs to read both exponents: natural
  * stays ~linear, the injected basket contributes C(m,2) alone.
  *
  * Deployment rule this probe backs (mb1/mb2 scaladocs): bound the
  * expansion BEFORE the self-join — cap basket size (drop or sample
  * baskets past a threshold, the classic market-basket hygiene) — because
  * no downstream support filter can undo a C(m,2) shuffle already
  * emitted. */
object MbProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    def pairRows(items: DataFrame, minSup: Long): (Long, Long, Double) = {
      val freq = items
        .join(items.groupBy("l_partkey").agg(count(lit(1)).as("item_sup"))
          .filter(col("item_sup") >= minSup), "l_partkey")
      val maxBasket = freq.groupBy("l_orderkey").agg(count(lit(1)).as("m"))
        .agg(max("m")).head().getLong(0)
      val a = freq.select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = freq.select(col("l_orderkey"), col("l_partkey").as("p2"))
      val (n, secs) = timed {
        a.join(b, "l_orderkey").filter(col("p1") < col("p2")).count()
      }
      (maxBasket, n, secs)
    }

    for (dir <- args) {
      val items = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
        .localCheckpoint(true)
      val nBaskets = items.select("l_orderkey").distinct().count()
      val (mNat, pNat, sNat) = pairRows(items, 3L)
      // skewed synthetic: one basket (key -1) holding every 20th part —
      // its size is |part|/20, i.e. grows with the table
      val mega = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_partkey") % 20 === 0)
        .select(lit(-1L).as("l_orderkey"), col("p_partkey").as("l_partkey"))
      val skewed = items.unionByName(mega).localCheckpoint(true)
      val (mSk, pSk, sSk) = pairRows(skewed, 3L)
      println(s"""{"dir": "$dir", "baskets": $nBaskets, """ +
        s""""nat_max_basket": $mNat, "nat_pair_rows": $pNat, "nat_secs": ${f"$sNat%.2f"}, """ +
        s""""skew_max_basket": $mSk, "skew_pair_rows": $pSk, "skew_secs": ${f"$sSk%.2f"}}""")
    }
    spark.stop()
  }
}
