package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew probe for the fn4/fn9 attribution join (r14 verdict item #6): the
  * per-user 7-day lookback is "bounded per user per window" on organic
  * traffic, but the equi-join fans out |purchases_u| x |clicks_u| rows per
  * user BEFORE the range filter — a single bot user makes one task
  * quadratic in its traffic. Measures the JOIN shape against the
  * RANGE-FRAME WINDOW shape (one per-user sort, max over a string
  * (ts, id) key within [pts-7d, pts] — O(events_u log events_u) per user,
  * no fanout) at increasing hot-user sizes, on top of the sf0.1 organic
  * events.
  *
  * Usage: runMain graft.tools.FnSkewProbe [<sfDir>]
  */
object FnSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val base = graft.Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us_long"))
    val span = base.agg(min("ts_us_long"), max("ts_us_long")).head()
    val (t0, t1) = (span.getLong(0), span.getLong(1))

    // hot user -1: k purchases and k clicks interleaved over the span —
    // every purchase sees ~half the clicks inside its 7-day lookback at
    // these densities, the bot-traffic worst case
    def hot(k: Int): DataFrame =
      spark.range(2L * k).select(
        (col("id") + 5000000000L).as("event_id"),
        lit(-1L).as("user_id"),
        when(col("id") % 2 === 0, "purchase").otherwise("click").as("event_type"),
        (lit(t0) + (col("id") * ((t1 - t0) / (2L * k)))).as("ts_us_long"))

    def joinShape(ev: DataFrame): Long = {
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us_long").as("pts"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us_long").as("cts"))
      pur.join(clk, Seq("user_id"))
        .filter(col("cts").between(col("pts") - lit(604800000000L), col("pts")))
        .groupBy("purchase_id")
        .agg(max_by(col("click_id"),
          expr("format_string('%020d%012d', cts, click_id)")).as("att_click"))
        .count()
    }

    def windowShape(ev: DataFrame): Long = {
      val w = Window.partitionBy("user_id").orderBy("ts_us_long")
        .rangeBetween(-604800000000L, 0L)
      ev.withColumn("__ck",
          when(col("event_type") === "click",
            expr("format_string('%020d%012d', ts_us_long, event_id)")))
        .withColumn("__att", max(col("__ck")).over(w))
        .filter(col("event_type") === "purchase" && col("__att").isNotNull)
        .select(col("event_id").as("purchase_id"),
          expr("cast(substring(__att, 21, 12) as long)").as("att_click"))
        .count()
    }

    // banded range join: both sides keyed by (user, 7-day bucket); each
    // purchase probes its own bucket and the previous one, so per-user
    // fanout is purchases_b x clicks_b per BAND, not global — the salted
    // fallback for bot-grade users (fanout bounded by per-band density)
    def bandShape(ev: DataFrame): Long = {
      val W = 604800000000L
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us_long").as("pts"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us_long").as("cts"))
      graft.operators.Relational.bandedLookbackJoin(pur, clk, "user_id", "pts", "cts", W)
        .groupBy("purchase_id")
        .agg(max_by(col("click_id"),
          expr("format_string('%020d%012d', cts, click_id)")).as("att_click"))
        .count()
    }

    def timed(f: => Long): (Long, Double) = {
      System.gc()
      val s = System.nanoTime(); val n = f
      (n, (System.nanoTime() - s) / 1e9)
    }
    timed(joinShape(base)); timed(windowShape(base)); timed(bandShape(base)) // warm
    for (k <- Seq(0, 2000, 20000, 100000)) {
      val ev = if (k == 0) base else base.unionByName(hot(k)).localCheckpoint(true)
      val (nj, tj) = timed(joinShape(ev))
      val (nb, tb) = timed(bandShape(ev))
      val (nw, tw) = if (k <= 20000) timed(windowShape(ev)) else (-1L, -1.0)
      println(f"""{"hot_k": $k, "join_rows": $nj, "join_secs": $tj%.2f, "band_rows": $nb, "band_secs": $tb%.2f, "window_rows": $nw, "window_secs": $tw%.2f}""")
    }
    spark.stop()
  }
}
