package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed SCD2 history must equal the w8-style batch rebuild over
  * every event drained so far, after every drain — the tail-extension CDC
  * contract makes the incremental fold exact. Also pins idle re-runs and
  * the landed-write/lost-commit crash window (protocol 2 with
  * self-exclusion: the replayed batch folds against the identical prior
  * state and overwrites its own partition byte-identically). */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  /** The w8 gaps-and-islands rebuild — the batch twin. */
  private def rebuild(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts_us_long"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    val hist = ev
      .withColumn("__chg",
        when(prev.isNull.or(prev =!= col("event_type")), 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(wOrd))
      .groupBy("user_id", "version", "event_type")
      .agg(min("ts_us_long").as("valid_from"), count(lit(1)).as("n_events"))
    val wVer = Window.partitionBy("user_id").orderBy("version")
    hist.withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wVer), lit(-1L)))
      .select("user_id", "version", "event_type", "valid_from", "valid_to",
        "n_events")
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  // (user_id, event_type, ts_us_long, event_id) — tail-extension batches:
  // u1 continues the same type across the b1/b2 boundary (open version
  // extends), u2 switches type at the boundary (close + append), u3
  // appears only in b2, u1 has multiple runs inside b3.
  private def b1 = Seq(
    (1L, "view", 100L, 1L), (1L, "view", 200L, 2L),
    (2L, "click", 100L, 3L), (2L, "click", 150L, 4L), (2L, "view", 300L, 5L)
  ).toDF("user_id", "event_type", "ts_us_long", "event_id")
  private def b2 = Seq(
    (1L, "view", 300L, 6L), (1L, "click", 400L, 7L),
    (2L, "buy", 500L, 8L),
    (3L, "view", 100L, 9L)
  ).toDF("user_id", "event_type", "ts_us_long", "event_id")
  private def b3 = Seq(
    (1L, "click", 500L, 10L), (1L, "view", 600L, 11L), (1L, "click", 700L, 12L),
    (3L, "view", 900L, 13L)
  ).toDF("user_id", "event_type", "ts_us_long", "event_id")

  test("streamed history == batch rebuild across drains, idle re-runs, crash replay") {
    val root = Files.createTempDirectory("graft-stream-scd2").toString
    val in = s"$root/raw"

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingScd2.run(spark, s"$in/*", b1, s"$root/store", s"$root/ckpt",
        hook)
    def streamed() = StreamingScd2.historySoFar(spark, s"$root/store")

    b1.write.parquet(s"$in/f1")
    runOnce()
    assertSame(streamed(), rebuild(b1))

    // idle re-run: nothing new — no duplicates, same history
    runOnce()
    assertSame(streamed(), rebuild(b1))

    // second drain: open-version extension (u1), close+append (u2), new
    // user (u3)
    b2.write.parquet(s"$in/f2")
    runOnce()
    assertSame(streamed(), rebuild(b1.unionByName(b2)))
    // u1's view version really did EXTEND (one version, 3 events)
    val u1v1 = streamed().filter($"user_id" === 1L && $"version" === 1L)
      .select("event_type", "n_events").as[(String, Long)].collect()
    assert(u1v1.toSeq === Seq(("view", 3L)))

    // crash window: batch 3's partition lands, the commit is lost, replay
    b3.write.parquet(s"$in/f3")
    val boom = intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after land"))
    }
    assert(boom.getMessage != null)
    runOnce()
    assertSame(streamed(), rebuild(b1.unionByName(b2).unionByName(b3)))

    // exactly one open version per user
    val opens = streamed().filter($"valid_to" === -1L)
      .groupBy("user_id").count().select("count").as[Long].collect()
    assert(opens.forall(_ == 1L) && opens.length == 3)
  }

  test("store grows with VERSIONS, not events, across 30 drains") {
    val root = Files.createTempDirectory("graft-scd2-growth").toString
    val in = s"$root/raw"
    val users = 0L until 10L
    val perRun = 20
    var ts = 0L
    var eid = 0L
    var total = 0L
    val allBatches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    def batch(b: Int): DataFrame = {
      // one run per user per batch; the type changes every 3 batches, so
      // most drains EXTEND the open version (delta = 1 row/user) and
      // every third closes + appends (delta = 2 rows/user)
      val rows = users.flatMap { u =>
        val tpe = s"t${(b / 3) % 4}"
        (0 until perRun).map { _ =>
          ts += 1; eid += 1; total += 1
          (u, tpe, ts, eid)
        }
      }
      rows.toDF("user_id", "event_type", "ts_us_long", "event_id")
    }

    (0 until 30).foreach { b =>
      val df = batch(b)
      allBatches += df
      df.write.parquet(f"$in/f$b%03d")
      StreamingScd2.run(spark, s"$in/*", df, s"$root/store", s"$root/ckpt")
    }

    val events = allBatches.reduce(_ unionByName _)
    assertSame(StreamingScd2.historySoFar(spark, s"$root/store"),
      rebuild(events))
    val storeRows = spark.read.parquet(s"$root/store").count()
    // 6000 events -> 10 versions/user; the delta store holds one row per
    // extension drain plus two per type change: far below event volume
    assert(storeRows < total / 5,
      s"delta store ($storeRows rows) must stay far below events ($total)")
    assert(storeRows >= 100L, "store must hold every version's history")
  }
}
