package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Web

/** The streamed domain-membership store must equal the sequential
  * [[Web.incrementalDomainCap]] fold over the same batches — the batch
  * twin of the arrival-priority cap semantic (NOT a global rebuild, which
  * would re-rank corpus and batch together). Also pins idle re-runs, the
  * landed-write/lost-commit crash window, and that the maintained store
  * drives the next batch's verdicts identically to the fold store. */
class StreamingDomainMembershipSpec extends SparkSpec {
  import spark.implicits._

  private val cap = 10

  private def fold(batches: Seq[DataFrame]): DataFrame = {
    val empty = batches.head.filter(lit(false)).select("id", "domain")
    batches.foldLeft(empty) { (st, b) =>
      st.unionByName(
        Web.incrementalDomainCap(st, b, "id", "domain", cap)
          .filter(col("kept")).select("id", "domain"))
    }
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("streamed store == incremental fold across drains, idle re-runs, crash replay") {
    val root = Files.createTempDirectory("graft-stream-domcap").toString
    val in = s"$root/raw"
    // b1 part-fills a.com (8/10) and b.org (3/10)
    val b1 = ((1L to 8L).map((_, "a.com")) ++
      (101L to 103L).map((_, "b.org"))).toDF("id", "domain")
    // b2 overflows a.com, part-fills b.org, opens c.net
    val b2 = ((11L to 18L).map((_, "a.com")) ++
      (111L to 115L).map((_, "b.org")) ++
      Seq((201L, "c.net"))).toDF("id", "domain")
    b1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingDomainMembership.run(spark, s"$in/*", b1, "id", "domain", cap,
        s"$root/store", s"$root/ckpt", hook)
    def streamed() =
      StreamingDomainMembership.storeSoFar(spark, s"$root/store", "id", "domain").get

    runOnce()
    assertSame(streamed(), fold(Seq(b1)))

    // idle re-run: the file registry remembers everything — no duplicates
    runOnce()
    assertSame(streamed(), fold(Seq(b1)))

    // second drain: a.com admits only 2 more (8 + 2 = cap), b.org all 5,
    // c.net opens fresh
    b2.write.parquet(s"$in/f2")
    runOnce()
    val after2 = fold(Seq(b1, b2))
    assertSame(streamed(), after2)
    assert(streamed().filter($"domain" === "a.com").count() === cap.toLong)

    // crash window: batch 3 lands, the checkpoint commit is lost, replay
    val b3 = ((121L to 130L).map((_, "b.org")) ++
      (211L to 213L).map((_, "c.net"))).toDF("id", "domain")
    b3.write.parquet(s"$in/f3")
    val boom = intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after write"))
    }
    assert(boom.getMessage != null)
    runOnce()
    val after3 = fold(Seq(b1, b2, b3))
    assertSame(streamed(), after3)

    // the maintained store drives the next batch identically to the fold
    val b4 = ((301L to 305L).map((_, "a.com")) ++
      (311L to 315L).map((_, "d.io"))).toDF("id", "domain")
    assertSame(
      Web.incrementalDomainCap(streamed(), b4, "id", "domain", cap)
        .select("id", "domain", "prior", "rk", "kept"),
      Web.incrementalDomainCap(after3, b4, "id", "domain", cap)
        .select("id", "domain", "prior", "rk", "kept"))
  }
}
