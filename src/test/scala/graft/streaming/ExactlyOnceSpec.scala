package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shared landing protocols of [[ExactlyOnce]], tested directly (the
  * three maintainers' own crash specs cover them end-to-end through the
  * call sites): journal redo idempotence at every crash point, journal
  * pruning, and the hidden-file-aware store check. */
class ExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  private def store(root: String) = s"$root/store"

  private def readStore(path: String): Set[(Long, Long)] =
    spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"))).toSet

  test("Journal: land/apply/mark is idempotent at every crash point") {
    val root = Files.createTempDirectory("graft-eo").toString
    val s = store(root)
    val j = ExactlyOnce.Journal(s, Seq("bucket"))
    val fs = new Path(s).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // batch 0 seeds buckets 0 and 1
    val b0 = Seq((1L, 10L, 0L), (2L, 20L, 1L)).toDF("id", "v", "bucket")
    j.land(b0, 0L); j.applyBatch(spark, 0L); j.markApplied(spark, 0L)
    assert(readStore(s) === Set((1L, 10L), (2L, 20L)))

    // batch 1 rewrites bucket 0 — crash BEFORE apply: store untouched,
    // recover() redoes the complete journal
    val b1 = Seq((1L, 11L, 0L), (3L, 30L, 0L)).toDF("id", "v", "bucket")
    j.land(b1, 1L)
    assert(readStore(s) === Set((1L, 10L), (2L, 20L)))
    j.recover(spark)
    assert(readStore(s) === Set((1L, 11L), (3L, 30L), (2L, 20L)))

    // crash AFTER apply but before marker: recover() is a no-op rewrite
    j.recover(spark)
    assert(readStore(s) === Set((1L, 11L), (3L, 30L), (2L, 20L)))

    // batch 2 applied in full prunes batch 1's journal and marker
    val b2 = Seq((2L, 21L, 1L)).toDF("id", "v", "bucket")
    j.land(b2, 2L); j.applyBatch(spark, 2L); j.markApplied(spark, 2L)
    assert(!fs.exists(new Path(s"$s.journal/batch=1")))
    assert(!fs.exists(new Path(s"$s.applied/batch-1")))
    assert(fs.exists(new Path(s"$s.journal/batch=2")))
    assert(readStore(s) === Set((1L, 11L), (3L, 30L), (2L, 21L)))

    // a non-numeric (or bare "batch=") journal dir neither crashes
    // recover() nor the prune loop
    fs.mkdirs(new Path(s"$s.journal/batch="))
    fs.mkdirs(new Path(s"$s.journal/stray"))
    j.recover(spark)
    val b3 = Seq((4L, 40L, 2L)).toDF("id", "v", "bucket")
    j.land(b3, 3L); j.applyBatch(spark, 3L); j.markApplied(spark, 3L)
    assert(readStore(s) === Set((1L, 11L), (3L, 30L), (2L, 21L), (4L, 40L)))
  }

  test("Journal: incomplete journal (no _SUCCESS) is ignored by recover") {
    val root = Files.createTempDirectory("graft-eo2").toString
    val s = store(root)
    val j = ExactlyOnce.Journal(s, Seq("bucket"))
    val fs = new Path(s).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b0 = Seq((1L, 10L, 0L)).toDF("id", "v", "bucket")
    j.land(b0, 0L); j.applyBatch(spark, 0L); j.markApplied(spark, 0L)
    // simulate a torn journal write for batch 1
    val b1 = Seq((1L, 99L, 0L)).toDF("id", "v", "bucket")
    j.land(b1, 1L)
    fs.delete(new Path(s"$s.journal/batch=1/_SUCCESS"), false)
    j.recover(spark)
    assert(readStore(s) === Set((1L, 10L))) // untouched
  }

  test("storeNonEmpty ignores hidden/underscore-only content") {
    val root = Files.createTempDirectory("graft-eo3").toString
    val s = store(root)
    val fs = new Path(s).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!ExactlyOnce.storeNonEmpty(spark, s))
    fs.mkdirs(new Path(s))
    fs.create(new Path(s, "_SUCCESS"), true).close()
    fs.create(new Path(s, ".staging"), true).close()
    assert(!ExactlyOnce.storeNonEmpty(spark, s))
    Seq((1L, 1L)).toDF("id", "v").write.mode("append").parquet(s)
    assert(ExactlyOnce.storeNonEmpty(spark, s))
  }
}
