package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic range sharding: cuts must equal the local-sort answer,
  * assignment must equal the ⌊rank·B/n⌋ closed form, the assignment plan
  * must stay narrow (no exchange, no window, no sort), and the landed
  * layout must keep file counts bounded. */
class RangeShardSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scrambled keys: unique, non-contiguous, out of order
  private def keyFrame(n: Int) =
    (0 until n).map(i => ((i * 7919L) % 104729L) * 13L + 1L).toDF("k")

  test("cuts equal the local-sort boundary keys at ranks ceil(k*n/B)") {
    val n = 1013
    val b = 8
    val df = keyFrame(n)
    val (total, cuts) = RangeShard.cuts(df, "k", b)
    assert(total === n.toLong)
    val sortedKeys = df.collect().map(_.getLong(0)).sorted
    val expect = (1 until b)
      .map(k => sortedKeys(((k.toLong * n + b - 1) / b).toInt)).toArray
    assert(cuts.toSeq === expect.toSeq)
  }

  test("shard assignment equals the rank closed form for every row") {
    val n = 500
    val b = 16
    val df = keyFrame(n)
    val (_, cuts) = RangeShard.cuts(df, "k", b)
    val got = df.withColumn("shard", RangeShard.shardCol(col("k"), cuts))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rankOf = df.collect().map(_.getLong(0)).sorted.zipWithIndex.toMap
    df.collect().map(_.getLong(0)).foreach { k =>
      val expect = (rankOf(k).toLong * b / n).toInt
      assert(got(k) === expect, s"key $k rank ${rankOf(k)}")
    }
  }

  test("assignment plan is narrow: no exchange, no window, no sort") {
    val df = keyFrame(200)
    val (_, cuts) = RangeShard.cuts(df, "k", 4)
    val assigned = df.withColumn("shard", RangeShard.shardCol(col("k"), cuts))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("layout lands one bounded file per shard directory") {
    val dir = java.nio.file.Files.createTempDirectory("rangeshard").toFile
    try {
      val df = keyFrame(400)
      val cuts = RangeShard.layout(df, "k", dir.toString, nShards = 8)
      assert(cuts.length === 7)
      val shardDirs = dir.listFiles().filter(_.getName.startsWith("shard="))
      assert(shardDirs.length === 8)
      shardDirs.foreach { sd =>
        val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length === 1, s"${sd.getName}: ${files.length} files")
      }
      // read-back agrees with the closed form: per-shard counts of n/B ± 1
      val counts = spark.read.parquet(dir.toString)
        .groupBy("shard").count().collect()
        .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
      assert(counts.values.sum === 400L)
      assert(counts.values.forall(c => c === 50L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
