package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("typed csv round-trip with custom sep and gzip") {
    val dir = tmp()
    val df = Tables.nation(spark, sf())
    Writers.csv(df, s"$dir/nation", gzip = true)
    val schema = StructType(Seq(StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType), StructField("n_regionkey", IntegerType)))
    val back = Readers.csv(spark, s"$dir/nation", schema)
    assert(back.count() == 25)
    assert(back.as[(Int, String, Int)].collect().toSet ==
      df.as[(Int, String, Int)].collect().toSet)
    // gzip actually applied
    assert(new java.io.File(s"$dir/nation").listFiles().exists(_.getName.endsWith(".csv.gz")))
  }

  test("fixed-width scan slices byte offsets into typed fields") {
    val dir = tmp()
    // 10-char name, 3-char code, 4-char year — the INSEE deces layout shape
    Seq("DUPONT    075 1987", "MARTIN    013 1990")
      .toDF("value").write.text(s"$dir/fw")
    val out = Readers.fixedWidth(spark, s"$dir/fw",
      Seq(("name", 0, 10), ("dept", 10, 3), ("year", 14, 4)))
      .withColumn("year", col("year").cast("int"))
    assert(out.as[(String, String, Int)].collect().toSet ==
      Set(("DUPONT", "075", 1987), ("MARTIN", "013", 1990)))
  }

  test("zstd parquet sink writes readable zstd files") {
    val dir = tmp()
    Writers.parquetZstd(Tables.region(spark, sf()), s"$dir/region")
    assert(spark.read.parquet(s"$dir/region").count() == 5)
    assert(new java.io.File(s"$dir/region").listFiles()
      .exists(_.getName.contains(".zstd.")))
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = tmp()
    val day1 = Seq(("2024-01-01", "a", 1L), ("2024-01-02", "b", 2L)).toDF("day", "k", "v")
    day1.write.partitionBy("day").parquet(s"$dir/t")
    // re-run day 2 with corrected data; day 1 must survive
    val day2fix = Seq(("2024-01-02", "b", 99L)).toDF("day", "k", "v")
    Writers.overwritePartitions(day2fix, s"$dir/t", Seq("day"))
    val out = spark.read.parquet(s"$dir/t")
      .select("day", "v").as[(String, Long)].collect().toSet
    assert(out == Set(("2024-01-01", 1L), ("2024-01-02", 99L)))
  }

  test("upsert merge sums counters on conflict and keeps both sides") {
    val existing = Seq(("r1", "2024-01-01", 10L), ("r2", "2024-01-01", 5L))
      .toDF("resource", "day", "nb_calls")
    val delta = Seq(("r2", "2024-01-01", 3L), ("r3", "2024-01-02", 7L))
      .toDF("resource", "day", "nb_calls")
    val merged = Writers.upsertCounts(existing, delta, Seq("resource", "day"), "nb_calls")
      .as[(String, String, Long)].collect().toSet
    assert(merged == Set(("r1", "2024-01-01", 10L), ("r2", "2024-01-01", 8L),
      ("r3", "2024-01-02", 7L)))
  }

  test("processed-file registry filters to never-seen files") {
    val candidates = Seq("f1.log", "f2.log", "f3.log").toDF("file")
    val registry = Seq("f2.log").toDF("file")
    val fresh = Writers.newFilesOnly(candidates, registry, "file")
      .as[String].collect().toSet
    assert(fresh == Set("f1.log", "f3.log"))
  }
}
