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

  test("encoding + separator sniffing at the csv edge") {
    val dir = tmp()
    def write(name: String, content: String, cs: String): String = {
      val p = s"$dir/$name"
      Files.write(java.nio.file.Paths.get(p), content.getBytes(cs))
      p
    }
    val schema = StructType(Seq(StructField("ville", StringType),
      StructField("dept", StringType)))
    // latin-1 semicolon CSV: é is a bare 0xE9, invalid as UTF-8
    val w1252 = write("w.csv", "ville;dept\nNîmes;30\nSète;34\n", "ISO-8859-1")
    assert(Readers.sniffEncoding(spark, w1252) == "iso-8859-1")
    assert(Readers.sniffCsvSep(spark, w1252, "iso-8859-1") == ";")
    val back = Readers.csvSniffed(spark, w1252, schema)
    assert(back.as[(String, String)].collect().toSet ==
      Set(("Nîmes", "30"), ("Sète", "34")))
    // plain UTF-8 comma CSV
    val utf8 = write("u.csv", "ville,dept\nNîmes,30\n", "UTF-8")
    assert(Readers.sniffEncoding(spark, utf8) == "UTF-8")
    assert(Readers.sniffCsvSep(spark, utf8) == ",")
    assert(Readers.csvSniffed(spark, utf8, schema)
      .as[(String, String)].collect().toSet == Set(("Nîmes", "30")))
    // BOM'd files: detected from the mark alone
    val bom = write("b.csv", "\uFEFFville;dept\nSète;34\n", "UTF-8")
    assert(Readers.sniffEncoding(spark, bom) == "UTF-8")
    assert(Readers.sniffEncoding(spark,
      write("u16.csv", "\uFEFFville;dept\n", "UTF-16LE")) == "UTF-16LE")
    // truncated multi-byte tail must not flip a UTF-8 file to latin-1
    assert(Readers.isValidUtf8Prefix("Nîmes".getBytes("UTF-8").dropRight(1)))
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

  test("csv export contract: %.0f half-even floats, one header, year appends") {
    val dest = s"${tmp()}/stats_dvf_api.csv"
    val y1 = Seq(("A", Some(0.5), Some("x")), ("B", Some(1.5), Some("joli,nom")))
      .toDF("code_geo", "nb_ventes", "libelle")
    val y2 = Seq(("C", Some(2.5), None), ("D", Option.empty[Double], Some("y")))
      .toDF("code_geo", "nb_ventes", "libelle")
    Writers.csvExportContract(Seq(y1, y2), dest,
      Seq("code_geo", "nb_ventes", "libelle"), Seq("code_geo"))
    val bytes = new String(Files.readAllBytes(java.nio.file.Paths.get(dest)), "UTF-8")
    // pandas to_csv(float_format="%.0f") golden: 0.5->0, 1.5->2, 2.5->2
    // (C printf rounds half-even), nulls empty, one header, minimal quoting
    assert(bytes ==
      """code_geo,nb_ventes,libelle
        |A,0,x
        |B,2,"joli,nom"
        |C,2,
        |D,,y
        |""".stripMargin, bytes)
  }
}
