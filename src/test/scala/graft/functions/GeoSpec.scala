package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.GeoWriter

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("hilbert index is a bijection on the full order-8 grid") {
    val n = 1 << 8
    val seen = new java.util.BitSet(n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = Hilbert.index(8, x, y)
      assert(d >= 0 && d < n.toLong * n, s"out of range at ($x,$y): $d")
      assert(!seen.get(d.toInt), s"collision at ($x,$y): $d")
      seen.set(d.toInt)
    }
  }

  test("hilbert curve is continuous: consecutive d are adjacent cells") {
    // invert by walking d in order via brute map (order 4 = 256 cells)
    val n = 1 << 4
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.index(4, x, y) -> ((x, y))).toMap
    (1 until n * n).foreach { d =>
      val (x0, y0) = byD(d - 1L)
      val (x1, y1) = byD(d.toLong)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"jump between d=${d - 1} $x0,$y0 and d=$d $x1,$y1")
    }
  }

  test("polygon containment: known inside/outside points") {
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val poly = square.flatMap(p => Seq(p._1, p._2)).toArray
    assert(PolygonContains.contains(poly, 5.0, 5.0))
    assert(!PolygonContains.contains(poly, 15.0, 5.0))
    assert(!PolygonContains.contains(poly, -1.0, 5.0))
    // concave polygon: notch cut out of the square
    val concave = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 10.0)
    assert(!PolygonContains.contains(concave, 5.0, 8.0)) // in the notch
    assert(PolygonContains.contains(concave, 2.0, 3.0))
  }

  test("hilbert-clustered writer produces spatially ordered zstd files") {
    val dir = Files.createTempDirectory("graft-geo").toString
    val pts = (0 until 2000).map { i =>
      (i.toLong, (i % 83) / 83.0 * 360 - 180, (i % 67) / 67.0 * 180 - 90)
    }.toDF("id", "lon", "lat")
    GeoWriter.hilbertClustered(pts, "lon", "lat", s"$dir/tiles", order = 8)
    val back = spark.read.parquet(s"$dir/tiles")
    assert(back.count() == 2000)
    assert(back.columns.contains("hilbert") && back.columns.contains("bbox"))
    // rows inside each file are sorted by hilbert (tight row-group stats)
    val perFile = back.withColumn("f", input_file_name())
      .select($"f", $"hilbert").as[(String, Long)].collect()
      .groupBy(_._1).values
    assert(perFile.forall(rows => { val hs = rows.map(_._2).toSeq; hs == hs.sorted }))
  }

  test("hilbert-clustered writer registers GeoParquet footer metadata") {
    val dir = Files.createTempDirectory("graft-geo-meta").toString
    val pts = (0 until 500).map { i =>
      (i.toLong, (i % 83) / 83.0 * 10 + 2.0, (i % 67) / 67.0 * 5 + 45.0)
    }.toDF("id", "lon", "lat")
    GeoWriter.hilbertClustered(pts, "lon", "lat", s"$dir/tiles", order = 8)
    // native-point geometry column present and consistent with lon/lat
    val back = spark.read.parquet(s"$dir/tiles")
    assert(back.columns.contains("geometry"))
    assert(back.filter($"geometry.x" =!= $"lon" || $"geometry.y" =!= $"lat").count() == 0)
    // every part file's footer carries the `geo` key with the global extent
    val files = new java.io.File(s"$dir/tiles").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    files.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, new org.apache.hadoop.fs.Path(f.getAbsolutePath))
      val kv = footer.getFileMetaData.getKeyValueMetaData
      val geo = kv.get("geo")
      assert(geo != null, s"no geo key in ${f.getName}; keys=${kv.keySet()}")
      assert(geo.contains("\"primary_column\":\"geometry\""))
      assert(geo.contains("\"encoding\":\"point\""))
      // extent of the fixture: lon in [2, 2+82/83*10], lat in [45, 45+66/67*5]
      assert(geo.contains("\"bbox\":[2.0,45.0,"))
      // spark's own schema key must survive the footer rewrite
      assert(kv.containsKey("org.apache.spark.sql.parquet.row.metadata"))
    }
  }

  test("normadresse abbreviates way types and drops particles") {
    val out = Seq("12 AVENUE DE LA RÉPUBLIQUE", "3 boulevard Saint Émile",
      "7 Rue de l'Église")
      .toDF("a").select(NormAdresse.normadresse($"a")).as[String].collect().toSeq
    assert(out == Seq("12 AV REPUBLIQUE", "3 BD ST EMILE", "7 R EGLISE"))
  }
}
