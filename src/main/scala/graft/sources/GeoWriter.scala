package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.Hilbert.hilbert

/** S17: Hilbert-clustered (Geo)Parquet sink — the Spark-native counterpart
  * of the reference's DuckDB GeoParquet conversion
  * (`utils/conversions.py:65-142`: global-extent Hilbert sort, zstd,
  * bounded row groups, per-row bbox).
  *
  * Shape: one cheap extent aggregation (a single min/max pass), then
  * `repartitionByRange` on the Hilbert index (files become spatial tiles)
  * + `sortWithinPartitions` (row groups become sub-tiles). Parquet min/max
  * column stats on (lon, lat, hilbert) then give readers spatial pruning —
  * the distributed stand-in for a spatial index.
  */
object GeoWriter {

  /** One min/max pass over the coordinates; None for empty/all-null. */
  private def extent(df: DataFrame, lonCol: String, latCol: String)
      : Option[(Double, Double, Double, Double)] = {
    val ext = df.agg(min(lonCol), max(lonCol), min(latCol), max(latCol)).head()
    if (ext.isNullAt(0)) None
    else Some((ext.getDouble(0), ext.getDouble(1), ext.getDouble(2), ext.getDouble(3)))
  }

  /** Adds `hilbert` (cell index on a 2^order grid over the frame's extent)
    * and a `bbox` struct per row. */
  def withHilbert(df: DataFrame, lonCol: String, latCol: String, order: Int): DataFrame =
    withHilbertExtent(df, lonCol, latCol, order, extent(df, lonCol, latCol))

  /** [[withHilbert]] with a pre-computed extent, so callers that also need
    * the extent (the GeoParquet footer) aggregate the input ONCE. */
  def withHilbertExtent(df: DataFrame, lonCol: String, latCol: String, order: Int,
                        ext: Option[(Double, Double, Double, Double)]): DataFrame = {
    if (ext.isEmpty) // empty or all-null coordinates: degenerate extent
      return df.withColumn("hilbert", lit(0L))
        .withColumn("bbox", struct(col(lonCol).as("xmin"), col(lonCol).as("xmax"),
          col(latCol).as("ymin"), col(latCol).as("ymax")))
    val (minx, maxx, miny, maxy) = ext.get
    val n = (1L << order) - 1
    def cell(c: String, lo: Double, hi: Double) =
      if (hi > lo) least(floor((col(c) - lit(lo)) / lit(hi - lo) * n), lit(n)).cast("long")
      else lit(0L)
    df.withColumn("hilbert",
        hilbert(cell(lonCol, minx, maxx), cell(latCol, miny, maxy), order))
      .withColumn("bbox", struct(col(lonCol).as("xmin"), col(lonCol).as("xmax"),
        col(latCol).as("ymin"), col(latCol).as("ymax")))
  }

  /** Write `df` Hilbert-clustered: spatial range partitioning + in-file
    * ordering + zstd + bounded row groups. Parquet bounds row groups by
    * BYTES (`parquet.block.size`), so the tile granularity knob is
    * `blockBytes`; the page row limit additionally tightens page-level
    * stats (the reference's 20k-row groups, `utils/conversions.py:123-129`).
    *
    * The output is registered GeoParquet: a native-point `geometry`
    * struct<x,y> column plus the `geo` footer key (version, primary
    * column, global bbox, bbox covering) that downstream GeoParquet
    * readers look for — the reference's `add_bbox_metadata` step
    * (`utils/conversions.py:140-141`). */
  def hilbertClustered(df: DataFrame, lonCol: String, latCol: String,
                       path: String, order: Int = 10, pageRows: Int = 20000,
                       blockBytes: Long = 8L * 1024 * 1024): Unit = {
    val spark = df.sparkSession
    val ext = extent(df, lonCol, latCol) // ONE pass, shared with the footer
    val out = withHilbertExtent(df, lonCol, latCol, order, ext)
      .withColumn("geometry",
        struct(col(lonCol).cast("double").as("x"), col(latCol).cast("double").as("y")))
    out.repartitionByRange(col("hilbert"))
      .sortWithinPartitions("hilbert")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.block.size", blockBytes.toString)
      .option("parquet.page.row.count.limit", pageRows.toString)
      .parquet(path)
    val bbox = ext.map { case (minx, maxx, miny, maxy) => (minx, miny, maxx, maxy) }
      .getOrElse((0.0, 0.0, 0.0, 0.0))
    addGeoMetadata(spark, path, "geometry", bbox)
  }

  /** GeoParquet 1.1 `geo` footer JSON: native point encoding, global bbox,
    * and a bbox covering pointing at the per-row `bbox` struct. */
  def geoJson(primaryColumn: String, bbox: (Double, Double, Double, Double)): String = {
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%s", Double.box(v))
    s"""{"version":"1.1.0","primary_column":"$primaryColumn","columns":{"$primaryColumn":{""" +
      s""""encoding":"point","geometry_types":["Point"],""" +
      s""""bbox":[${num(bbox._1)},${num(bbox._2)},${num(bbox._3)},${num(bbox._4)}],""" +
      s""""covering":{"bbox":{"xmin":["bbox","xmin"],"ymin":["bbox","ymin"],""" +
      s""""xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}}}}"""
  }

  /** Stamps the `geo` key into every part-file footer under `path`.
    *
    * Spark's parquet writer exposes no footer key-value hook, so this is a
    * post-pass: per file, byte-copy the data pages, append a footer with
    * the extra key, atomically rename over the original. No page decode
    * happens — cost is one sequential read+write per file — and the pass
    * runs ON EXECUTORS (one task per file), so a 100 TB output with
    * thousands of tiles stamps in parallel, not in a driver loop. */
  def addGeoMetadata(spark: org.apache.spark.sql.SparkSession, path: String,
                     primaryColumn: String, bbox: (Double, Double, Double, Double)): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(conf.value)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    if (files.isEmpty) return
    val json = geoJson(primaryColumn, bbox)
    spark.sparkContext.parallelize(files.toSeq, files.length).foreach { f =>
      stampGeoFooter(conf.value, f, json)
    }
  }

  /** Parquet tail layout: [data pages][footer thrift][int32 LE len]["PAR1"].
    * Reads the thrift `FileMetaData`, appends the `geo` KeyValue, and
    * rewrites the file as copy-of-data + new footer via a temp file +
    * rename (works on any Hadoop FS — no in-place overwrite needed). */
  private[sources] def stampGeoFooter(conf: org.apache.hadoop.conf.Configuration,
                                      file: String, json: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val bak = new Path(p.getParent, s".${p.getName}.geo.bak")
    // crash recovery: a prior attempt that died between the two renames
    // left the original parked at .bak — restore it before re-stamping
    // (the task is then idempotent across Spark retries; delete-then-
    // rename would lose the part permanently)
    if (!fs.exists(p) && fs.exists(bak)) require(fs.rename(bak, p),
      s"could not restore $file from interrupted stamp")
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    val (fmd, footerStart) =
      try {
        in.seek(len - 8)
        val tail = new Array[Byte](8)
        in.readFully(tail)
        require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1',
          s"$file is not a parquet file")
        val footerLen = java.nio.ByteBuffer.wrap(tail, 0, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        val start = len - 8 - footerLen
        in.seek(start)
        val buf = new Array[Byte](footerLen)
        in.readFully(buf)
        (org.apache.parquet.format.Util.readFileMetaData(
          new java.io.ByteArrayInputStream(buf)), start)
      } finally in.close()
    // replace any stale geo entry, then append the fresh one
    if (fmd.getKey_value_metadata != null)
      fmd.getKey_value_metadata.removeIf(kv => kv.getKey == "geo")
    fmd.addToKey_value_metadata(new org.apache.parquet.format.KeyValue("geo").setValue(json))
    val tmp = new Path(p.getParent, s".${p.getName}.geo.tmp")
    val out = fs.create(tmp, true)
    try {
      val src = fs.open(p)
      try {
        val buf = new Array[Byte](1 << 20)
        var remaining = footerStart
        while (remaining > 0) {
          val n = src.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"unexpected EOF copying $file")
          out.write(buf, 0, n)
          remaining -= n
        }
      } finally src.close()
      val fb = new java.io.ByteArrayOutputStream()
      org.apache.parquet.format.Util.writeFileMetaData(fmd, fb)
      val footer = fb.toByteArray
      out.write(footer)
      out.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(footer.length).array())
      out.write("PAR1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    } finally out.close()
    fs.delete(bak, false) // stale leftover from an even earlier attempt
    require(fs.rename(p, bak), s"could not park original while stamping $file")
    require(fs.rename(tmp, p), s"rename failed stamping geo footer on $file")
    fs.delete(bak, false)
  }
}
