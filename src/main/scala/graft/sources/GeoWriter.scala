package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

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

  /** Approximate France bounding boxes — métropole (incl. Corsica) plus the
    * five DROM — as axis-aligned (lon, lat) rectangles, mirroring the intent
    * of the reference's `france_bbox.geojson` (`schema/irve/geo_utils/
    * geo.py:14-29`: point-in-any-bbox). */
  val FranceBboxes: Seq[Seq[(Double, Double)]] = Seq(
    Seq((-5.45, 41.26), (9.87, 41.26), (9.87, 51.33), (-5.45, 51.33)),
    Seq((-61.95, 15.80), (-60.95, 15.80), (-60.95, 16.60), (-61.95, 16.60)),
    Seq((-61.30, 14.30), (-60.70, 14.30), (-60.70, 15.00), (-61.30, 15.00)),
    Seq((-54.70, 2.10), (-51.50, 2.10), (-51.50, 6.00), (-54.70, 6.00)),
    Seq((55.10, -21.50), (55.90, -21.50), (55.90, -20.80), (55.10, -20.80)),
    Seq((44.95, -13.10), (45.40, -13.10), (45.40, -12.50), (44.95, -12.50)))

  private val CoordsTokens = "^\\s*\\[\\s*(.+?)\\s*,\\s*(.+?)\\s*\\]\\s*$"

  /** Coordinate-order repair (`geo.py:32-55` fix_coordinates_order): when
    * the REVERSED pair lands inside France, the source published lat-first
    * and the column is rewritten lon-first; `consolidated_coordinates_
    * reordered` records the fix. The swap reorders the original NUMBER
    * TOKENS textually (regexp on the JSON string) — no double is ever
    * re-rendered, so canonical inputs round-trip byte-identically. The
    * containment test runs through the codegen'd
    * [[graft.functions.PolygonContains]] — all column ops, no UDF. */
  def fixCoordinatesOrder(df: DataFrame, coordsCol: String = "coordonneesXY",
                          bboxes: Seq[Seq[(Double, Double)]] = FranceBboxes): DataFrame = {
    // Let-bind the parsed array ONCE: inlining from_json into every bbox
    // term would re-parse the JSON 2×bboxes times per row (the multi-stage
    // repo let-bind invariant).
    val parsedCol = "__coords_parsed"
    val parsed = col(parsedCol)
    // reversed pair = (second, first); Point(x=lon, y=lat) takes x from
    // the reversed head = original second element
    val inFrance = bboxes.map(b => graft.functions.PolygonContains
        .pointInPolygon(element_at(parsed, 2), element_at(parsed, 1), b))
      .reduce(_ || _)
    val swapped = concat(lit("["),
      regexp_extract(col(coordsCol), CoordsTokens, 2), lit(", "),
      regexp_extract(col(coordsCol), CoordsTokens, 1), lit("]"))
    df.withColumn(parsedCol, from_json(col(coordsCol), ArrayType(DoubleType)))
      .withColumn("consolidated_coordinates_reordered", coalesce(inFrance, lit(false)))
      .withColumn(coordsCol,
        when(col("consolidated_coordinates_reordered"), swapped).otherwise(col(coordsCol)))
      .drop(parsedCol)
  }

  /** `geo.py:58-66` create_lon_lat_cols: longitude/latitude extracted from
    * the (lon-first) coordinates JSON string. */
  def createLonLatCols(df: DataFrame, coordsCol: String = "coordonneesXY"): DataFrame = {
    val parsed = from_json(col(coordsCol), ArrayType(DoubleType))
    df.withColumn("consolidated_longitude", element_at(parsed, 1))
      .withColumn("consolidated_latitude", element_at(parsed, 2))
  }

  /** String escaping matching Python's `json.dumps` default
    * (ensure_ascii=True): two-char escapes for the JSON shorthands, \\uXXXX
    * for every other control or non-ASCII UTF-16 code unit (non-BMP chars
    * escape as their surrogate pair, exactly as CPython does). */
  private[sources] def pyJsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jsonScalar(v: Any, dt: DataType): String = v match {
    case null => "null"
    case s: String => "\"" + pyJsonEscape(s) + "\""
    case b: Boolean => if (b) "true" else "false"
    case d: Double => d.toString
    case f: Float => f.toDouble.toString
    case other => dt match {
      case StringType => "\"" + pyJsonEscape(other.toString) + "\""
      case _ => other.toString
    }
  }

  /** S17-companion GeoJSON FeatureCollection export (`geo.py:69-96`
    * export_to_geojson): every row becomes a Point feature — geometry
    * coordinates `[lon, lat]` lifted verbatim from the coordinates JSON
    * string (the number TOKENS are re-emitted, never re-rendered through a
    * double), properties = the full record — wrapped as a pretty-printed
    * (indent=2) FeatureCollection with Python-`json.dumps` byte semantics
    * (ensure_ascii escapes, `", "` / `": "` separators).
    *
    * Shape: per-feature text renders DISTRIBUTED (mapPartitions over the
    * sorted frame); the single consumer-facing file is then stream-
    * assembled on the driver like [[Writers.csvExportContract]] — the one
    * inherently one-stream step. Doubles in properties render via JDK
    * shortest-repr: byte parity with CPython holds across the plain-decimal
    * range (|x| in [1e-3, 1e7)), which covers lon/lat and the reference's
    * all-string CSV frames. */
  def geojsonFeatureCollection(df: DataFrame, dest: String,
                               coordsCol: String = "coordonneesXY",
                               sortCols: Seq[String] = Nil): Unit = {
    val schema = df.schema
    val coordsIdx = schema.fieldIndex(coordsCol)
    val names = schema.fieldNames.toSeq
    val types = schema.fields.map(_.dataType).toSeq
    require(types(coordsIdx) == StringType, s"$coordsCol must be a JSON string column")
    val ordered = (if (sortCols.nonEmpty) df.orderBy(sortCols.map(col): _*) else df)
      .coalesce(1)
    val features = ordered.mapPartitions { rows =>
      val pat = java.util.regex.Pattern.compile(CoordsTokens)
      rows.map { r =>
        val coordsText = r.get(coordsIdx)
        val m = pat.matcher(if (coordsText == null) "" else coordsText.toString)
        require(m.matches(), s"unparseable $coordsCol: $coordsText")
        val props = names.indices.map { i =>
          s"""        "${pyJsonEscape(names(i))}": ${jsonScalar(r.get(i), types(i))}"""
        }.mkString(",\n")
        "    {\n      \"type\": \"Feature\",\n      \"geometry\": {\n" +
          "        \"type\": \"Point\",\n        \"coordinates\": [\n" +
          s"          ${m.group(1)},\n          ${m.group(2)}\n" +
          "        ]\n      },\n" +
          (if (names.isEmpty) "      \"properties\": {}\n"
           else s"      \"properties\": {\n$props\n      }\n") +
          "    },"
      }
    }(Encoders.STRING)
    val tmp = java.nio.file.Files.createTempDirectory("geojson")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(dest, false))
    try {
      features.write.mode(SaveMode.Overwrite).text(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part = try listing
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst()
      finally listing.close()
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val size = if (part.isPresent) java.nio.file.Files.size(part.get()) else 0L
      if (size == 0L)
        out.write("{\n  \"type\": \"FeatureCollection\",\n  \"features\": []\n}".getBytes(ascii))
      else {
        out.write("{\n  \"type\": \"FeatureCollection\",\n  \"features\": [\n".getBytes(ascii))
        // copy all but the trailing ",\n" — the last feature has no comma
        val in = new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(part.get()))
        try {
          val buf = new Array[Byte](1 << 16)
          var remaining = size - 2
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            require(n > 0, "unexpected EOF assembling geojson")
            out.write(buf, 0, n)
            remaining -= n
          }
        } finally in.close()
        out.write("\n  ]\n}".getBytes(ascii))
      }
    } finally {
      out.close()
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
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
