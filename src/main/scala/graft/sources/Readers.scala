package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scan-side operators (SURVEY §2.1 S1–S9): the reference's ingest surface
  * re-expressed as schema-first Spark reads. Gzip/chunking/manual prefix
  * partitioning all disappear — Spark's partitioned readers already do it.
  */
object Readers {

  /** S1/S3: typed CSV scan with the reference's option surface
    * (`dvf/explore/task_functions.py:172-177`: dtype map, sep, encoding,
    * na values; gzip handled transparently by extension). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          sep: String = ",", encoding: String = "UTF-8", header: Boolean = true,
          nullValue: String = ""): DataFrame =
    spark.read.schema(schema)
      .option("sep", sep).option("encoding", encoding)
      .option("header", header.toString).option("nullValue", nullValue)
      .csv(path)

  /** S5: fixed-width text scan (`insee/deces/task_functions.py:71-90`):
    * byte-offset field slicing as substring projections over spark.read.text
    * — stays in whole-stage codegen, splittable, no UDF.
    * @param fields (name, startOffset0Based, length) triples */
  def fixedWidth(spark: SparkSession, path: String,
                 fields: Seq[(String, Int, Int)]): DataFrame = {
    val cols = fields.map { case (name, start, len) =>
      trim(substring(col("value"), start + 1, len)).as(name)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** Encoding sniff for CSV edges — the reference chardet-detects when no
    * encoding is profiled (`schema/utils/consolidation.py:924-930`, with
    * its Windows-1254→iso-8859-1 correction). Dependency-free version
    * tuned to what actually arrives in French open data: BOM detection
    * (UTF-8 / UTF-16LE / UTF-16BE), then strict UTF-8 validation of a
    * bounded prefix, else iso-8859-1 — the same normalization target the
    * reference corrects chardet's answer to, and one of the charsets
    * Spark 4's CSV reader accepts without the legacy-charset flag. One
    * bounded driver-side read of the first matching file — never a full
    * scan of a 100 TB input.
    */
  def sniffEncoding(spark: SparkSession, path: String,
                    sampleBytes: Int = 1 << 16): String = {
    val bytes = samplePrefix(spark, path, sampleBytes)
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) "UTF-8"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      "UTF-16LE"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      "UTF-16BE"
    else if (isValidUtf8Prefix(bytes)) "UTF-8"
    else "iso-8859-1"
  }

  /** Separator sniff (the reference falls back to pandas' python-engine
    * inference, `consolidation.py:931-932`): over the first sample lines,
    * pick the candidate whose per-line count is positive and most
    * consistent (max of min-per-line counts; ties break in candidate
    * order, semicolon first — the dominant French-CSV convention). */
  def sniffCsvSep(spark: SparkSession, path: String,
                  encoding: String = "UTF-8", sampleBytes: Int = 1 << 16): String = {
    val bytes = samplePrefix(spark, path, sampleBytes)
    val text = new String(bytes, encoding)
    val lines = text.split("\r?\n").iterator.filter(_.nonEmpty).take(10).toSeq
    // the last line is only suspect when the sample actually hit the limit
    val truncated = bytes.length == sampleBytes
    val full = if (truncated) lines.dropRight(1) else lines
    val use = if (full.nonEmpty) full else lines
    val candidates = Seq(";", ",", "\t", "|")
    candidates.maxBy { c =>
      if (use.isEmpty) 0L else use.map(_.count(_ == c.head).toLong).min
    }
  }

  /** S1/S3 with the reference's sniffing edges: encoding and separator are
    * detected from a bounded sample when not supplied. Schema-first stays
    * mandatory — only the byte-level edges are inferred. */
  def csvSniffed(spark: SparkSession, path: String, schema: StructType,
                 sep: Option[String] = None, encoding: Option[String] = None,
                 header: Boolean = true, nullValue: String = ""): DataFrame = {
    val enc = encoding.getOrElse(sniffEncoding(spark, path))
    val s = sep.getOrElse(sniffCsvSep(spark, path, enc))
    if (enc.startsWith("UTF-16")) {
      // Hadoop's line reader splits on raw 0x0A bytes, which shears every
      // UTF-16 record one byte out of phase from line 2 on. multiLine mode
      // hands the whole file to the parser with the declared charset —
      // correct, at the price of per-file (not per-split) parallelism; a
      // 100 TB input should be transcoded to UTF-8, not ingested this way.
      spark.read.schema(schema)
        .option("sep", s).option("encoding", enc)
        .option("header", header.toString).option("nullValue", nullValue)
        .option("multiLine", "true")
        .csv(path)
    } else csv(spark, path, schema, s, enc, header, nullValue)
  }

  /** First `sampleBytes` of the first file matching `path` (literal, dir,
    * or glob) through the Hadoop FS — works on any scheme. */
  private def samplePrefix(spark: SparkSession, path: String, sampleBytes: Int): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val first = matched.flatMap { st =>
      if (st.isFile) Some(st.getPath)
      else fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath)
        .sortBy(_.getName).headOption
    }.sortBy(_.getName).headOption
      .getOrElse(throw new java.io.FileNotFoundException(s"no files match $path"))
    val in = fs.open(first)
    try {
      val buf = new Array[Byte](sampleBytes)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }

  /** Strict UTF-8 validation; a multi-byte sequence truncated by the
    * sample boundary does not count as invalid. */
  private[sources] def isValidUtf8Prefix(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val need =
        if (b < 0x80) 0
        else if ((b & 0xe0) == 0xc0 && b >= 0xc2) 1
        else if ((b & 0xf0) == 0xe0) 2
        else if ((b & 0xf8) == 0xf0 && b <= 0xf4) 3
        else return false
      // validate every continuation byte that fits in the sample; only the
      // ones cut off by the boundary get the benefit of the doubt (a bare
      // latin-1 0xE9 followed by ASCII must still be caught near the tail)
      var k = 1
      while (k <= need) {
        if (i + k >= bytes.length) return true // truncated tail sequence
        if ((bytes(i + k) & 0xc0) != 0x80) return false
        k += 1
      }
      i += need + 1
    }
    true
  }

  /** S8: JSON scan with explicit schema (schema-first everywhere —
    * inference only belongs at exploratory edges). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S6: raw log scan — one string column per line; parsing is a projection
    * (see pipelines.LogMetrics), not a driver-side loop. */
  def rawLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
