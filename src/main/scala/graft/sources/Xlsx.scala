package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4: Excel scan without external libraries. An .xlsx file is a zip of XML
  * parts; this reads `xl/sharedStrings.xml` + the first worksheet and
  * regex-parses rows/cells (shared, inline and numeric cells; formulas
  * resolve to their cached <v>). Covers the reference's
  * `read_excel(engine=..., sheet from profile)` ingestion
  * (`schema/utils/consolidation.py:911-947`) for the common flat-table
  * case. All values surface as strings — the reference reads Excel with
  * dtype=str too; schema-first casting happens downstream.
  *
  * The header is sniffed driver-side from one file (schema must be known
  * before the plan); cell parsing runs in executors over binaryFile rows,
  * so many files scale out.
  */
object Xlsx {

  // self-closing branch FIRST: otherwise <c r="B3"/> gets swallowed into the
  // lazy body of the paired-tag branch together with the following cell
  private val CellRe =
    """(?s)<c(?:\s[^>]*?)?r="([A-Z]+)\d+"[^>]*/>|<c(?:\s[^>]*?)?r="([A-Z]+)\d+"([^>]*)>(.*?)</c>""".r
  private val RowRe = """(?s)<row[^>]*>(.*?)</row>""".r
  private val SiRe = """(?s)<si>(.*?)</si>""".r
  private val TRe = """(?s)<t[^>]*>(.*?)</t>""".r
  private val VRe = """(?s)<v[^>]*>(.*?)</v>""".r

  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    .replace("&apos;", "'").replace("&amp;", "&")

  /** Parse one workbook's bytes into rows of (colIdx -> value) strings. */
  def parseWorkbook(bytes: Array[Byte]): Seq[Seq[(Int, String)]] = {
    var shared = ""
    var sheet = ""
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") shared = new String(zis.readAllBytes, "UTF-8")
        else if (e.getName.matches("xl/worksheets/sheet1\\.xml") && sheet.isEmpty)
          sheet = new String(zis.readAllBytes, "UTF-8")
        e = zis.getNextEntry
      }
    } finally zis.close()
    val strings = SiRe.findAllMatchIn(shared)
      .map(m => TRe.findAllMatchIn(m.group(1)).map(_.group(1)).mkString).toVector
    RowRe.findAllMatchIn(sheet).map { rm =>
      CellRe.findAllMatchIn(rm.group(1)).flatMap { cm =>
        if (cm.group(1) != null) None // self-closing: empty cell
        else {
          val idx = colIndex(cm.group(2))
          val attrs = cm.group(3)
          val body = cm.group(4)
          val v =
            if (attrs.contains("t=\"s\""))
              VRe.findFirstMatchIn(body).map(m => strings(m.group(1).trim.toInt)).getOrElse("")
            else if (attrs.contains("t=\"inlineStr\""))
              TRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
            else VRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
          Some(idx -> unescape(v))
        }
      }.toSeq
    }.toSeq
  }

  /** Read .xlsx file(s) at `path` into a string-typed DataFrame; first row
    * is the header. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
    // header sniff: one file on the driver fixes the schema
    val firstBytes = files.select("content").head().getAs[Array[Byte]](0)
    val headerCells = parseWorkbook(firstBytes).headOption.getOrElse(Seq.empty)
    val header = headerCells.sortBy(_._1).map(_._2)
    val n = header.size
    val schema = StructType(header.map(StructField(_, StringType)))
    val enc = RowEncoder.encoderFor(schema)
    files.select("content").mapPartitions { rows =>
      rows.flatMap { r =>
        parseWorkbook(r.getAs[Array[Byte]](0)).drop(1).map { cells =>
          val arr = Array.fill[String](n)(null)
          cells.foreach { case (i, v) => if (i < n) arr(i) = v }
          Row(arr.toIndexedSeq: _*)
        }
      }
    }(enc)
  }
}
