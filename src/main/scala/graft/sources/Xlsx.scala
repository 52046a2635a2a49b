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
  // lazy body of the paired-tag branch together with the following cell.
  // r="..." is optional (legal OOXML): unreferenced cells take the position
  // after the previous cell.
  private val CellRe =
    """(?s)<c((?:\s[^>]*?)?)/>|<c((?:\s[^>]*?)?)>(.*?)</c>""".r
  private val RefRe = """r="([A-Z]+)\d+"""".r
  private val RowRe = """(?s)<row[^>]*>(.*?)</row>""".r
  private val SiRe = """(?s)<si>(.*?)</si>""".r
  private val TRe = """(?s)<t[^>]*>(.*?)</t>""".r
  private val VRe = """(?s)<v[^>]*>(.*?)</v>""".r

  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def unescape(s: String): String = {
    val numeric = """&#(x?)([0-9A-Fa-f]+);""".r.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(2), if (m.group(1).isEmpty) 10 else 16).toChar.toString))
    numeric
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
  }

  /** Parse one workbook's bytes into rows of (colIdx -> value) strings.
    * Reads the lowest-numbered `xl/worksheets/sheetN.xml` part (an
    * approximation of "first sheet" that survives deleted sheets).
    * Known divergences from a full Excel reader, by design: date cells
    * surface as raw day serials and styled numbers as stored values (no
    * styles.xml interpretation); booleans surface as TRUE/FALSE. */
  def parseWorkbook(bytes: Array[Byte]): Seq[Seq[(Int, String)]] = {
    var shared = ""
    val sheets = scala.collection.mutable.SortedMap.empty[Int, String]
    val SheetName = """xl/worksheets/sheet(\d+)\.xml""".r
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => shared = new String(zis.readAllBytes, "UTF-8")
          case SheetName(n) => sheets(n.toInt) = new String(zis.readAllBytes, "UTF-8")
          case _ =>
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    val sheet = sheets.headOption.map(_._2).getOrElse("")
    val strings = SiRe.findAllMatchIn(shared)
      .map(m => TRe.findAllMatchIn(m.group(1)).map(_.group(1)).mkString).toVector
    RowRe.findAllMatchIn(sheet).map { rm =>
      var cursor = 0 // next column when a cell has no r="..." reference
      CellRe.findAllMatchIn(rm.group(1)).flatMap { cm =>
        val attrs = Option(cm.group(1)).getOrElse(cm.group(2))
        val idx = RefRe.findFirstMatchIn(attrs).map(m => colIndex(m.group(1)))
          .getOrElse(cursor)
        cursor = idx + 1
        if (cm.group(1) != null) None // self-closing: empty cell
        else {
          val body = cm.group(3)
          val v =
            if (attrs.contains("t=\"s\""))
              VRe.findFirstMatchIn(body).map(m => strings(m.group(1).trim.toInt)).getOrElse("")
            else if (attrs.contains("t=\"inlineStr\""))
              TRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
            else if (attrs.contains("t=\"b\""))
              VRe.findFirstMatchIn(body).map(m =>
                if (m.group(1).trim == "1") "TRUE" else "FALSE").getOrElse("")
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
    // header sniff: one file on the driver fixes the schema. Columns keep
    // their ABSOLUTE sheet positions (a gap in the header row becomes a
    // col_N placeholder) so data cells can never shift under the wrong
    // header.
    val firstBytes = files.select("content").head().getAs[Array[Byte]](0)
    val headerCells = parseWorkbook(firstBytes).headOption.getOrElse(Seq.empty).toMap
    val n = if (headerCells.isEmpty) 0 else headerCells.keys.max + 1
    val header = (0 until n).map(i => headerCells.get(i).filter(_.nonEmpty)
      .getOrElse(s"col_$i"))
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
