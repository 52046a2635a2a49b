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

  /** Sheet selector: workbook order (`First`/`ByIndex`) or tab name
    * (`ByName`), resolved through `xl/workbook.xml` + its rels part —
    * the reference reads the sheet from a profile
    * (`schema/utils/consolidation.py:911-947`). */
  sealed trait Sheet
  object Sheet {
    case object First extends Sheet
    final case class ByIndex(i: Int) extends Sheet
    final case class ByName(name: String) extends Sheet
  }

  private val WbSheetRe =
    """<sheet\s[^>]*?/?>""".r
  private val AttrNameRe = """\sname="([^"]*)"""".r
  private val AttrRidRe = """\sr:id="([^"]*)"""".r
  private val RelRe = """<Relationship\s[^>]*?/?>""".r
  private val AttrIdRe = """\sId="([^"]*)"""".r
  private val AttrTargetRe = """\sTarget="([^"]*)"""".r

  /** Parse one workbook's bytes into rows of (colIdx -> value) strings for
    * the selected sheet. Legacy .xls payloads (OLE2 magic) dispatch to the
    * pure-JDK BIFF8 reader ([[Xls]]) — the reference's engine sniff
    * (`schema/utils/consolidation.py:905-947`). For .xlsx, selection
    * resolves `xl/workbook.xml` sheet order / tab names through the rels
    * part to the worksheet entry; workbooks missing those parts fall back
    * to the lowest-numbered `xl/worksheets/sheetN.xml`. Known divergences
    * from a full Excel reader, by design: date cells surface as raw day
    * serials and styled numbers as stored values (no styles.xml
    * interpretation); booleans surface as TRUE/FALSE. */
  def parseWorkbook(bytes: Array[Byte], select: Sheet = Sheet.First): Seq[Seq[(Int, String)]] = {
    if (Xls.isOle2(bytes)) return Xls.parseWorkbook(bytes, select)
    var shared = ""
    var workbook = ""
    var rels = ""
    val parts = scala.collection.mutable.SortedMap.empty[String, String]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => shared = new String(zis.readAllBytes, "UTF-8")
          case "xl/workbook.xml" => workbook = new String(zis.readAllBytes, "UTF-8")
          case "xl/_rels/workbook.xml.rels" => rels = new String(zis.readAllBytes, "UTF-8")
          case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
            parts(n) = new String(zis.readAllBytes, "UTF-8")
          case _ =>
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    // workbook.xml lists sheets in tab order; rels maps r:id -> part path
    val relTargets = RelRe.findAllMatchIn(rels).flatMap { m =>
      for {
        id <- AttrIdRe.findFirstMatchIn(m.matched).map(_.group(1))
        t <- AttrTargetRe.findFirstMatchIn(m.matched).map(_.group(1))
      } yield id -> ("xl/" + t.stripPrefix("/xl/").stripPrefix("/"))
    }.toMap
    val ordered: Vector[(String, Option[String])] =
      WbSheetRe.findAllMatchIn(workbook).map { m =>
        val name = AttrNameRe.findFirstMatchIn(m.matched).map(m => unescape(m.group(1)))
        val part = AttrRidRe.findFirstMatchIn(m.matched).map(_.group(1))
          .flatMap(relTargets.get)
        (name.getOrElse(""), part)
      }.toVector
    def resolve(part: Option[Option[String]]): String = part match {
      case Some(Some(p)) => parts.getOrElse(p,
        throw new IllegalArgumentException(s"worksheet part $p missing from workbook"))
      case Some(None) => throw new IllegalArgumentException(
        "sheet found in workbook.xml but its rels target is missing")
      case None => throw new IllegalArgumentException(
        s"sheet not found; workbook has ${ordered.map(_._1).mkString("[", ", ", "]")}")
    }
    val SheetNum = """xl/worksheets/sheet(\d+)\.xml""".r
    def lowestNumbered: String = parts.toSeq
      .flatMap { case (n, xml) => n match {
        case SheetNum(i) => Some(i.toInt -> xml); case _ => None } }
      .sortBy(_._1).headOption.map(_._2).getOrElse("")
    val sheet = select match {
      case Sheet.First =>
        if (ordered.nonEmpty) resolve(Some(ordered.head._2)) else lowestNumbered
      case Sheet.ByIndex(i) =>
        if (ordered.nonEmpty) resolve(ordered.lift(i).map(_._2))
        else throw new IllegalArgumentException(s"workbook.xml missing; cannot index sheet $i")
      case Sheet.ByName(n) => resolve(ordered.find(_._1 == n).map(_._2))
    }
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

  /** Read .xlsx / legacy .xls file(s) at `path` into a string-typed
    * DataFrame; first row is the header. `sheet` selects the worksheet
    * (default: first in tab order). The format is dispatched per file by
    * magic bytes — zip container → XML parse, OLE2 container → BIFF8
    * ([[Xls]]) — so a mixed directory of old and new uploads reads in one
    * pass, like the reference's engine-sniffing consolidation. */
  /** Header vector of a parsed workbook: absolute sheet positions, gaps
    * becoming col_N placeholders (so data cells can never shift under the
    * wrong header). */
  private def headerOf(rows: Seq[Seq[(Int, String)]]): Seq[String] = {
    val cells = rows.headOption.getOrElse(Seq.empty).toMap
    val n = if (cells.isEmpty) 0 else cells.keys.max + 1
    (0 until n).map(i => cells.get(i).filter(_.nonEmpty).getOrElse(s"col_$i"))
  }

  def read(spark: SparkSession, path: String, sheet: Sheet = Sheet.First): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
    // header sniff: one file on the driver fixes the schema; every other
    // file's header row is then ASSERTED against it at parse time — a
    // directory mixing layouts fails loudly (naming the odd file) instead
    // of silently reading its cells under shifted column names.
    val firstBytes = files.select("content").head().getAs[Array[Byte]](0)
    val header = headerOf(parseWorkbook(firstBytes, sheet))
    val n = header.size
    val schema = StructType(header.map(StructField(_, StringType)))
    val enc = RowEncoder.encoderFor(schema)
    files.select("path", "content").mapPartitions { rows =>
      rows.flatMap { r =>
        val parsed = parseWorkbook(r.getAs[Array[Byte]]("content"), sheet)
        val h = headerOf(parsed)
        // an empty workbook contributes zero rows — that is not a layout
        // mismatch (user-upload dirs really contain them)
        require(parsed.isEmpty || h == header,
          s"header mismatch in ${r.getAs[String]("path")}: directory schema " +
            s"is ${header.mkString("[", ", ", "]")} but this file has " +
            h.mkString("[", ", ", "]"))
        parsed.drop(1).map { cells =>
          val arr = Array.fill[String](n)(null)
          cells.foreach { case (i, v) => if (i < n) arr(i) = v }
          Row(arr.toIndexedSeq: _*)
        }
      }
    }(enc)
  }
}
