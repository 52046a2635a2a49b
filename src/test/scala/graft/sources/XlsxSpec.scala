package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def makeXlsx(): Array[Byte] = {
    val shared =
      """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>dept</t></si>
        |<si><t>Aix&amp;Arles</t></si><si><t>Lyon</t></si></sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>pop</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>13</v></c><c r="C2"><v>52000.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"/><c r="C3"><v>513000</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    for ((name, content) <- Seq("xl/sharedStrings.xml" -> shared,
        "xl/worksheets/sheet1.xml" -> sheet)) {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("xlsx scan: shared/inline/numeric cells, empty cells, entity unescape") {
    val dir = Files.createTempDirectory("graft-xlsx").toString
    val out = new FileOutputStream(s"$dir/t.xlsx")
    out.write(makeXlsx()); out.close()
    val df = Xlsx.read(spark, s"$dir/*.xlsx")
    assert(df.columns.toSeq == Seq("name", "dept", "pop"))
    val rows = df.as[(String, String, String)].collect().toSet
    assert(rows == Set(("Aix&Arles", "13", "52000.5"), ("Lyon", null, "513000")))
  }
}
