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

  /** Two-sheet workbook with workbook.xml + rels: tab order is Données
    * (sheet2.xml part) then Résumé (sheet1.xml part) — deliberately
    * reversed so selection must go through the rels, not part numbering. */
  private def makeTwoSheetXlsx(): Array[Byte] = {
    val workbook =
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="Donn&#233;es" sheetId="4" r:id="rId7"/>
        |<sheet name="Résumé" sheetId="1" r:id="rId3"/>
        |</sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId7" Type="w" Target="worksheets/sheet2.xml"/>
        |<Relationship Id="rId3" Type="w" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val donnees =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>city</t></is></c><c r="B1" t="inlineStr"><is><t>v</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>Aix</t></is></c><c r="B2"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val resume =
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>total</t></is></c></row>
        |<row r="2"><c r="A2"><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    for ((name, content) <- Seq("xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> rels,
        "xl/worksheets/sheet1.xml" -> resume,
        "xl/worksheets/sheet2.xml" -> donnees)) {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("sheet selection by name, index, and tab-order first") {
    val dir = Files.createTempDirectory("graft-xlsx2").toString
    val out = new FileOutputStream(s"$dir/t.xlsx")
    out.write(makeTwoSheetXlsx()); out.close()
    // first = tab order (Données on part sheet2.xml), not part numbering
    assert(Xlsx.read(spark, s"$dir/*.xlsx").columns.toSeq == Seq("city", "v"))
    // by name, entity-unescaped; second sheet readable
    val byName = Xlsx.read(spark, s"$dir/*.xlsx", Xlsx.Sheet.ByName("Résumé"))
    assert(byName.columns.toSeq == Seq("total"))
    assert(byName.as[String].collect().toSeq == Seq("99"))
    assert(Xlsx.read(spark, s"$dir/*.xlsx", Xlsx.Sheet.ByIndex(1))
      .columns.toSeq == Seq("total"))
    // unknown sheet: error names the available tabs
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, s"$dir/*.xlsx", Xlsx.Sheet.ByName("nope"))
    }
    assert(e.getMessage.contains("Données") && e.getMessage.contains("Résumé"))
  }

  /** Single-sheet workbook of inline strings, header + one data row. */
  private def inlineXlsx(header: Seq[String], row: Seq[String]): Array[Byte] = {
    def xmlRow(cells: Seq[String], rn: Int) =
      s"""<row r="$rn">""" + cells.zipWithIndex.map { case (v, i) =>
        s"""<c r="${('A' + i).toChar}$rn" t="inlineStr"><is><t>$v</t></is></c>"""
      }.mkString + "</row>"
    val sheet = "<worksheet><sheetData>" + xmlRow(header, 1) +
      xmlRow(row, 2) + "</sheetData></worksheet>"
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(sheet.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("mixed-header directory fails loudly; agreeing headers union fine") {
    val dir = Files.createTempDirectory("graft-xlsx-mixed").toString
    def put(name: String, bytes: Array[Byte]): Unit = {
      val out = new FileOutputStream(s"$dir/$name")
      out.write(bytes); out.close()
    }
    put("a.xlsx", inlineXlsx(Seq("name", "dept"), Seq("Aix", "13")))
    put("b.xlsx", inlineXlsx(Seq("name", "dept"), Seq("Lyon", "69")))
    val ok = Xlsx.read(spark, s"$dir/*.xlsx")
    assert(ok.columns.toSeq == Seq("name", "dept"))
    assert(ok.as[(String, String)].collect().toSet ==
      Set(("Aix", "13"), ("Lyon", "69")))
    // now a third file whose header disagrees: the read must fail naming it,
    // never silently shift its cells under the sniffed schema
    put("c.xlsx", inlineXlsx(Seq("name", "city"), Seq("Nice", "06")))
    val e = intercept[Exception] {
      Xlsx.read(spark, s"$dir/*.xlsx").collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("header mismatch"), s"got: $messages")
  }

  test("OLE2 magic dispatches to the BIFF8 reader regardless of extension") {
    // a real .xls whose extension LIES: magic wins, it still parses
    val dir = Files.createTempDirectory("graft-xls").toString
    val bytes = XlsWriter.xlsFile(
      Seq("s" -> (XlsWriter.label(0, 0, "h") ++ XlsWriter.label(1, 0, "v"))))
    val out = new FileOutputStream(s"$dir/lying.xlsx")
    out.write(bytes); out.close()
    val df = Xlsx.read(spark, s"$dir/lying.xlsx")
    assert(df.columns.toSeq == Seq("h") && df.count() == 1)
    // an empty OLE2 shell still fails with a clear structural error
    val e = intercept[IllegalArgumentException] {
      Xlsx.parseWorkbook(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
        .map(_.toByte) ++ new Array[Byte](512))
    }
    assert(e.getMessage.toLowerCase.contains("ole2") ||
      e.getMessage.toLowerCase.contains("directory"))
  }
}
