package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files

import graft.SparkSpec
import XlsWriter._

/** Legacy .xls: pure-JDK OLE2 + BIFF8 reader against REAL generated files
  * (the fixtures are valid compound documents — both the mini-stream and
  * the regular-FAT layouts — with genuine BIFF8 record streams). */
class XlsSpec extends SparkSpec {

  private def sheet1Body: Array[Byte] =
    labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ label(0, 2, "score") ++
      labelSst(1, 0, 2) ++ number(1, 1, 12.5) ++ rk(1, 2, rkInt(30)) ++
      label(2, 0, "Lyon") ++ rk(2, 1, rkX100Int(1234)) ++ // 12.34
      mulRk(3, 0, Seq(rkInt(7), rkInt(8), rkInt(9))) ++
      boolErr(4, 0, b = true) ++ formulaNum(4, 1, 99.0) ++
      formulaString(4, 2, "calc")

  private def fixture: Array[Byte] = xlsFile(
    Seq("Données" -> sheet1Body,
      "Résumé" -> (label(0, 0, "k") ++ label(1, 0, "v2"))),
    sst = Seq("ville", "état", "Paris"))

  test("parses a real mini-stream .xls: SST, RK, MULRK, BOOLERR, FORMULA") {
    val rows = Xls.parseWorkbook(fixture)
    assert(rows(0) == Seq(0 -> "ville", 1 -> "état", 2 -> "score"))
    assert(rows(1) == Seq(0 -> "Paris", 1 -> "12.5", 2 -> "30"))
    assert(rows(2) == Seq(0 -> "Lyon", 1 -> "12.34"))
    assert(rows(3) == Seq(0 -> "7", 1 -> "8", 2 -> "9"))
    assert(rows(4) == Seq(0 -> "TRUE", 1 -> "99", 2 -> "calc"))
  }

  test("sheet selection by name and index; unknown name lists the tabs") {
    val byName = Xls.parseWorkbook(fixture, Xlsx.Sheet.ByName("Résumé"))
    assert(byName == Seq(Seq(0 -> "k"), Seq(0 -> "v2")))
    assert(Xls.parseWorkbook(fixture, Xlsx.Sheet.ByIndex(1)) == byName)
    val e = intercept[IllegalArgumentException] {
      Xls.parseWorkbook(fixture, Xlsx.Sheet.ByName("nope"))
    }
    assert(e.getMessage.contains("Données") && e.getMessage.contains("Résumé"))
  }

  test("large .xls takes the regular-FAT path (stream >= 4096 bytes)") {
    val body = (0 until 400).map(r => number(r, 0, r * 1.0))
      .reduce(_ ++ _)
    val bytes = xlsFile(Seq("big" -> body))
    assert(workbookStream(Seq("big" -> body)).length >= 4096,
      "fixture must exceed the mini cutoff to exercise the FAT path")
    val rows = Xls.parseWorkbook(bytes)
    assert(rows.size == 400)
    assert(rows(0) == Seq(0 -> "0") && rows(399) == Seq(0 -> "399"))
  }

  test("SST spanning a CONTINUE record, split mid-string with repeated flags") {
    // hand-built: SST carries "alpha" + the header and first 3 chars of
    // "continued"; the CONTINUE opens with a fresh flags byte and the rest,
    // then a third full string
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val sstPayload = le16(3).padTo(4, 0.toByte) ++ le16(3).padTo(4, 0.toByte) ++
      sstString("alpha") ++
      le16(9) ++ Array(0.toByte) ++ "con".getBytes("ISO-8859-1")
    val contPayload = Array(0.toByte) ++ "tinued".getBytes("ISO-8859-1") ++
      sstString("omega")
    val globals = bofGlobals ++
      le16(0xfc) ++ le16(sstPayload.length) ++ sstPayload ++
      le16(0x3c) ++ le16(contPayload.length) ++ contPayload
    val body = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2)
    val globalsFull = globals ++
      boundsheet(globals.length + boundsheet(0, "s").length + eof.length, "s") ++ eof
    val stream = globalsFull ++ bofSheet ++ body ++ eof
    val rows = Xls.parseWorkbook(ole2("Workbook", stream))
    assert(rows == Seq(Seq(0 -> "alpha", 1 -> "continued", 2 -> "omega")))
  }

  test("Xlsx.read dispatches .xls by magic into a string DataFrame") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-xls").toString
    val out = new FileOutputStream(s"$dir/legacy.xls")
    out.write(fixture); out.close()
    val df = Xlsx.read(spark, s"$dir/*.xls")
    assert(df.columns.toSeq == Seq("ville", "état", "score"))
    assert(df.count() == 4)
    assert(df.filter($"ville" === "Paris").select("état").as[String].head() == "12.5")
    // the same Sheet selectors work through the dispatch
    val byName = Xlsx.read(spark, s"$dir/*.xls", Xlsx.Sheet.ByName("Résumé"))
    assert(byName.columns.toSeq == Seq("k"))
    assert(byName.as[String].collect().toSeq == Seq("v2"))
  }

  test("rkValue decodes all four RK encodings") {
    assert(Xls.rkValue(rkInt(30)) == 30.0)
    assert(Xls.rkValue(rkInt(-5)) == -5.0)
    assert(Xls.rkValue(rkX100Int(1234)) == 12.34)
    // IEEE form: high 30 bits of the double 2.5
    val bits = java.lang.Double.doubleToLongBits(2.5)
    assert(Xls.rkValue(((bits >> 32) & 0xfffffffcL).toInt) == 2.5)
    assert(Xls.rkValue((((bits >> 32) & 0xfffffffcL) | 1L).toInt) == 0.025)
  }

  test("truncated/garbage OLE2 fails with clear errors, zip path unaffected") {
    val e = intercept[IllegalArgumentException] {
      Xls.parseWorkbook("PKnot ole".getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("OLE2") || e.getMessage.contains("not an OLE2"))
    // an OLE2 container whose stream is not named Workbook/Book
    val wrong = ole2("Nothing", workbookStream(Seq("s" -> label(0, 0, "x"))))
    val e2 = intercept[IllegalArgumentException] { Xls.parseWorkbook(wrong) }
    assert(e2.getMessage.contains("Workbook"))
  }
}
