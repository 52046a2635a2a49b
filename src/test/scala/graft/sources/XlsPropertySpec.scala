package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import XlsWriter._

/** Adversarial BIFF8 property tests (VERDICT r6 item 7): the .xls surface
  * is 300 LoC of binary parsing and the least exercised in the repo, so
  * every structural degree of freedom gets a generator — RK encodings,
  * MULRK run shapes, SST CONTINUE splits (valid at char boundaries with
  * per-segment compression flags, and adversarial mid-character), empty
  * and truncated SSTs. Deterministic seeds (the UnaccentSpec pattern) so
  * failures replay. */
class XlsPropertySpec extends SparkSpec {

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // ---- RK encodings ----

  test("property: rkInt/rkX100 round-trip the full 30-bit signed range") {
    val g = Gen.choose(-(1 << 29), (1 << 29) - 1)
    (0 until 300).foreach { i =>
      val v = gen(g, i.toLong)
      assert(Xls.rkValue(rkInt(v)) == v.toDouble, s"rkInt($v)")
      assert(Xls.rkValue(rkX100Int(v)) == v.toDouble / 100.0, s"rkX100($v)")
    }
    // the boundary values themselves
    Seq(-(1 << 29), (1 << 29) - 1, 0, -1, 1).foreach { v =>
      assert(Xls.rkValue(rkInt(v)) == v.toDouble)
    }
  }

  test("property: IEEE RK form decodes as the high-30-bit truncated double") {
    val g = Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, 2.5, -2.5, 1e-300, Double.MaxValue))
    (0 until 300).foreach { i =>
      val d = gen(g, 1000L + i)
      val bits = java.lang.Double.doubleToLongBits(d)
      val rk = ((bits >> 32) & 0xfffffffcL).toInt
      val want = java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
      assert(Xls.rkValue(rk) == want || (Xls.rkValue(rk).isNaN && want.isNaN))
      assert(Xls.rkValue(rk | 1) == want / 100.0 ||
        (Xls.rkValue(rk | 1).isNaN && want.isNaN))
    }
  }

  // ---- MULRK runs ----

  test("property: MULRK runs of any width and start column parse cell-exactly") {
    val g = for {
      startCol <- Gen.choose(0, 200)
      vals <- Gen.nonEmptyListOf(Gen.choose(-(1 << 29), (1 << 29) - 1))
    } yield (startCol, vals.take(100))
    (0 until 60).foreach { i =>
      val (startCol, vals) = gen(g, 2000L + i)
      val body = mulRk(3, startCol, vals.map(rkInt))
      val rows = Xls.parseWorkbook(xlsFile(Seq("s" -> body)))
      assert(rows == Seq(vals.zipWithIndex.map { case (v, c) =>
        (startCol + c) -> v.toString
      }), s"seed ${2000 + i}: startCol=$startCol n=${vals.size}")
    }
  }

  test("degenerate MULRK (zero pairs) yields no cells and does not throw") {
    val body = mulRk(0, 0, Seq.empty) ++ number(1, 0, 7.0)
    assert(Xls.parseWorkbook(xlsFile(Seq("s" -> body))) == Seq(Seq(0 -> "7")))
  }

  // ---- SST CONTINUE splits ----

  /** Hand-assembled SST + CONTINUEs: `mid` is split at `cuts` (char
    * positions); each segment re-encodes with its own compression flag —
    * the BIFF8 continued-string rule the SegCursor must replay. */
  private def splitSstFixture(pre: String, mid: String, post: String,
                              cuts: Seq[Int]): Array[Byte] = {
    def charBytes(part: String, compressed: Boolean): Array[Byte] =
      if (compressed) part.getBytes("ISO-8859-1") else part.getBytes("UTF-16LE")
    def canCompress(part: String): Boolean = part.forall(_ <= 0xff)
    val bounds = (0 +: cuts.sorted :+ mid.length).distinct
    val parts = bounds.zip(bounds.tail).map { case (a, b) => mid.substring(a, b) }
    val head = parts.head
    val headCompressed = canCompress(head)
    val sstPayload =
      le16(3).padTo(4, 0.toByte) ++ le16(3).padTo(4, 0.toByte) ++ // total, unique
        sstString(pre) ++
        le16(mid.length) ++ Array((if (headCompressed) 0 else 1).toByte) ++
        charBytes(head, headCompressed)
    val continues = parts.tail.zipWithIndex.map { case (p, pi) =>
      val compressed = canCompress(p)
      val payload = Array((if (compressed) 0 else 1).toByte) ++
        charBytes(p, compressed) ++
        (if (pi == parts.tail.length - 1) sstString(post) else Array.empty[Byte])
      le16(0x3c) ++ le16(payload.length) ++ payload
    }
    val globals0 = bofGlobals ++
      le16(0xfc) ++ le16(sstPayload.length) ++ sstPayload ++
      continues.flatten
    val body = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2)
    val globals = globals0 ++
      boundsheet(globals0.length + boundsheet(0, "s").length + eof.length, "s") ++ eof
    ole2("Workbook", globals ++ bofSheet ++ body ++ eof)
  }

  test("property: SST strings split at char boundaries across CONTINUEs round-trip") {
    // mixed Latin-1 and beyond-Latin-1 chars: segments containing a wide
    // char force the uncompressed (UTF-16) encoding, so random cuts
    // exercise compression-flag switches in BOTH directions
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ü', 'ß', 'ç'),
      2 -> Gen.oneOf('€', 'λ', 'Ж', '中'))
    val g = for {
      mid <- Gen.listOfN(24, charGen).map(_.mkString)
      nCuts <- Gen.choose(1, 3)
      cuts <- Gen.listOfN(nCuts, Gen.choose(1, mid.length - 1))
    } yield (mid, cuts.distinct)
    (0 until 80).foreach { i =>
      val (mid, cuts) = gen(g, 3000L + i)
      val rows = Xls.parseWorkbook(splitSstFixture("first", mid, "last", cuts))
      assert(rows == Seq(Seq(0 -> "first", 1 -> mid, 2 -> "last")),
        s"seed ${3000 + i}: cuts=$cuts mid=$mid")
    }
  }

  test("adversarial: CONTINUE splitting a UTF-16 char MID-BYTE terminates cleanly") {
    // out-of-spec on purpose: the boundary lands between the two bytes of a
    // UTF-16 code unit, so the resumed segment's first byte is data that
    // the parser will read as a flags byte. Values are undefined; the
    // contract is termination without a crash and intact neighbors.
    val mid = "λµΩ"
    val midBytes = mid.getBytes("UTF-16LE")
    val (a, b) = midBytes.splitAt(3) // mid-character: 3 is odd
    val sstPayload = le16(3).padTo(4, 0.toByte) ++ le16(3).padTo(4, 0.toByte) ++
      sstString("first") ++
      le16(mid.length) ++ Array(1.toByte) ++ a
    val contPayload = b ++ sstString("last")
    val globals0 = bofGlobals ++
      le16(0xfc) ++ le16(sstPayload.length) ++ sstPayload ++
      le16(0x3c) ++ le16(contPayload.length) ++ contPayload
    val body = labelSst(0, 0, 0) ++ labelSst(0, 2, 2)
    val globals = globals0 ++
      boundsheet(globals0.length + boundsheet(0, "s").length + eof.length, "s") ++ eof
    val rows = Xls.parseWorkbook(ole2("Workbook", globals ++ bofSheet ++ body ++ eof))
    assert(rows.head.head == (0 -> "first"))
    assert(rows.head.size == 2) // the third cell exists, value undefined
  }

  // ---- SST degenerate shapes ----

  test("empty SST with dangling LABELSST references yields no string cells") {
    def emptySst = le16(0xfc) ++ le16(8) ++ Array.fill(8)(0.toByte)
    val body = labelSst(0, 0, 0) ++ labelSst(0, 1, 5) ++ number(1, 0, 3.0)
    val globals0 = bofGlobals ++ emptySst
    val globals = globals0 ++
      boundsheet(globals0.length + boundsheet(0, "s").length + eof.length, "s") ++ eof
    val rows = Xls.parseWorkbook(ole2("Workbook", globals ++ bofSheet ++ body ++ eof))
    assert(rows == Seq(Seq(0 -> "3")))
  }

  test("truncated SST (declares more strings than present) fails loudly, fast") {
    // unique=3 but only one string of data: the cursor must hit the
    // truncation guard, not walk off into unrelated bytes or spin
    val sstPayload = le16(3).padTo(4, 0.toByte) ++ le16(3).padTo(4, 0.toByte) ++
      sstString("only")
    val globals0 = bofGlobals ++ le16(0xfc) ++ le16(sstPayload.length) ++ sstPayload
    val globals = globals0 ++
      boundsheet(globals0.length + boundsheet(0, "s").length + eof.length, "s") ++ eof
    val bytes = ole2("Workbook", globals ++ bofSheet ++ label(0, 0, "x") ++ eof)
    val e = intercept[IllegalArgumentException] { Xls.parseWorkbook(bytes) }
    assert(e.getMessage.contains("truncated"))
  }

  // ---- whole-workbook round-trip ----

  test("property: generated workbooks of mixed cell types parse value-exactly") {
    sealed trait Cell { def expected: String }
    case class L(s: String) extends Cell { def expected = s }
    case class N(v: Long) extends Cell { def expected = v.toString }
    case class Half(v: Int) extends Cell { def expected = (v + 0.5).toString }
    case class RkI(v: Int) extends Cell { def expected = v.toString }
    case class B(b: Boolean) extends Cell { def expected = if (b) "TRUE" else "FALSE" }
    val latin1 = Gen.listOfN(8,
      Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', 'ü', 'ç', ' ')))
      .map(_.mkString)
    val cellGen: Gen[Cell] = Gen.frequency(
      3 -> latin1.map(L),
      2 -> Gen.choose(-999999L, 999999L).map(N),
      1 -> Gen.choose(-1000, 1000).map(Half),
      2 -> Gen.choose(-(1 << 29), (1 << 29) - 1).map(RkI),
      1 -> Gen.oneOf(true, false).map(B))
    val rowsGen = Gen.listOfN(6, Gen.listOfN(4, cellGen))
    (0 until 40).foreach { i =>
      val model = gen(rowsGen, 4000L + i)
      val body = model.zipWithIndex.flatMap { case (cells, r) =>
        cells.zipWithIndex.flatMap { case (c, col) =>
          (c match {
            case L(s) => label(r, col, s)
            case N(v) => number(r, col, v.toDouble)
            case Half(v) => number(r, col, v + 0.5)
            case RkI(v) => rk(r, col, rkInt(v))
            case B(b) => boolErr(r, col, b)
          }).toSeq
        }
      }.toArray
      val parsed = Xls.parseWorkbook(xlsFile(Seq("s" -> body)))
      val want = model.map(_.zipWithIndex.map { case (c, col) => col -> c.expected })
      assert(parsed == want, s"seed ${4000 + i}")
    }
  }
}
