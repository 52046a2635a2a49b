package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Legacy `.xls` (BIFF8 inside an OLE2 compound document) reader — pure
  * JDK, no dependencies, mirroring the reference's legacy-upload path
  * (`schema/utils/consolidation.py:905-947` sniffs the engine and falls
  * back to the xlrd-style binary reader for old uploads).
  *
  * Scope (same stance as the sibling .xlsx parser): cell VALUES as
  * strings — SST/LABELSST/LABEL text, NUMBER/RK/MULRK numerics (integral
  * doubles render without a decimal point), BOOLERR booleans as
  * TRUE/FALSE, FORMULA cached results (number / string / boolean). Dates
  * surface as raw day serials and styled numbers as stored values — no
  * format-table interpretation, by design. Errors and blanks yield no
  * cell.
  *
  * Format references are the public [MS-CFB] (compound file) and
  * [MS-XLS] (BIFF8) specifications.
  */
object Xls {

  private val Magic: Array[Byte] =
    Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)

  def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Magic)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int = u16(b, i) | (u16(b, i + 2) << 16)

  /** Walks a FAT chain from `start`, cycle-guarded. Sentinels (ENDOFCHAIN
    * 0xFFFFFFFE etc.) are negative as Ints, ending the walk. */
  private def chain(start: Int, fat: Array[Int]): Seq[Int] = {
    val out = ArrayBuffer[Int]()
    val seen = scala.collection.mutable.HashSet[Int]()
    var c = start
    while (c >= 0 && c < fat.length && seen.add(c)) { out += c; c = fat(c) }
    out.toSeq
  }

  /** Extracts the first stream whose name is in `names` from an OLE2
    * compound file — FAT chains for streams past the mini cutoff, the
    * root-entry mini stream + miniFAT for small ones. */
  private[sources] def ole2Stream(bytes: Array[Byte], names: Set[String]): Array[Byte] = {
    require(isOle2(bytes), "not an OLE2 compound document")
    val ssz = 1 << u16(bytes, 30)
    val msz = 1 << u16(bytes, 32)
    val nFat = i32(bytes, 44)
    val dirStart = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val miniFatStart = i32(bytes, 60)
    val nDifat = i32(bytes, 72)
    def sector(id: Int): Int = 512 + id * ssz
    // DIFAT: 109 header entries, then chained DIFAT sectors
    val difat = ArrayBuffer[Int]()
    for (i <- 0 until 109) difat += i32(bytes, 76 + 4 * i)
    var ds = i32(bytes, 68)
    var guard = 0
    while (ds >= 0 && guard <= nDifat) {
      val base = sector(ds)
      for (i <- 0 until ssz / 4 - 1) difat += i32(bytes, base + 4 * i)
      ds = i32(bytes, base + ssz - 4)
      guard += 1
    }
    val fat: Array[Int] = difat.take(nFat).filter(_ >= 0).toArray
      .flatMap(s => (0 until ssz / 4).map(i => i32(bytes, sector(s) + 4 * i)))
    def sectorsData(ids: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte](ids.size * ssz)
      ids.zipWithIndex.foreach { case (s, k) =>
        System.arraycopy(bytes, sector(s), out, k * ssz, ssz)
      }
      out
    }
    val dirBytes = sectorsData(chain(dirStart, fat))
    final case class Entry(name: String, typ: Int, start: Int, size: Int)
    val entries = (0 until dirBytes.length / 128).map { e =>
      val off = e * 128
      val nameLen = u16(dirBytes, off + 64)
      val name = if (nameLen >= 2)
        new String(dirBytes, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, u8(dirBytes, off + 66), i32(dirBytes, off + 116), i32(dirBytes, off + 120))
    }
    val root = entries.find(_.typ == 5).getOrElse(
      throw new IllegalArgumentException("OLE2: no root directory entry"))
    val target = entries.find(e => e.typ == 2 && names.contains(e.name)).getOrElse(
      throw new IllegalArgumentException(
        s"OLE2: no ${names.mkString("/")} stream; entries: " +
          entries.filter(_.typ == 2).map(_.name).mkString("[", ", ", "]")))
    val data =
      if (target.size >= miniCutoff) sectorsData(chain(target.start, fat))
      else {
        val container = sectorsData(chain(root.start, fat))
        val miniFat = sectorsData(chain(miniFatStart, fat))
        val mf = Array.tabulate(miniFat.length / 4)(i => i32(miniFat, 4 * i))
        val minis = chain(target.start, mf)
        val out = new Array[Byte](minis.size * msz)
        minis.zipWithIndex.foreach { case (ms, k) =>
          System.arraycopy(container, ms * msz, out, k * msz, msz)
        }
        out
      }
    java.util.Arrays.copyOf(data, target.size)
  }

  // ---- BIFF8 ----

  private final case class Rec(id: Int, off: Int, len: Int)

  private def records(s: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var p = 0
    var done = false
    while (!done && p + 4 <= s.length) {
      val id = u16(s, p)
      val len = u16(s, p + 2)
      if (id == 0 || p + 4 + len > s.length) done = true // trailing padding
      else { out += Rec(id, p + 4, len); p += 4 + len }
    }
    out.result()
  }

  /** Cursor over the logical byte stream of one record plus its CONTINUE
    * records. Fixed-width fields flow byte-wise across segment boundaries;
    * CHARACTER data must use readChars, which re-reads the per-segment
    * compression flag at each boundary (the BIFF8 continued-string rule). */
  private final class SegCursor(s: Array[Byte], segs: IndexedSeq[Rec]) {
    private var seg = 0
    private var pos = 0
    private def boundary(): Unit =
      while (seg < segs.size && pos == segs(seg).len) { seg += 1; pos = 0 }
    def hasMore: Boolean = { boundary(); seg < segs.size }
    def u8c(): Int = {
      boundary()
      // a truncated stream (SST declaring more strings/chars than its
      // records carry) must fail loudly here, not as an arbitrary
      // IndexOutOfBounds from whatever bytes follow the last segment
      require(seg < segs.size, "BIFF: truncated record stream")
      val v = u8(s, segs(seg).off + pos); pos += 1; v
    }
    def u16c(): Int = u8c() | (u8c() << 8)
    def i32c(): Int = u16c() | (u16c() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8c())
    /** BIFF8 continued-character read: `n` chars, starting `compressed`
      * (8-bit Latin-1) or not (UTF-16LE); at every segment boundary the
      * next segment opens with a fresh flags byte. */
    def readChars(n: Int, compressed0: Boolean): String = {
      val sb = new java.lang.StringBuilder(n)
      var compressed = compressed0
      var remaining = n
      while (remaining > 0) {
        boundary()
        if (pos == 0 && seg > 0) compressed = (u8c() & 1) == 0
        if (compressed) sb.append((u8c()).toChar)
        else sb.append((u8c() | (u8c() << 8)).toChar)
        remaining -= 1
      }
      sb.toString
    }
    /** XLUnicodeRichExtendedString: cch + flags [+rich count] [+phonetic
      * size] + chars + trailing rich/phonetic bytes. */
    def readUnicodeString(): String = {
      val cch = u16c()
      val flags = u8c()
      val rich = if ((flags & 8) != 0) u16c() else 0
      val phonetic = if ((flags & 4) != 0) i32c() else 0
      val out = readChars(cch, (flags & 1) == 0)
      skip(rich * 4 + phonetic)
      out
    }
  }

  /** RK: 30-bit packed numeric. Bit 0 = divide by 100, bit 1 = integer. */
  private[sources] def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Mirrors the .xlsx reader's string surface: integral doubles render
    * without a decimal point (BIFF stores every number as a double; Excel's
    * grid shows 5, not 5.0). */
  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString

  /** Parse one .xls workbook into the same shape the .xlsx parser returns:
    * rows of (absolute column index, string value) for the selected sheet. */
  def parseWorkbook(bytes: Array[Byte],
                    select: Xlsx.Sheet = Xlsx.Sheet.First): Seq[Seq[(Int, String)]] = {
    val wb = ole2Stream(bytes, Set("Workbook", "Book"))
    val recs = records(wb)
    require(recs.nonEmpty && recs.head.id == 0x809,
      "not a BIFF workbook stream (missing BOF)")
    require(u16(wb, recs.head.off) == 0x0600,
      f"unsupported BIFF version 0x${u16(wb, recs.head.off)}%04x (need BIFF8)")

    // globals substream: SST (+CONTINUEs) and the BOUNDSHEET directory
    var sst = Vector.empty[String]
    val sheets = ArrayBuffer[(String, Int)]() // (tab name, substream offset)
    var i = 0
    var depth = 0
    var inGlobals = true
    while (i < recs.length && inGlobals) {
      val r = recs(i)
      r.id match {
        case 0x809 => depth += 1
        case 0x0a => depth -= 1; if (depth == 0) inGlobals = false
        case 0x85 => // BOUNDSHEET: position, visibility, type, short name
          val pos = i32(wb, r.off)
          val cch = u8(wb, r.off + 6)
          val compressed = (u8(wb, r.off + 7) & 1) == 0
          val name =
            if (compressed) new String(wb, r.off + 8, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            else new String(wb, r.off + 8, cch * 2,
              java.nio.charset.StandardCharsets.UTF_16LE)
          sheets += name -> pos
        case 0xfc => // SST + CONTINUE run
          var j = i + 1
          while (j < recs.length && recs(j).id == 0x3c) j += 1
          val cur = new SegCursor(wb, recs.slice(i, j))
          cur.skip(4) // total refs
          val unique = cur.i32c()
          sst = Vector.fill(unique)(cur.readUnicodeString())
          i = j - 1
        case _ =>
      }
      i += 1
    }
    require(sheets.nonEmpty, "workbook has no BOUNDSHEET entries")
    val chosen = select match {
      case Xlsx.Sheet.First => sheets.head._2
      case Xlsx.Sheet.ByIndex(n) =>
        require(n >= 0 && n < sheets.size,
          s"sheet index $n out of range; workbook has ${sheets.size} sheets")
        sheets(n)._2
      case Xlsx.Sheet.ByName(n) => sheets.find(_._1 == n).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"sheet not found; workbook has ${sheets.map(_._1).mkString("[", ", ", "]")}"))
    }

    // worksheet substream: cell records until the matching EOF
    val cells = scala.collection.mutable.SortedMap.empty[(Int, Int), String]
    val sub = records(java.util.Arrays.copyOfRange(wb, chosen, wb.length))
    require(sub.nonEmpty && sub.head.id == 0x809, "sheet offset does not point at a BOF")
    var k = 1
    var open = 1
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting its STRING
    while (k < sub.length && open > 0) {
      val r = sub(k)
      def row = u16(wb, chosen + r.off)
      def colIdx = u16(wb, chosen + r.off + 2)
      r.id match {
        case 0x809 => open += 1
        case 0x0a => open -= 1
        case 0xfd => // LABELSST
          val idx = i32(wb, chosen + r.off + 6)
          if (idx >= 0 && idx < sst.size) cells((row, colIdx)) = sst(idx)
        case 0x204 => // LABEL (inline string)
          val cur = new SegCursor(wb, Vector(Rec(r.id, chosen + r.off + 6, r.len - 6)))
          val cch = cur.u16c()
          val flags = cur.u8c()
          cells((row, colIdx)) = cur.readChars(cch, (flags & 1) == 0)
        case 0x203 => // NUMBER
          val bits = (0 until 8).map(b => u8(wb, chosen + r.off + 6 + b).toLong)
            .zipWithIndex.map { case (v, b) => v << (8 * b) }.reduce(_ | _)
          cells((row, colIdx)) = renderNum(java.lang.Double.longBitsToDouble(bits))
        case 0x27e => // RK
          cells((row, colIdx)) = renderNum(rkValue(i32(wb, chosen + r.off + 6)))
        case 0xbd => // MULRK: first col, then (xf, rk) pairs, then last col
          val first = colIdx
          val pairs = (r.len - 6) / 6
          for (c <- 0 until pairs) {
            val rk = i32(wb, chosen + r.off + 4 + 6 * c + 2)
            cells((row, first + c)) = renderNum(rkValue(rk))
          }
        case 0x205 => // BOOLERR: booleans as TRUE/FALSE; error cells skipped
          if (u8(wb, chosen + r.off + 7) == 0)
            cells((row, colIdx)) = if (u8(wb, chosen + r.off + 6) != 0) "TRUE" else "FALSE"
        case 0x06 => // FORMULA: cached result
          val tail = u16(wb, chosen + r.off + 12)
          if (tail == 0xffff) u8(wb, chosen + r.off + 6) match {
            case 0 => pendingString = Some((row, colIdx)) // STRING record follows
            case 1 => cells((row, colIdx)) =
              if (u8(wb, chosen + r.off + 8) != 0) "TRUE" else "FALSE"
            case 3 => cells((row, colIdx)) = ""
            case _ => // error result: no cell
          } else {
            val bits = (0 until 8).map(b => u8(wb, chosen + r.off + 6 + b).toLong)
              .zipWithIndex.map { case (v, b) => v << (8 * b) }.reduce(_ | _)
            cells((row, colIdx)) = renderNum(java.lang.Double.longBitsToDouble(bits))
          }
        case 0x207 => // STRING: cached text of the preceding FORMULA
          pendingString.foreach { rc =>
            val cur = new SegCursor(wb, Vector(Rec(r.id, chosen + r.off, r.len)))
            cur.skip(0)
            val cch = cur.u16c()
            val flags = cur.u8c()
            cells(rc) = cur.readChars(cch, (flags & 1) == 0)
          }
          pendingString = None
        case _ =>
      }
      k += 1
    }
    cells.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (_, rowCells) =>
      rowCells.map { case ((_, c), v) => c -> v }.sortBy(_._1)
    }
  }
}
