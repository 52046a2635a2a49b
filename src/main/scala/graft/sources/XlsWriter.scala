package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal BIFF8 + OLE2 writer — fabricates REAL legacy .xls files (small
  * ones land in the mini-stream/miniFAT layout, large ones in regular FAT
  * sectors) for the src5 gate fixture and XlsSpec. The engine's .xls
  * support is read-only ([[Xls]]); this writer exists solely to generate
  * legacy inputs, the same role `writeXlsx` plays for the zip format. */
object XlsWriter {

  private def le16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(payload.length) ++ payload

  def bofGlobals: Array[Byte] = rec(0x809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12))
  def bofSheet: Array[Byte] = rec(0x809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12))
  def eof: Array[Byte] = rec(0x0a, Array.empty)

  /** Compressed (Latin-1) XLUnicodeString used inside SST. */
  def sstString(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")

  def sstRec(strings: Seq[String]): Array[Byte] =
    rec(0xfc, le32(strings.size) ++ le32(strings.size) ++
      strings.flatMap(sstString).toArray)

  def boundsheet(pos: Int, name: String): Array[Byte] =
    rec(0x85, le32(pos) ++ Array(0.toByte, 0.toByte, name.length.toByte, 0.toByte) ++
      name.getBytes("ISO-8859-1"))

  def labelSst(row: Int, col: Int, idx: Int): Array[Byte] =
    rec(0xfd, le16(row) ++ le16(col) ++ le16(0) ++ le32(idx))

  def label(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x204, le16(row) ++ le16(col) ++ le16(0) ++
      le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1"))

  def number(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x203, le16(row) ++ le16(col) ++ le16(0) ++
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())

  def rkInt(v: Int): Int = (v << 2) | 2
  def rkX100Int(v: Int): Int = (v << 2) | 3
  def rk(row: Int, col: Int, rkv: Int): Array[Byte] =
    rec(0x27e, le16(row) ++ le16(col) ++ le16(0) ++ le32(rkv))

  def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0xbd, le16(row) ++ le16(colFirst) ++
      rks.flatMap(v => le16(0) ++ le32(v)).toArray ++
      le16(colFirst + rks.size - 1))

  def boolErr(row: Int, col: Int, b: Boolean): Array[Byte] =
    rec(0x205, le16(row) ++ le16(col) ++ le16(0) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))

  def formulaNum(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x06, le16(row) ++ le16(col) ++ le16(0) ++
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array() ++
      le16(0) ++ le32(0) ++ Array.empty[Byte])

  def formulaString(row: Int, col: Int, cached: String): Array[Byte] =
    rec(0x06, le16(row) ++ le16(col) ++ le16(0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0xff.toByte, 0xff.toByte) ++
      le16(0) ++ le32(0)) ++
      rec(0x207, le16(cached.length) ++ Array(0.toByte) ++ cached.getBytes("ISO-8859-1"))

  /** Assembles a workbook stream: globals (optional SST, BOUNDSHEETs with
    * patched offsets) + one substream per sheet. */
  def workbookStream(sheets: Seq[(String, Array[Byte])],
                     sst: Seq[String] = Nil): Array[Byte] = {
    val sstBytes = if (sst.nonEmpty) sstRec(sst) else Array.empty[Byte]
    // globals length is fixed once we know the boundsheet sizes
    val bsLen = sheets.map { case (n, _) => boundsheet(0, n).length }.sum
    val globalsLen = bofGlobals.length + sstBytes.length + bsLen + eof.length
    val offsets = sheets.scanLeft(globalsLen) { case (acc, (_, body)) =>
      acc + bofSheet.length + body.length + eof.length
    }
    val globals = bofGlobals ++ sstBytes ++
      sheets.zip(offsets).flatMap { case ((n, _), pos) => boundsheet(pos, n) } ++ eof
    require(globals.length == globalsLen, s"${globals.length} != $globalsLen")
    globals ++ sheets.flatMap { case (_, body) => bofSheet ++ body ++ eof }
  }

  private val FREE = 0xffffffff
  private val END = 0xfffffffe
  private val FATSECT = 0xfffffffd

  /** Wraps a stream into a valid OLE2 compound file. Streams under 4096
    * bytes land in the root mini stream (miniFAT path); larger ones use
    * regular sectors. Single FAT sector — ample for fixtures. */
  def ole2(streamName: String, stream: Array[Byte]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte]()
    def pad(to: Int): Unit = while (buf.length < to) buf += 0
    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val nm = name.getBytes("UTF-16LE")
      b.put(nm, 0, math.min(nm.length, 62))
      b.position(64)
      b.putShort((nm.length + 2).toShort)
      b.put(typ.toByte).put(1.toByte) // color: black
      b.putInt(-1).putInt(-1).putInt(child)
      b.position(116)
      b.putInt(start).putInt(size).putInt(0)
      b.array()
    }
    val small = stream.length < 4096
    val nStream512 = (stream.length + 511) / 512
    val containerBytes = ((stream.length + 63) / 64) * 64
    val nContainer = (containerBytes + 511) / 512
    // header
    val h = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    h.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    h.position(24); h.putShort(0x3e.toShort); h.putShort(3.toShort)
    h.putShort(0xfffe.toShort) // byte order
    h.putShort(9.toShort); h.putShort(6.toShort) // sector/mini shifts
    h.position(44); h.putInt(1) // one FAT sector
    h.putInt(1) // first directory sector
    h.position(56); h.putInt(4096) // mini cutoff
    h.putInt(if (small) 2 else END) // first miniFAT sector
    h.putInt(if (small) 1 else 0)
    h.putInt(END); h.putInt(0) // no DIFAT chain
    h.putInt(0) // DIFAT[0] = FAT sector id 0
    for (_ <- 1 until 109) h.putInt(FREE)
    buf ++= h.array()
    // FAT sector (sector 0)
    val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    fat.putInt(FATSECT) // sector 0: the FAT itself
    fat.putInt(END) // sector 1: directory
    if (small) {
      fat.putInt(END) // sector 2: miniFAT
      for (s <- 0 until nContainer) // sectors 3..: mini stream container
        fat.putInt(if (s == nContainer - 1) END else 3 + s + 1)
    } else {
      for (s <- 0 until nStream512) // sectors 2..: the stream
        fat.putInt(if (s == nStream512 - 1) END else 2 + s + 1)
    }
    while (fat.position() < 512) fat.putInt(FREE)
    buf ++= fat.array()
    // directory sector (sector 1)
    if (small) {
      buf ++= dirEntry("Root Entry", 5, 1, 3, containerBytes)
      buf ++= dirEntry(streamName, 2, -1, 0, stream.length)
    } else {
      buf ++= dirEntry("Root Entry", 5, 1, END, 0)
      buf ++= dirEntry(streamName, 2, -1, 2, stream.length)
    }
    buf ++= new Array[Byte](128 * 2) // two empty entries
    if (small) {
      // miniFAT sector (sector 2)
      val nMini = (stream.length + 63) / 64
      val mf = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      for (m <- 0 until nMini) mf.putInt(if (m == nMini - 1) END else m + 1)
      while (mf.position() < 512) mf.putInt(FREE)
      buf ++= mf.array()
    }
    // stream payload (mini container or regular sectors)
    buf ++= stream
    pad(buf.length + (512 - buf.length % 512) % 512)
    buf.toArray
  }

  def xlsFile(sheets: Seq[(String, Array[Byte])], sst: Seq[String] = Nil): Array[Byte] =
    ole2("Workbook", workbookStream(sheets, sst))
}
