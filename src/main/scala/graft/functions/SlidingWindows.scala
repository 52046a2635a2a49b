package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd sliding character windows: all `w`-codepoint substrings
  * of a string, stride 1, as array&lt;string&gt; (empty when the string is
  * shorter than `w`).
  *
  * The per-doc kernel of exact duplicated-substring detection (the
  * suffix-window approximation of Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): every window is emitted once, the
  * corpus-wide duplicate test is a groupBy/window on the window VALUE —
  * the shuffle key therefore grows with the corpus (content-derived), never
  * a fixed bucket space.
  *
  * One byte-array copy per row; each window is a zero-copy UTF8String slice
  * over it (code-point offsets precomputed in a single scan, so the loop is
  * O(total window bytes), not O(n·w) rescans). Code-point semantics match
  * `substr` in DuckDB, which replays the oracle with
  * `substr(text, s, w)`.
  */
case class SlidingWindows(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_windows requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    SlidingWindows.compute(v.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SlidingWindows.compute($c, $w);")
  override protected def withNewChildInternal(newChild: Expression): SlidingWindows =
    copy(child = newChild)
}

object SlidingWindows {
  private val empty = new GenericArrayData(Array.empty[Any])

  /** All w-codepoint windows of `s`, stride 1. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets (+ terminal end offset), one linear scan
    val offs = new Array[Int](nb + 1)
    var n = 0
    var i = 0
    while (i < nb) {
      offs(n) = i
      n += 1
      val u = bytes(i) & 0xFF
      i += (if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4)
    }
    offs(n) = nb
    if (n < w) return empty
    val out = new Array[Any](n - w + 1)
    var p = 0
    while (p <= n - w) {
      out(p) = UTF8String.fromBytes(bytes, offs(p), offs(p + w) - offs(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def slidingWindows(text: Column, w: Int): Column =
    Bridge.column(SlidingWindows(Bridge.expression(text), w))
}
/** Native codegen'd rolling-hash sliding windows — the SCALE form of
  * [[SlidingWindows]]: the same `w`-codepoint windows, emitted as 64-bit
  * polynomial hashes instead of strings. One O(n) rolling pass per
  * document (h·B + cp in, − cp·B^(w−1) out, mod 2⁶⁴), so the kernel never
  * allocates a window string and the downstream shuffle carries 8 bytes
  * per window instead of ≥w — the "swap the window value for a 64-bit
  * rolling hash" parameter change the d16 design documents (≈6× less
  * shuffle volume at w=40). Keys only: equality-of-hash stands in for
  * equality-of-window (collisions are ~n²/2⁶⁴ — vanishing below corpus
  * sizes where the string form already needs the hash form; the exact
  * string path remains the oracle-replayable catalog default).
  */
case class SlidingWindowHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_window_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    SlidingWindowHashes.compute(v.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SlidingWindowHashes.compute($c, $w);")
  override protected def withNewChildInternal(newChild: Expression): SlidingWindowHashes =
    copy(child = newChild)
}

object SlidingWindowHashes {
  private val empty = new GenericArrayData(Array.empty[Any])
  /** Polynomial base — odd 64-bit constant (golden-ratio multiplier). */
  val B: Long = 0x9E3779B97F4A7C15L

  /** 64-bit rolling polynomial hash of every w-codepoint window, stride 1.
    * Same code-point segmentation as [[SlidingWindows.compute]]. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // decode code points in one scan
    val cps = new Array[Int](nb)
    var n = 0
    var i = 0
    while (i < nb) {
      val u = bytes(i) & 0xFF
      val len = if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
      var cp = if (len == 1) u else u & (0x7F >> len)
      var j = 1
      while (j < len && i + j < nb) { cp = (cp << 6) | (bytes(i + j) & 0x3F); j += 1 }
      cps(n) = cp
      n += 1
      i += len
    }
    if (n < w) return empty
    // B^(w-1) mod 2^64 for the outgoing term
    var bw1 = 1L
    var e = 0
    while (e < w - 1) { bw1 *= B; e += 1 }
    val out = new Array[Any](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * B + cps(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      h = (h - cps(p - 1) * bw1) * B + cps(p + w - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def slidingWindowHashes(text: Column, w: Int): Column =
    Bridge.column(SlidingWindowHashes(Bridge.expression(text), w))
}

/** Native codegen'd content-defined chunking (the LBFS/Gear shape used by
  * dedup storage and delta-friendly corpus layouts): a cut is placed after
  * codepoint position c whenever the [[SlidingWindowHashes]] rolling hash
  * of the w-window ENDING at c has its low `maskBits` bits zero — cut
  * points derive from CONTENT, so an edit resynchronizes at the first
  * unaffected window and every later chunk hash is unchanged (fixed-size
  * chunking shares ~nothing after one inserted byte). Mean chunk length
  * 2^maskBits; the mask is a POWER OF TWO on purpose — the low k bits of
  * the signed 64-bit Spark hash equal those of its unsigned mod-2^64
  * reading, so an external engine replays the predicate from the
  * polynomial-sum form exactly (a general modulus would diverge on
  * negative longs).
  *
  * Guards: a candidate cut is skipped while the open chunk is shorter
  * than `minLen`, and a cut is FORCED when it reaches `maxLen` (length
  * bounds are what make downstream chunk stores plannable). With
  * minLen = 1 and maxLen = MaxValue the cut set is exactly the positional
  * filter over window hashes — the oracle-replayable catalog form;
  * guarded variants are spec-pinned against a reference chunker.
  *
  * @return array<struct<start:int, len:int>> — 1-based CODEPOINT start
  *         (substr coordinates) per chunk; empty array for an empty
  *         string; a text shorter than w (no windows) is one chunk. */
case class CdcChunks(child: Expression, w: Int, maskBits: Int,
                     minLen: Int, maxLen: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  require(maskBits >= 1 && maskBits <= 62, s"maskBits out of range: $maskBits")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got $minLen..$maxLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    CdcChunks.compute(v.asInstanceOf[UTF8String], w, maskBits, minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $w, $maskBits, $minLen, $maxLen);")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private val empty = new GenericArrayData(Array.empty[Any])
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Chunk the codepoints of `s` (same decode and rolling recurrence as
    * [[SlidingWindowHashes.compute]] — hash of the window ENDING at 1-based
    * position c is Σ cp·B^(w-1-j) over codepoints c-w+1..c, mod 2^64). */
  def compute(s: UTF8String, w: Int, maskBits: Int,
              minLen: Int, maxLen: Int): ArrayData = {
    val B = SlidingWindowHashes.B
    val bytes = s.getBytes
    val nb = bytes.length
    val cps = new Array[Int](nb)
    var n = 0
    var i = 0
    while (i < nb) {
      val u = bytes(i) & 0xFF
      val len = if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
      var cp = if (len == 1) u else u & (0x7F >> len)
      var j = 1
      while (j < len && i + j < nb) { cp = (cp << 6) | (bytes(i + j) & 0x3F); j += 1 }
      cps(n) = cp
      n += 1
      i += len
    }
    if (n == 0) return empty
    val mask = (1L << maskBits) - 1
    var bw1 = 1L
    var e = 0
    while (e < w - 1) { bw1 *= B; e += 1 }
    val cuts = new Array[Int](n / minLen.max(1) + 2)
    var nCuts = 0
    var start = 0 // 0-based start of the open chunk
    var h = 0L
    var c = 0 // 0-based index of the codepoint just consumed + 1
    while (c < n) {
      h = h * B + cps(c)
      if (c >= w) h -= cps(c - w) * bw1 * B // retire the codepoint that left
      c += 1
      val len = c - start
      val hashCut = c >= w && (h & mask) == 0L && len >= minLen
      if (hashCut || len >= maxLen) {
        cuts(nCuts) = c
        nCuts += 1
        start = c
      }
    }
    if (start < n) { cuts(nCuts) = n; nCuts += 1 }
    val out = new Array[Any](nCuts)
    var prev = 0
    var k = 0
    while (k < nCuts) {
      out(k) = new GenericInternalRow(Array[Any](prev + 1, cuts(k) - prev))
      prev = cuts(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def cdcChunks(text: Column, w: Int, maskBits: Int,
                minLen: Int = 1, maxLen: Int = Int.MaxValue): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), w, maskBits, minLen, maxLen))
}
