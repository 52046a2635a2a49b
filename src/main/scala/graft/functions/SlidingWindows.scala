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
