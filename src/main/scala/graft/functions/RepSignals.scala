package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Per-document repetition-signal kernel (the t11 / Gopher dup-n-gram
  * family): token array → (n2, top2, dup2c, dup5c) where n2 = total
  * 2-gram occurrences, top2 = the modal 2-gram's count, dupWc =
  * Σ (cnt − 1)·len(gram) over grams with cnt > 1 for W ∈ {2, 5} — one
  * local hash-count pass per row, ZERO exchanges.
  *
  * Replaces the shuffle form (explode every gram occurrence → count per
  * (doc, w, gram) → per-doc fold → join back): that plan shuffles the
  * whole gram MULTISET — ~7× the corpus bytes at w ∈ {2,5} — to compute
  * a per-row quantity. The multiset is row-local by definition; counting
  * it needs O(tokens) time and memory in the row's own task, which holds
  * at any corpus size because the row already lives in one task. The
  * shuffle form stays as `TextOps.repetitionSignalsExchange` (the
  * oracle-shaped twin); RepetitionSignalsSpec pins bit equality.
  *
  * Parity corners: grams render as concat_ws(' ') (null tokens vanish
  * WITH their separator); gram length counts CODEPOINTS (Spark
  * `length()` semantics); < w tokens → all-zero signals (the coalesced
  * left-join of the shuffle form); null token array → null. */
case class RepSignals(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_signals requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType), StructField("top2", LongType),
    StructField("dup2c", LongType), StructField("dup5c", LongType)))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    RepSignals.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RepSignals.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): RepSignals =
    copy(child = newChild)
}

object RepSignals {

  /** (n2, top2, dup2c) for one width over the token array — multiset
    * counts in a local map; gram length in codepoints. */
  private def widthSignals(toks: Array[String], w: Int): (Long, Long, Long) = {
    val n = toks.length
    if (n < w) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i <= n - w) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var appended = 0
      while (j < w) {
        val t = toks(i + j)
        if (t != null) { // concat_ws: null vanishes with its separator
          if (appended > 0) sb.append(' ')
          sb.append(t)
          appended += 1
        }
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var total = 0L
    var top = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue
      total += cnt
      if (cnt > top) top = cnt
      if (cnt > 1) {
        val g = e.getKey
        dupChars += (cnt - 1) * g.codePointCount(0, g.length)
      }
    }
    (total, top, dupChars)
  }

  def compute(toksData: ArrayData): InternalRow = {
    val n = toksData.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = toksData.getUTF8String(i)
      toks(i) = if (u == null) null else u.toString
      i += 1
    }
    val (n2, top2, dup2c) = widthSignals(toks, 2)
    val (_, _, dup5c) = widthSignals(toks, 5)
    new GenericInternalRow(Array[Any](n2, top2, dup2c, dup5c))
  }

  /** Column entry point. */
  def repSignals(toks: Column): Column =
    Bridge.column(RepSignals(Bridge.expression(toks)))
}
