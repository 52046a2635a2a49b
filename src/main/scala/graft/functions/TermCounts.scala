package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-document term frequencies: whitespace-split terms
  * (single-space delimiter, ≡ `split(text, ' ')` / DuckDB
  * `string_split(text, ' ')`), empties dropped, one
  * struct&lt;term, tf, dl&gt; per DISTINCT term in first-occurrence order
  * (dl = total non-empty token count, replicated so a posting row is
  * self-contained after explode).
  *
  * The per-doc kernel of the inverted-index build: `explode(term_counts)`
  * yields the (term, doc, tf, dl) posting rows DIRECTLY, removing the
  * (doc, term) groupBy — the posting build's only corpus-wide shuffle —
  * from the plan entirely (PlanSpec pins the zero-exchange build). It is
  * also what makes the streaming posting maintainer a stateless protocol-1
  * transform: per-row, no aggregation, bit-identical to the batch build by
  * construction. One byte scan per row; terms are zero-copy UTF8String
  * slices (space = 0x20 never occurs inside a UTF-8 multibyte sequence,
  * so byte-level splitting is code-point-safe); counting via a linked
  * hash map over the distinct terms of ONE document — O(tokens), not
  * O(tokens²) like the HOF array_distinct/filter form it replaces.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("dl", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    TermCounts.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  private val empty = new GenericArrayData(Array.empty[Any])

  /** Distinct terms with counts in first-occurrence order + total token
    * count, from one byte scan + linked-hash counting. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // collect (start, len) token slices split on 0x20, empties dropped
    val m = new java.util.LinkedHashMap[UTF8String, Long]()
    var dl = 0L
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' '.toByte) {
        if (i > start) {
          val t = UTF8String.fromBytes(bytes, start, i - start)
          m.put(t, m.getOrDefault(t, 0L) + 1L)
          dl += 1L
        }
        start = i + 1
      }
      i += 1
    }
    if (m.isEmpty) return empty
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = new GenericInternalRow(Array[Any](e.getKey, e.getValue, dl))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def termCounts(text: Column): Column =
    Bridge.column(TermCounts(Bridge.expression(text)))
}
