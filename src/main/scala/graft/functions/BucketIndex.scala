package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Histogram bucket of a value against non-uniform bin edges: the count of
  * the first `nBins` edges that are <= value, clamped to >= 1 — the
  * distribution stage's bucket rule (`Distribution.priceDistribution`,
  * reference `dvf/explore/task_functions.py:880-896`).
  *
  * Replaces `greatest(size(filter(slice(edges,1,n), e -> e <= v)), 1)`: the
  * HOF form runs CodegenFallback (boxed lambda per edge per row); this is a
  * tight codegen'd loop over the (≤ nBins+1)-element edge array.
  */
case class BucketIndex(left: Expression, right: Expression, nBins: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_index requires (array<double>, double), got $other")
  }
  override def dataType: DataType = IntegerType
  // Null semantics mirror the HOF form this replaces (and the DuckDB
  // oracle's greatest(len(list_filter(...)), 1)): a null edges array or
  // null value yields bucket 1, never a null bucket.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val e = left.eval(input)
    val v = right.eval(input)
    if (e == null || v == null) 1
    else BucketIndex.compute(e.asInstanceOf[ArrayData], v.asInstanceOf[Double], nBins)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val eGen = left.genCode(ctx)
    val vGen = right.genCode(ctx)
    val n = nBins.toString
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${eGen.code}
        ${vGen.code}
        int ${ev.value} = 1;
        if (!${eGen.isNull} && !${vGen.isNull}) {
          ${ev.value} = graft.functions.BucketIndex.compute(${eGen.value}, ${vGen.value}, $n);
        }
      """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BucketIndex = copy(left = newLeft, right = newRight)
}

object BucketIndex {
  def compute(edges: ArrayData, v: Double, nBins: Int): Int = {
    val n = math.min(nBins, edges.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!edges.isNullAt(i) && edges.getDouble(i) <= v) c += 1
      i += 1
    }
    if (c < 1) 1 else c
  }

  def bucketIndex(edges: Column, value: Column, nBins: Int): Column =
    Bridge.column(BucketIndex(Bridge.expression(edges), Bridge.expression(value), nBins))
}
