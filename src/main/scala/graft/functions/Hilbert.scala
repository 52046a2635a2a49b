package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a (cellX, cellY) pair on a 2^order × 2^order grid
  * — the clustering key behind the reference's GeoParquet sink
  * (`utils/conversions.py:65-142`: DuckDB `ST_Hilbert` ordering). Spatially
  * close points get close indices, so range-partitioning + sorting by this
  * index yields files that are spatial tiles with tight parquet min/max
  * stats (the distributed replacement for a spatial index).
  */
object Hilbert {
  /** Standard iterative xy→d mapping (Hilbert curve, [Hamilton 2006] /
    * Wikipedia "Hilbert curve" d2xy-inverse). */
  def index(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(x: Column, y: Column, order: Int): Column =
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y), order))
}

/** Codegen'd Hilbert index expression over two long cell-coordinate
  * columns. */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires bigint cell coords, got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.index(order, x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Hilbert.index($order, $x, $y)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
