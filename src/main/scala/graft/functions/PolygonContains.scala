package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Point-in-polygon test (even-odd ray casting) against a FIXED polygon —
  * the reference's spatial membership check
  * (`schema/irve/geo_utils/geo.py:25-29`,
  * `carburants/scripts/reformat_prix.py:108-120`: shapely point-in-France).
  *
  * The polygon is part of the expression (driver-known, like the France
  * contour), so the test is a per-row codegen'd loop — the spatial "join"
  * against a small polygon set is a projection, not a join. Edge
  * convention: (i, (i+1) mod n), strict inequalities — an external oracle
  * must iterate edges identically for bit parity.
  */
object PolygonContains {
  def contains(poly: Array[Double], x: Double, y: Double): Boolean = {
    val n = poly.length / 2
    var c = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) c = !c
      i += 1
    }
    c
  }

  def pointInPolygon(x: Column, y: Column, poly: Seq[(Double, Double)]): Column =
    Bridge.column(PolygonContainsExpr(Bridge.expression(x), Bridge.expression(y),
      poly.flatMap(p => Seq(p._1, p._2)).toArray))
}

case class PolygonContainsExpr(left: Expression, right: Expression, poly: Array[Double])
    extends BinaryExpression {
  require(poly.length >= 6 && poly.length % 2 == 0, "polygon needs >= 3 (x,y) vertices")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"point_in_polygon requires double coords, got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(x: Any, y: Any): Any =
    PolygonContains.contains(poly, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polyRef = ctx.addReferenceObj("poly", poly, "double[]")
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.PolygonContains.contains($polyRef, $x, $y)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PolygonContainsExpr =
    copy(left = newLeft, right = newRight)
}
