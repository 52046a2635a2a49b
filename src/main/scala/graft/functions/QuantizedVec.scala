package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Int8 scalar quantization (SQ8) for embedding vectors — the memory-
  * bandwidth lever of similarity search at corpus scale: an `array<double>`
  * embedding costs 8 bytes per dimension on the scan and the shuffle; the
  * quantized `binary` form costs 1. At 100 TB the ANN scan is bandwidth-
  * bound, so the 8× payload shrink is an ~8× scan-throughput lever
  * (measured in PLANS.md round 10), the same trade FAISS's IVF-SQ8 makes.
  *
  * Replayability is exact BY CONSTRUCTION, not by care:
  *  - [[Int8Quantize]] computes clamp(floor(x·scale), ±127) with `scale`
  *    restricted to a power of two — a double multiply by 2^k only shifts
  *    the exponent, so floor() sees an exact product and any engine gets
  *    the identical byte;
  *  - [[QuantizedDot]] sums byte products in integer arithmetic — exact
  *    and associative, so scores cannot depend on partition order (the
  *    float-parity machinery money sums need simply does not apply).
  *
  * Both expressions are codegen'd tight loops (the HOF twin would be a
  * CodegenFallback boxed-lambda call per element — the repo hot-kernel
  * rule); `Int8QuantizeSpec` pins bit parity against the HOF/SQL form.
  * Assumes finite, non-null vector elements (embedding vectors).
  */
case class Int8Quantize(child: Expression, scale: Double)
    extends UnaryExpression {
  // positive normal double with an all-zero mantissa == a power of two
  require(scale > 0 && java.lang.Double.isFinite(scale) &&
      (java.lang.Double.doubleToRawLongBits(scale) & 0x000FFFFFFFFFFFFFL) == 0L,
    s"scale must be a positive power of two for exact replay, got $scale")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      var f = math.floor(a.getDouble(i) * scale).toLong
      if (f > 127L) f = 127L else if (f < -127L) f = -127L
      out(i) = f.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      val out = ctx.freshName("out")
      val s = java.lang.Double.toString(scale)
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $f = (long) java.lang.Math.floor($a.getDouble($i) * $s);
         |  if ($f > 127L) $f = 127L; else if ($f < -127L) $f = -127L;
         |  $out[$i] = (byte) $f;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Integer dot product of two int8-quantized vectors ([[Int8Quantize]]
  * output). Byte products and the running sum are integer arithmetic —
  * exact, associative, order-independent on every engine. */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot requires binary args, got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (x(i) * y(i)).toLong; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) ($a[$i] * $b[$i]);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedVec {
  /** Quantize an `array<double>` column to int8 bytes at a power-of-two
    * scale (see [[Int8Quantize]]). */
  def quantizeInt8(v: Column, scale: Double): Column =
    Bridge.column(Int8Quantize(Bridge.expression(v), scale))

  /** Exact integer dot product of two quantized vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))

  /** Largest power-of-two scale that keeps |x| ≤ maxAbs inside the int8
    * range (so no value clamps): 2^floor(log2(127 / maxAbs)). Power-of-two
    * restriction is what makes the quantization exactly replayable
    * ([[Int8Quantize]]). */
  def int8ScaleFor(maxAbs: Double): Double = {
    require(maxAbs > 0 && java.lang.Double.isFinite(maxAbs),
      s"maxAbs must be positive finite, got $maxAbs")
    math.pow(2, math.floor(math.log(127.0 / maxAbs) / math.log(2)))
  }
}
