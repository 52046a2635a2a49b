package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** 1-bit sign quantization for embedding vectors — the last rung of the
  * quantization ladder (fp32 → SQ8 → PQ → 1 bit): a dim-64 embedding costs
  * 512 bytes as doubles, 64 as int8, 4 as PQ codes, and 8 as a sign
  * bitmap. At 100 TB the brute-force candidate scan is memory-bandwidth
  * bound, so the binary form is the cheapest possible exhaustive first
  * pass (Charikar 2002 hyperplane-LSH degenerate case: the coordinate
  * planes), re-ranked exactly on the few survivors.
  *
  * Replayability is exact by construction:
  *  - [[SignPack]] packs `x > 0.0` per element — a sign test on the same
  *    float→double cast both engines perform, no arithmetic at all;
  *  - words hold 32 bits each (element 32·w+j sets bit j of word w), so
  *    no value ever touches a sign bit and the packed longs print and
  *    compare identically on every engine;
  *  - [[HammingWords]] is XOR + popcount — pure integer, order-free.
  *
  * Both are codegen'd tight loops (hot-kernel rule — the HOF twin boxes a
  * lambda per element); `BinarySigSpec` pins bit parity against the
  * HOF/SQL form the generated DuckDB oracle uses.
  */
case class SignPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_pack requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val nw = (n + 31) / 32
    val out = new Array[Long](nw)
    var i = 0
    while (i < n) {
      if (a.getDouble(i) > 0.0) out(i >> 5) |= (1L << (i & 31))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getDouble($i) > 0.0) $out[$i >> 5] |= (1L << ($i & 31));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** Hamming distance between two [[SignPack]] signatures: Σ popcount(a⊕b)
  * over the word arrays. Pure integer — exact on every engine. */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_words requires array<long> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)
}

object BinarySig {
  /** Pack an `array<double>` into its 32-bit-word sign bitmap. */
  def signPack(v: Column): Column = Bridge.column(SignPack(Bridge.expression(v)))

  /** Hamming distance of two packed signatures. */
  def hamming(a: Column, b: Column): Column =
    Bridge.column(HammingWords(Bridge.expression(a), Bridge.expression(b)))

  /** Spark-SQL HOF twin of [[SignPack]] for a known dim (parity pin +
    * documentation of the exact bit layout the oracle SQL replays). */
  def signPackHofSql(v: String, dim: Int): String = {
    val nw = (dim + 31) / 32
    (0 until nw).map { w =>
      val lo = 32 * w
      val width = math.min(32, dim - lo)
      s"aggregate(sequence(1, $width), 0L, (acc, j) -> acc + " +
        s"CASE WHEN $v[$lo + j - 1] > 0.0D THEN shiftleft(1L, j - 1) ELSE 0L END)"
    }.mkString("array(", ", ", ")")
  }
}
