package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization (PQ) kernels — the code-book compression end of the
  * ANN family (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the FAISS `PQ`/`IVFPQ` shape).
  *
  * Where SQ8 shrinks an embedding 8× (1 byte per dimension), PQ shrinks it
  * to nSub bytes TOTAL: the vector is cut into nSub sub-blocks, each
  * sub-block is k-means-quantized against a 256-entry-or-smaller codebook,
  * and only the per-block code survives. A 64-dim float64 embedding costs
  * 512 bytes on the scan; its 4-block PQ code costs 4 — a 128× payload
  * shrink, which is what lets a 100 TB corpus keep its entire search
  * index in executor memory.
  *
  * Scoring is ADC (asymmetric distance computation): the query stays in
  * float, and its dot product against every codebook centroid is
  * precomputed into a lookup table of nSub·k doubles; a corpus code is then
  * scored with nSub table lookups and adds — no per-candidate float math.
  *
  * Replayability: [[PqAdcScore]] accumulates the nSub partial sums in
  * ascending block order — the same left fold as [[DotProduct]] and
  * DuckDB's `list_sum`, so an external oracle replays scores bit-for-bit
  * (the LUT entries themselves are per-row double dots with the proven
  * fold-order parity). Both expressions are codegen'd tight loops (the HOF
  * twin would box a lambda per element — the repo hot-kernel rule);
  * `PqSpec` pins bit parity against the HOF/SQL form.
  */
case class PqPackCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_pack_codes requires array<int>, got ${t.catalogString}")
  }
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (a.getInt(i) & 0xFF).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) ($a.getInt($i) & 0xFF);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqPackCodes =
    copy(child = newChild)
}

/** ADC score of one packed code array against one query lookup table:
  * sum over blocks m of lut[m·kCodes + codes[m]], accumulated in ascending
  * m (left fold — bit-identical to the list_sum oracle twin). `lut` is the
  * query's nSub·kCodes partial-dot table ([[graft.operators.Similarity.pqLut]]);
  * `codes` is [[PqPackCodes]] output. Codes are unsigned bytes. */
case class PqAdcScore(left: Expression, right: Expression, kCodes: Int)
    extends BinaryExpression {
  require(kCodes > 0 && kCodes <= 256, s"kCodes must be in 1..256, got $kCodes")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score requires (array<double>, binary), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    var sum = 0.0
    var m = 0
    while (m < codes.length) {
      sum += lut.getDouble(m * kCodes + (codes(m) & 0xFF))
      m += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      s"""
         |double $sum = 0.0;
         |for (int $m = 0; $m < $b.length; $m++) {
         |  $sum += $a.getDouble($m * $kCodes + ($b[$m] & 0xFF));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqVec {
  /** Pack an `array<int>` of per-block codes (each 0..255) into binary. */
  def packCodes(codes: Column): Column =
    Bridge.column(PqPackCodes(Bridge.expression(codes)))

  /** ADC score: Σ_m lut[m·kCodes + codes[m]], ascending-m left fold. */
  def adcScore(lut: Column, codes: Column, kCodes: Int): Column =
    Bridge.column(PqAdcScore(Bridge.expression(lut), Bridge.expression(codes), kCodes))
}
