package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All nTables hyperplane-LSH bucket ids of an array<double> vector in ONE
  * fused kernel — the corpus-side bucketing pass of every multi-table LSH
  * operator (search, dedup, the streamed vector index).
  *
  * Why this exists: the compositional form (nTables × nPlanes stacked
  * `when(dot > 0, 1<<p)` chains over [[DotProduct]]) inlines every plane's
  * 64-iteration loop into one generated method. Beyond ~30 planes the
  * method blows past HotSpot's JIT bytecode budget, the whole stage runs
  * in the BYTECODE INTERPRETER, and bucketing 100 k rows at
  * (11 planes × 8 tables) measured 52 s where this kernel takes under a
  * second (MpDiag / MultiProbeProbe, PLANS r11 s7) — at corpus-sized plane
  * counts (log₂ of corpus/occupancy: 30+ at 100 TB) the compositional form
  * would dominate the entire pipeline. Here the planes are DATA (one flat
  * matrix reference), so the generated code is a tiny triple loop that
  * always JITs, at any plane count.
  *
  * Bit-identical to the compositional form and the SQL oracles: plane
  * (t, p) is [[graft.operators.DetHash.planes]] row t·nPlanes+p (the
  * generator is prefix-stable — plane i depends only on i), each dot
  * accumulates in ascending index order (the DotProduct/list_sum fold),
  * bit p of table t's bucket is set iff that dot > 0.0.
  */
case class LshBuckets(child: Expression, nPlanes: Int, dim: Int, nTables: Int)
    extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 48 && nTables > 0, "bad LSH shape")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Flat row-major plane matrix: row t·nPlanes+p, dim doubles each. */
  @transient private lazy val planeMatrix: Array[Double] = {
    val ps = graft.operators.DetHash.planes(nTables * nPlanes, dim)
    val m = new Array[Double](nTables * nPlanes * dim)
    var r = 0
    while (r < ps.length) {
      var j = 0
      val row = ps(r)
      while (j < dim) { m(r * dim + j) = row(j); j += 1 }
      r += 1
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val m = planeMatrix
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var p = 0
      while (p < nPlanes) {
        val off = (t * nPlanes + p) * dim
        var s = 0.0
        var j = 0
        while (j < n) { s += x.getDouble(j) * m(off + j); j += 1 }
        if (s > 0.0) b |= 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("lshPlanes", planeMatrix, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $b = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    int $off = ($t * $nPlanes + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $a.getDouble($j) * $m[$off + $j];
         |    }
         |    if ($s > 0.0) $b |= 1L << $p;
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def buckets(v: Column, nPlanes: Int, dim: Int, nTables: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(v), nPlanes, dim, nTables))
}
