package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-stripping expression (NFD normalize + drop combining marks).
  *
  * The reference normalizes labels with `unidecode` in at least four
  * pipelines (e.g. `data_processing/dvf/explore/task_functions.py:266,556-584`
  * and `insee/sirene/geocodage/scripts/normadresse.py:46`). Spark has no
  * built-in accent stripper, so this is a native Catalyst expression with
  * codegen (stays inside WholeStageCodegen, unlike a Scala UDF).
  */
case class Unaccent(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    Unaccent.strip(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Unaccent.strip($c)")
  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}

object Unaccent {
  private val Marks = "\\p{M}+".r

  /** JVM-side worker shared by interpreted eval and generated code. */
  def strip(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(Marks.replaceAllIn(nfd, ""))
  }

  def unaccent(c: Column): Column = new Column(Unaccent(c.expr))
}
