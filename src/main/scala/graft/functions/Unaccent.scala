package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-stripping expression (NFD normalize + drop combining marks +
  * transliterate non-decomposable Latin ligatures).
  *
  * The reference normalizes labels with `unidecode` in at least four
  * pipelines (e.g. `data_processing/dvf/explore/task_functions.py:266,556-584`
  * and `insee/sirene/geocodage/scripts/normadresse.py:46`). Spark has no
  * built-in accent stripper, so this is a native Catalyst expression with
  * codegen (stays inside WholeStageCodegen, unlike a Scala UDF).
  *
  * Divergence from unidecode: only Latin-1/Latin-Extended ligatures common in
  * French data are transliterated (see [[Unaccent.strip]]); non-Latin scripts
  * pass through mark-stripped but untransliterated.
  */
case class Unaccent(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unaccent requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    Unaccent.strip(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Unaccent.strip($c)")
  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}

object Unaccent {
  /** JVM-side worker shared by interpreted eval and generated code. */
  def strip(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) {
        c match {
          case 'œ' => sb.append("oe") // œ
          case 'Œ' => sb.append("OE") // Œ
          case 'æ' => sb.append("ae") // æ
          case 'Æ' => sb.append("AE") // Æ
          case 'ß' => sb.append("ss") // ß
          case 'ø' => sb.append('o')  // ø
          case 'Ø' => sb.append('O')  // Ø
          case 'đ' => sb.append('d')  // đ
          case 'Đ' => sb.append('D')  // Đ
          case 'ł' => sb.append('l')  // ł
          case 'Ł' => sb.append('L')  // Ł
          case 'þ' => sb.append("th") // þ
          case 'Þ' => sb.append("TH") // Þ
          case 'ı' => sb.append('i')  // dotless ı
          case other    => sb.append(other)
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-level entry point: `unaccent($"name")`. */
  def unaccent(c: Column): Column =
    Bridge.column(Unaccent(Bridge.expression(c)))
}
