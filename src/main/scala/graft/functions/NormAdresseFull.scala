package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import NormAdresseRules.Rule

/** Full port of the reference's 8-stage address abbreviator
  * (`insee/sirene/geocodage/scripts/normadresse.py:23-226`): uppercase +
  * unaccent + alnum-only, then staged abbreviation passes (way types,
  * titles, general abbreviations, first names outside SAINT-, saints,
  * name particles) under a 32-char budget — after each stage, `abrevOut`
  * mixes the shortest abbreviated prefix with the original suffix that
  * fits; terminal stages drop articles and first-letter residual words.
  *
  * Rule table: [[NormAdresseRules]] (341 rules, transcription of the
  * reference's normadresse.csv). Deliberate divergences from the Python:
  *  - `unidecode` is approximated by [[Unaccent.strip]] (NFD + ligatures) —
  *    exact on the Latin-1/Latin-Extended range French addresses use;
  *  - a single word longer than the budget returns cleaned input where the
  *    reference raises UnboundLocalError (normadresse.py:37 with a 1-word
  *    libellé).
  *
  * Exposed as a codegen'd Catalyst expression ([[NormAdresseAbrev]]) — the
  * whole rewriter is one JVM call per row inside WholeStageCodegen, no UDF.
  */
object NormAdresseFull {

  private val byStage: Map[Int, Seq[Rule]] =
    NormAdresseRules.rules.groupBy(_.stage)
  private def stage(n: Int): Seq[Rule] = byStage.getOrElse(n, Nil)

  // Compiled-pattern cache for RULE-derived patterns only (bounded by the
  // rule table: ~1k distinct). Data-derived patterns (stage 3/11 document
  // words) must NOT enter it — a nationwide address corpus has millions of
  // distinct proper nouns and the cache never evicts.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Pattern]()
  private def subFirst(s: String, p: String, rep: String): String =
    cache.computeIfAbsent(p, (k: String) => Pattern.compile(k))
      .matcher(s).replaceFirst(rep)

  /** First-occurrence LITERAL replacement for document-word rewrites (stage
    * 3/11): no regex compile in the per-row hot path, no cache needed. */
  private def replaceFirstLiteral(s: String, target: String, rep: String): String = {
    val i = s.indexOf(target)
    if (i < 0) s else s.substring(0, i) + rep + s.substring(i + target.length)
  }

  private def splitWords(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** `abrev_out` (normadresse.py:23-40): fold '@' markers (multi-word
    * abbreviations consume following original words), then try prefixes of
    * abbreviated words with the original tail, shortest abbreviation first.
    * Returns (candidate, fits, lib-without-markers). */
  private def abrevOut(orig: String, lib: String, maxOut: Int): (String, Boolean, String) = {
    val court = scala.collection.mutable.ArrayBuffer(splitWords(lib).toSeq: _*)
    val long = scala.collection.mutable.ArrayBuffer(splitWords(orig).toSeq: _*)
    var m = court.length - 1
    while (m > 0) {
      if (court(m) == "@") {
        if (m - 1 < long.length) long(m - 1) = court(m - 1)
        if (m < long.length) long.remove(m)
        court.remove(m)
      }
      m -= 1
    }
    val cleaned = lib.replace(" @", "")
    var out = cleaned
    var k = 1
    while (k < court.length) {
      out = (court.take(k) ++ long.drop(k)).mkString(" ").trim
      if (out.length <= maxOut) return (out, true, cleaned)
      k += 1
    }
    (out, out.length <= maxOut, cleaned)
  }

  /** The staged abbreviator (normadresse.py `abrev`). */
  def abrev(input: String, maxi: Int = 32): String = {
    var lib = Unaccent.strip(UTF8String.fromString(input)).toString
      .toUpperCase(java.util.Locale.ROOT)
    lib = lib.replaceAll("[^A-Z0-9]", " ").replace("  ", " ")
    val orig = lib
    if (lib.length <= maxi) return lib

    var prev = orig
    var done: String = null
    // After-stage budget check: mix abbreviated prefix with original tail;
    // on failure continue with the marker-cleaned lib as the next "orig".
    def mix(origX: String): Boolean = {
      val (o, ok, p) = abrevOut(origX, lib, maxi)
      prev = p
      if (ok) { done = o; true } else { lib = p; false }
    }

    // 1 — way type at start
    for (r <- stage(1)) lib = subFirst(lib, "^" + r.long, r.court)
    if (mix(orig)) return done

    // 2 — military/religious/civil titles (two passes, count=1 each)
    for (_ <- 0 until 2; r <- stage(2))
      lib = subFirst(lib, " " + r.long + " ", " " + r.court + " ")
    if (mix(prev)) return done

    // 4 — general abbreviations (three passes, lowercased marks "done")
    for (_ <- 0 until 3; r <- stage(4))
      lib = subFirst(lib, "(^| )" + r.long + " ",
        " " + r.court.toLowerCase(java.util.Locale.ROOT) + " ").trim
    if (mix(prev)) return done

    // 5 — way types mid-string (plus stage-1 types mid-string), two passes
    for (_ <- 0 until 2) {
      for (r <- stage(5))
        lib = subFirst(lib, " " + r.long.trim + " ",
          " " + r.court.trim.toLowerCase(java.util.Locale.ROOT) + " ")
      for (r <- stage(1))
        lib = subFirst(lib, " " + r.long.trim + " ",
          " " + r.court.trim.toLowerCase(java.util.Locale.ROOT) + " ")
    }
    if (mix(prev)) return done

    // 3 — first names, except right after SAINT*
    val mots = splitWords(lib)
    for (n <- 1 until mots.length - 1) {
      val w = mots(n)
      if (!mots(n - 1).startsWith("SAINT")) {
        for (r <- stage(3)) {
          val w2 = subFirst(w, "^" + r.long + "$",
            r.court.toLowerCase(java.util.Locale.ROOT))
          if (w != w2)
            lib = replaceFirstLiteral(lib, " " + w + " ", " " + w2 + " ")
        }
      }
    }
    if (mix(prev)) return done

    // 6 — SAINT/SAINTE, PROLONGE(E), INFERIEUR(E)… (two passes)
    for (_ <- 0 until 2; r <- stage(6))
      lib = subFirst(lib, r.long, r.court.toLowerCase(java.util.Locale.ROOT))
    if (mix(prev)) return done

    // 5bis — way type at start, lowercased
    for (r <- stage(5))
      lib = subFirst(lib, "^" + r.long.trim + " ",
        r.court.trim.toLowerCase(java.util.Locale.ROOT) + " ")
    if (mix(prev)) return done

    lib = lib.replace(" @", "")

    // 9 — protect name particles (DE LA X of proper names, …)
    for (r <- stage(9)) lib = subFirst(lib, r.long, r.court)

    // 10 — drop uppercase articles, re-checking the budget each time
    for (_ <- 0 until 6) {
      lib = subFirst(lib, " (LE|LA|LES|AU|AUX|DE|DU|DES|D|ET|A|L|SUR|EN) ", " ")
      if (lib.length <= maxi) return lib
    }

    // 11 — residual: still-uppercase words collapse to their first letter
    for (w <- splitWords(lib)) {
      if (w == w.toUpperCase(java.util.Locale.ROOT) && w.length > 1 && w(0) >= 'A') {
        lib = replaceFirstLiteral(lib, " " + w + " ", " " + w(0) + " ")
        if (lib.length <= maxi) return lib
      }
    }

    // 12 — drop the lowercase (already-abbreviated) articles
    for (_ <- 0 until 4) {
      lib = subFirst(lib, " (le|la|les|au|aux|de|du|des|d|et|a|l|sur) ", " ")
      if (lib.length <= maxi) return lib
    }
    lib
  }

  /** JVM worker for interpreted eval and generated code. */
  def abrevU(s: UTF8String): UTF8String = UTF8String.fromString(abrev(s.toString))

  /** Column entry point: full reference `abrev` semantics (mixed case —
    * lowercase marks abbreviated words; the reference's consumer upper-cases
    * afterwards, `geocode.py:60`). */
  def normadresseFull(c: Column): Column =
    Bridge.column(NormAdresseAbrev(Bridge.expression(c)))
}

/** Codegen'd expression form of [[NormAdresseFull.abrev]]. */
case class NormAdresseAbrev(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normadresse requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormAdresseFull.abrevU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormAdresseFull.abrevU($c)")
  override protected def withNewChildInternal(newChild: Expression): NormAdresseAbrev =
    copy(child = newChild)
}
