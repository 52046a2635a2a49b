package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Unaccent.unaccent

/** French address normalization — a rule-table reduction of the reference's
  * normadresse 8-stage rewriter
  * (`insee/sirene/geocodage/scripts/normadresse.py:23-268`): uppercase,
  * strip accents, abbreviate way types, drop particles, squeeze spaces.
  * Rules apply IN ORDER (longer way-types first so BOULEVARD never matches
  * a later rule's prefix), as chained regexp_replace — one codegen'd
  * projection, no UDF.
  */
object NormAdresse {

  /** (pattern, replacement) pairs, applied in order. Kept as data so the
    * DuckDB oracle can be generated from the same table. */
  val rules: Seq[(String, String)] = Seq(
    "\\bBOULEVARD\\b" -> "BD",
    "\\bAVENUE\\b" -> "AV",
    "\\bPLACE\\b" -> "PL",
    "\\bROUTE\\b" -> "RTE",
    "\\bCHEMIN\\b" -> "CHE",
    "\\bIMPASSE\\b" -> "IMP",
    "\\bALLEE\\b" -> "ALL",
    "\\bRUE\\b" -> "R",
    "\\bSAINT\\b" -> "ST",
    "\\bSAINTE\\b" -> "STE",
    "\\b(DE LA|DE L'|DES|DE|DU|LA|LE|LES)\\b" -> "",
    " {2,}" -> " ")

  def normadresse(addr: Column): Column = {
    val upperStripped = upper(unaccent(addr))
    trim(rules.foldLeft(upperStripped) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    })
  }

  /** DuckDB twin of [[normadresse]] over a SQL fragment (strip_accents has
    * no ligature handling, so feed it ligature-free input in oracles). */
  def oracleSql(addr: String): String = {
    val upperStripped = s"upper(strip_accents($addr))"
    def q(s: String) = s.replace("'", "''")
    val chained = rules.foldLeft(upperStripped) { case (sqlExpr, (pat, rep)) =>
      s"regexp_replace($sqlExpr, '${q(pat)}', '${q(rep)}', 'g')"
    }
    s"trim($chained)"
  }
}
