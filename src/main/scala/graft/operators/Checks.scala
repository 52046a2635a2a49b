package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks as first-class operators — the reference's inline
  * runtime assertions (SURVEY §5.4: key uniqueness
  * `dvf/explore/task_functions.py:280,710,735`, row-count conservation
  * `dvf/geoloc/task_functions.py:319`, shape asserts
  * `sante/finess/task_functions.py:92`). Each check is ONE aggregation —
  * no collect of data rows — and throws [[CheckFailed]] with a counted
  * diagnosis.
  */
object Checks {

  final case class CheckFailed(msg: String) extends RuntimeException(msg)

  /** Key uniqueness: count(distinct keys) == count(non-null-key rows), with
    * null-key rows counted separately so the diagnosis distinguishes
    * duplicates from nulls. */
  def assertUnique(df: DataFrame, cols: Seq[String], what: String = "frame"): Unit = {
    val anyNull = cols.map(c => col(c).isNull).reduce(_ || _)
    val r = df.agg(count(lit(1)).as("n"),
      countDistinct(cols.head, cols.tail: _*).as("d"),
      coalesce(sum(when(anyNull, 1L).otherwise(0L)), lit(0L)).as("nulls")).head()
    val (n, d, nulls) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (nulls > 0) throw CheckFailed(
      s"$what: key ${cols.mkString("(", ",", ")")} has $nulls null-key rows")
    if (n != d) throw CheckFailed(
      s"$what: key ${cols.mkString("(", ",", ")")} not unique — $n rows, $d distinct")
  }

  /** Row-count conservation across a transformation (joins must not drop or
    * duplicate, `dvf/geoloc/task_functions.py:319`). */
  def assertSameCount(before: DataFrame, after: DataFrame, what: String = "transform"): Unit = {
    val (b, a) = (before.count(), after.count())
    if (b != a) throw CheckFailed(s"$what: row count changed $b -> $a")
  }

  /** No nulls in the given columns (vacuously true on an empty frame —
    * sum() over zero rows is null, hence the coalesce). */
  def assertNoNulls(df: DataFrame, cols: Seq[String], what: String = "frame"): Unit = {
    val aggs = cols.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = cols.zipWithIndex.collect { case (c, i) if r.getLong(i) > 0 => s"$c=${r.getLong(i)}" }
    if (bad.nonEmpty) throw CheckFailed(s"$what: null values in ${bad.mkString(", ")}")
  }

  /** All values of a column inside [lo, hi]. */
  def assertInRange(df: DataFrame, c: String, lo: Double, hi: Double,
                    what: String = "frame"): Unit = {
    val n = df.filter(col(c) < lo || col(c) > hi).count()
    if (n > 0) throw CheckFailed(s"$what: $n rows of $c outside [$lo, $hi]")
  }

  /** Functional-dependency / candidate-key audit as a REPORT rather than an
    * assertion: for one named rule, either LHS uniqueness (`rhs = None` —
    * candidate-key discovery) or the FD lhs → rhs (every LHS group maps to
    * exactly one RHS value), counted exactly. NULL counts as a distinct
    * RHS value — a group with values {x, NULL} violates "maps to exactly
    * one RHS value" (plain countDistinct would silently ignore the NULL
    * and under-report). One aggregation keyed on the LHS (no collect;
    * scale = one shuffle on the LHS key space, group cardinality ≤ rows
    * by definition). Returns one row
    * (rule, n_rows, n_groups, n_violating, holds); compose a profile from
    * several rules with unionByName. */
  def fdAudit(df: DataFrame, rule: String, lhs: Seq[String],
              rhs: Option[String]): DataFrame = {
    val grouped = rhs match {
      case Some(r) => df.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          (countDistinct(col(r)) +
            max(when(col(r).isNull, 1L).otherwise(0L))).as("__nd"))
      case None => df.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("__n"), lit(1L).as("__nd"))
    }
    fdReport(grouped, rule, fd = rhs.isDefined)
  }

  /** Join fan-out audit — the multiplicity half of referential integrity
    * (dq4 counts orphans; this counts AMPLIFICATION): for a dim-key ⋈
    * fact-FK relation, how many dim keys match, how many fact rows ride
    * each, and the worst/average fan-out — the numbers that predict a
    * join's output size and its skew exposure before running it. One
    * fact-side aggregation keyed on the FK plus one dim-side left join —
    * no data-sized collect, never the joined output itself. avg fan-out
    * is integer ppm over matched keys (no doubles), computed WIDE —
    * n_fact_rows is a GLOBAL row count, so ×10⁶ can top Long.MaxValue at
    * corpus scale; DECIMAL(38,0) div ≡ the oracle's HUGEINT `//` (DuckDB
    * SUM already widens; only the Spark side could wrap — the HITS
    * class, r12 ADVICE). */
  def fanoutAudit(dim: DataFrame, key: String, fact: DataFrame, fk: String,
                  relation: String): DataFrame = {
    val f = fact.groupBy(col(fk).as("__k")).agg(count(lit(1)).as("__c"))
    dim.select(col(key).as("__k"))
      .join(f, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_dim"),
        count(col("__c")).as("n_matched_dim"),
        coalesce(sum("__c"), lit(0L)).as("n_fact_rows"),
        coalesce(max("__c"), lit(0L)).as("max_fanout"))
      .select(lit(relation).as("relation"), col("n_dim"),
        col("n_matched_dim"), col("n_fact_rows"), col("max_fanout"),
        expr("CASE WHEN n_matched_dim = 0 THEN 0L" +
          " ELSE CAST(CAST(n_fact_rows AS DECIMAL(38,0)) * 1000000" +
          " div CAST(n_matched_dim AS DECIMAL(38,0)) AS BIGINT) END")
          .as("avg_fanout_ppm"))
  }

  /** Report-assembly tail shared by [[fdAudit]] and the streaming monitor
    * ([[graft.streaming.StreamingFdMonitor]]): fold a per-LHS-group frame
    * carrying `__n` (group row count) and `__nd` (distinct RHS count; 1
    * for uniqueness rules) into the one-row audit. */
  private[graft] def fdReport(grouped: DataFrame, rule: String,
                              fd: Boolean): DataFrame = {
    val viol = if (fd) col("__nd") > 1 else col("__n") > 1
    grouped
      .agg(sum("__n").as("n_rows"), count(lit(1)).as("n_groups"),
        sum(when(viol, 1L).otherwise(0L)).as("n_violating"))
      .select(lit(rule).as("rule"), col("n_rows"), col("n_groups"),
        col("n_violating"), (col("n_violating") === 0L).as("holds"))
  }
}
