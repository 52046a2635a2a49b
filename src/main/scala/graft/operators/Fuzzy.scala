package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — the JOIN form of edit-distance record linkage
  * (the scalar `levenshtein` is F20): SymSpell-style deletion-neighborhood
  * blocking. Every reference string is expanded to its 1-deletion variants
  * ONCE; a probe matches iff it equals some variant (candidate generation
  * is an EQUI-join on the variant string — a content-derived key space
  * that grows with the reference set, never an all-pairs scan). The
  * directed join needs NO verify (equality with a deletion variant IS
  * edit distance 1); the symmetric self-join verifies with exact
  * levenshtein, whose candidates genuinely reach distance 2.
  *
  * Scale shape: |ref|·avg_len variant rows, one equi-join keyed on the
  * variant value; the quadratic all-pairs fuzzy join never exists. At
  * deployment scale the variant column is hashed to 8 bytes (the d16d
  * lever) and distance-2 adds the probe's own deletions (symmetric
  * SymSpell) — parameter swaps on the same plan. Variant generation is a
  * per-row HOF (transform over a position range) — corpus-scale hot use
  * would promote it to a native codegen Expression like SlidingWindows;
  * the join shape is the scale-bearing part.
  *
  * Two measured regimes fence deployment (tools/FzProbe, PLANS r12 s1):
  *   - REPLICATED strings make candidates quadratic: TPC-H p_name
  *     replicates 64 color-phrases, and matches grew ×97 at ×10 records
  *     (9.2 k → 896 k). Exact-dup multiplicity belongs to d1's
  *     hash-groupBy FIRST; run the blocker on the DISTINCT-string
  *     registry (the er1 contract — er1 does exactly this).
  *   - LONG strings blow an O(L²) levenshtein VERIFY, not the join
  *     (measured ×4 length → ×14 wall at sf0.1, 4.4 → 61.8 s, index rows
  *     only ×5 — the probe predates deletionJoin dropping its redundant
  *     verify). Rule: never run a general edit distance where the
  *     candidate construction already bounds it — deletionJoin needs
  *     none at all; for [[symmetricSelfJoin]] on document-length strings
  *     hash the variants for the join and verify with the position-aware
  *     compare at the two known deletion positions.
  */
object Fuzzy {

  /** 1-deletion variants of `strCol`: (variant, pos). Positions are
    * 1-based; a length-L string yields L variants. */
  def deletionVariants(df: DataFrame, strCol: String): DataFrame =
    df.withColumn("__vars", expr(
        s"transform(sequence(1, length($strCol)), " +
          s"p -> struct(concat(substring($strCol, 1, p - 1), " +
          s"substring($strCol, p + 1, length($strCol))) AS variant, " +
          s"CAST(p AS BIGINT) AS pos))"))
      .select(col("*"), explode(col("__vars")).as("__v"))
      .drop("__vars")
      .withColumn("variant", col("__v.variant"))
      .withColumn("pos", col("__v.pos"))
      .drop("__v")

  /** Deletion-neighborhood fuzzy join: probes (probeId, probeCol) against
    * references (refId, refCol), matching exactly the pairs at edit
    * distance 1 where the edit is a deletion FROM the reference (the
    * spelling-correction direction). Distinct pairs (a probe can equal
    * several variants of the same reference — e.g. a doubled letter).
    *
    * NO verify step — the equi-join IS the proof: probe == variant(ref)
    * means |probe| = |ref| − 1 (so lev ≥ 1) and one deletion transforms
    * ref into probe (so lev ≤ 1) — every candidate has edit distance
    * EXACTLY 1, and the O(L²) levenshtein this used to run per candidate
    * was constant-valued work (measured ×14 wall at ×4 string length —
    * FzProbe, PLANS r12 s1). [[symmetricSelfJoin]]'s verify stays: its
    * shared-deletion-key candidates genuinely reach lev 2.
    * @return (probeId, refId, lev) with lev ≡ 1, ordered by caller */
  def deletionJoin(probes: DataFrame, probeId: String, probeCol: String,
                   refs: DataFrame, refId: String, refCol: String): DataFrame = {
    val vars = deletionVariants(refs.select(col(refId), col(refCol)), refCol)
      .select(col(refId), col("variant"))
    probes.select(col(probeId), col(probeCol))
      .join(vars, col(probeCol) === col("variant"))
      .select(col(probeId), col(refId))
      .distinct()
      .withColumn("lev", lit(1L))
  }

  /** Symmetric SymSpell self-join: all UNORDERED record pairs at edit
    * distance ≤ 1. Blocking key set K(s) = {s} ∪ deletions(s); any
    * lev ≤ 1 pair shares a key (equal → s itself; insert/delete → one is
    * the other's deletion; substitution → common deletion at the edit
    * position), so the equi-join on K is a candidate SUPERSET, verified
    * with exact levenshtein. Same scale shape as [[deletionJoin]]:
    * (L+1)·|records| key rows, one equi-join keyed on content-derived
    * strings — never all-pairs. Exact-duplicate strings DO form cliques
    * in the key space; dedup records to distinct strings first when
    * multiplicity is high (the caller owns that, as with d8's salting).
    * @return (id1, id2, lev) with id1 < id2, distinct */
  def symmetricSelfJoin(records: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keys = records.select(col(idCol), col(strCol))
      .withColumn("__k", explode(expr(
        s"array_union(array($strCol), transform(sequence(1, length($strCol)), " +
          s"p -> concat(substring($strCol, 1, p - 1), " +
          s"substring($strCol, p + 1, length($strCol)))))")))
    val a = keys.select(col(idCol).as("id1"), col(strCol).as("__s1"), col("__k"))
    val b = keys.select(col(idCol).as("id2"), col(strCol).as("__s2"), col("__k"))
    a.join(b, Seq("__k")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        levenshtein(col("__s1"), col("__s2")).cast("long").as("lev"))
      .distinct()
      .filter(col("lev") <= 1)
  }

  /** Soundex phonetic code (simplified standard variant) as a pure column
    * expression — the classic ER BLOCKING key: first letter + the first 3
    * consonant-class digits after adjacent-duplicate collapse, zero-padded.
    * Variant pinned here (and in the DuckDB twin [[soundexDuckSql]]):
    * codes from {BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6, else 0},
    * adjacent EQUAL CODES collapse (vowels between same codes do NOT
    * separate them — the simplification), first code dropped, zeros
    * removed, truncate/pad to 3. Every stage is an index-addressed array
    * transform let-bound once ([[TextOps.letSql]] — the catalyst-eval-cost
    * invariant); no regex backreferences (RE2 has none, so the oracle can
    * replay char-for-char). */
  def soundexSparkSql(e: String): String = {
    val code = (c: String) =>
      s"CASE WHEN $c IN ('B','F','P','V') THEN '1'" +
        s" WHEN $c IN ('C','G','J','K','Q','S','X','Z') THEN '2'" +
        s" WHEN $c IN ('D','T') THEN '3' WHEN $c = 'L' THEN '4'" +
        s" WHEN $c IN ('M','N') THEN '5' WHEN $c = 'R' THEN '6'" +
        s" ELSE '0' END"
    TextOps.letSql(s"upper($e)", "u") { u =>
      TextOps.letSql(
        s"transform(sequence(1, length($u)), i -> ${code(s"substring($u, i, 1)")})",
        "cs") { cs =>
        TextOps.letSql(
          s"filter(transform(sequence(1, size($cs)), i -> " +
            s"if(i = 1 or element_at($cs, i) <> element_at($cs, i - 1), " +
            s"element_at($cs, i), null)), x -> x is not null)", "dd") { dd =>
          s"concat(substring($u, 1, 1), rpad(substring(concat_ws(''," +
            s" filter(slice($dd, 2, size($dd)), x -> x <> '0')), 1, 3), 3, '0'))"
        }
      }
    }
  }

  /** DuckDB twin of [[soundexSparkSql]] — same staged formula over
    * 1-based list indexing; meant to run over a small DISTINCT-name
    * registry CTE (the er1 contract), where per-stage re-evaluation is
    * harmless. */
  def soundexDuckSql(e: String): String = {
    val code = (c: String) =>
      s"CASE WHEN $c IN ('B','F','P','V') THEN '1'" +
        s" WHEN $c IN ('C','G','J','K','Q','S','X','Z') THEN '2'" +
        s" WHEN $c IN ('D','T') THEN '3' WHEN $c = 'L' THEN '4'" +
        s" WHEN $c IN ('M','N') THEN '5' WHEN $c = 'R' THEN '6'" +
        s" ELSE '0' END"
    val u = s"upper($e)"
    val cs = s"list_transform(range(1, length($u) + 1), i -> ${code(s"substr($u, i, 1)")})"
    val dd = s"list_filter(list_transform(range(1, len($cs) + 1), i -> " +
      s"CASE WHEN i = 1 OR ($cs)[i] <> ($cs)[i - 1] THEN ($cs)[i] END), " +
      s"x -> x IS NOT NULL)"
    s"substr($u, 1, 1) || rpad(substr(array_to_string(" +
      s"list_filter(($dd)[2:], x -> x <> '0'), ''), 1, 3), 3, '0')"
  }
}
