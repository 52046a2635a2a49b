package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — the JOIN form of edit-distance record linkage
  * (the scalar `levenshtein` is F20): SymSpell-style deletion-neighborhood
  * blocking. Every reference string is expanded to its 1-deletion variants
  * ONCE; a probe matches iff it equals some variant (candidate generation
  * is an EQUI-join on the variant string — a content-derived key space
  * that grows with the reference set, never an all-pairs scan), then the
  * exact `levenshtein == 1` check verifies candidates only.
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
  *   - LONG strings blow the VERIFY, not the join: the levenshtein check
  *     is O(L²) per candidate (×4 length → ×14 wall at sf0.1, 4.4 →
  *     61.8 s, index rows only ×5). For document-length strings hash the
  *     variants (equality is all the join needs) and verify with the
  *     position-aware compare (a deletion-join candidate differs in one
  *     known position), never a general O(L²) edit distance.
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
    * spelling-correction direction). Verified with the built-in
    * levenshtein on candidates only. Distinct pairs (a probe can equal
    * several variants of the same reference — e.g. a doubled letter).
    * @return (probeId, refId, lev) ordered by caller */
  def deletionJoin(probes: DataFrame, probeId: String, probeCol: String,
                   refs: DataFrame, refId: String, refCol: String): DataFrame = {
    val vars = deletionVariants(refs.select(col(refId), col(refCol)), refCol)
      .select(col(refId), col(refCol), col("variant"))
    probes.select(col(probeId), col(probeCol))
      .join(vars, col(probeCol) === col("variant"))
      .select(col(probeId), col(refId),
        levenshtein(col(probeCol), col(refCol)).cast("long").as("lev"))
      .distinct()
      .filter(col("lev") === 1)
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
}
