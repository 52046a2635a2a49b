package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate pairs over a 64-bit perceptual hash carried as two
  * 32-bit halves — the banded pigeonhole join shared by the image dHash
  * (m4b) and audio fingerprint (m5b) families, and the same argument as
  * the SimHash text path (d3b): split the 64 bits into 8 disjoint 8-bit
  * bands; any pair within hamming distance 7 must agree on at least one
  * band verbatim, so candidates come from an EQUALITY join on
  * (band index, band value) and only candidates pay the exact hamming
  * check. Never all-pairs, and the join key space is content-derived so
  * it grows with the corpus (bucketed-similarity invariant).
  */
object Hash64 {

  /** Pairs (a_id < b_id, hamming ≤ maxHamming) from `hashes`, which must
    * carry `idCol` and the two 32-bit halves `hiCol`/`loCol` (BIGINTs;
    * null halves are skipped — the undecodable-payload rows). Pigeonhole
    * completeness over 8 bands requires maxHamming < 8. */
  def bandedNearDupPairs(hashes: DataFrame, idCol: String,
                         hiCol: String, loCol: String,
                         maxHamming: Int): DataFrame = {
    require(maxHamming < 8, s"pigeonhole over 8 bands needs maxHamming < 8")
    val h = hashes.filter(col(hiCol).isNotNull)
      .select(col(idCol), col(hiCol).as("__hi"), col(loCol).as("__lo"))
    def banded(side: String) = h.select(
        col(idCol).as(s"${side}_id"),
        col("__hi").as(s"${side}_hi"), col("__lo").as(s"${side}_lo"),
        explode(expr(
          """transform(sequence(0, 7), b -> named_struct(
            |  'band', b,
            |  'val', if(b < 4, shiftright(__lo, b * 8),
            |            shiftright(__hi, (b - 4) * 8)) & 255L))""".stripMargin))
          .as("bv"))
      .select(col(s"${side}_id"), col(s"${side}_hi"), col(s"${side}_lo"),
        col("bv.band").as("band"), col("bv.val").as("val"))
    val cand = banded("a").join(banded("b"), Seq("band", "val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hi", "a_lo", "b_hi", "b_lo")
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("hamming",
        bit_count(expr("a_hi ^ b_hi")) + bit_count(expr("a_lo ^ b_lo")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }
}
