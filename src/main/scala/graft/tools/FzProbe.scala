package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, TextOps}

/** Scale probe for fz1/er1's cost model: the deletion-neighborhood blocker
  * indexes K(s) = |s| one-deletion variants per record, so the variant
  * index is Σ|s| rows — LINEAR in records at constant string length, but
  * every record costs O(L) index rows and the equi-join keys are
  * length-(L−1) strings, so a LONG-string registry multiplies both the
  * index size and the shuffled bytes by L. For each arg dir this runs the
  * fz1 probe-vs-part join on the natural names (~30 chars) and on a
  * long-string synthetic (name repeated ×4, ~120 chars), reporting
  * records, variant-index rows, candidate pairs, verified matches, and
  * wall seconds; compare two SFs to read the record exponent (expect ~1)
  * and the two length regimes to read the O(L) constant.
  *
  * Deployment rule this probe backs (Fuzzy scaladocs): the blocker is for
  * NAME-length keys (registries, titles); for document-length strings,
  * hash the variants to 64-bit first (the d16d payload lever — equality
  * of variants is what the join needs, not the variant text), or block on
  * a fixed-length prefix window. */
object FzProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(parts: DataFrame): (Long, Long, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val probes = parts.filter(col("p_partkey") % 7 === 0)
        .withColumn("__h", expr(TextOps.md5LongSql("cast(p_partkey as string)")))
        .withColumn("__pos", col("__h") % (length(col("p_name")) - 1) + 2)
        .select(col("p_partkey").as("probe_key"),
          expr("concat(substring(p_name, 1, __pos - 1)," +
            " substring(p_name, __pos + 1, length(p_name)))").as("probe_name"))
      val nRecords = parts.count()
      val idxRows = Fuzzy.deletionVariants(parts, "p_name").count()
      val matched = Fuzzy.deletionJoin(probes, "probe_key", "probe_name",
        parts, "p_partkey", "p_name")
      val nMatch = matched.count()
      // candidate volume = the pre-verify equi-join output
      val cand = Fuzzy.deletionVariants(parts, "p_name")
        .select(col("p_partkey").as("cand_key"), col("variant"))
        .join(probes, col("variant") === col("probe_name"))
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      (nRecords, idxRows, cand, nMatch, secs)
    }

    for (dir <- args) {
      val parts = spark.read.parquet(s"$dir/part.parquet")
        .select("p_partkey", "p_name").localCheckpoint(true)
      val (n1, i1, c1, m1, s1) = run(parts)
      // long-string regime: same record count, 4x the length (distinct
      // separators keep the planted deletion unambiguous)
      val long4 = parts.select(col("p_partkey"),
          concat_ws(" / ", col("p_name"), col("p_name"), col("p_name"),
            col("p_name")).as("p_name"))
        .localCheckpoint(true)
      val (n2, i2, c2, m2, s2) = run(long4)
      println(s"""{"dir": "$dir", "records": $n1, """ +
        s""""nat": {"index_rows": $i1, "candidates": $c1, "matches": $m1, "secs": ${f"$s1%.2f"}}, """ +
        s""""long4": {"records": $n2, "index_rows": $i2, "candidates": $c2, "matches": $m2, "secs": ${f"$s2%.2f"}}}""")
    }
    spark.stop()
  }
}
