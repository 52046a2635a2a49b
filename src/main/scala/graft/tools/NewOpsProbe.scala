package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the r12+ operators: wall time at sf0.1 vs the
  * deterministic 10x dir (graft.ScaleGen), one warm pass then one timed
  * pass per (dir, query) — the PLANS r6 exponent method. Expectations:
  *   - d22/samp7: gram/window traffic is linear in corpus bytes; the eval
  *     window set / weight table stays broadcast-bounded → exponent ≈ 1.
  *   - g7: the token-adjacency VOCABULARY is fixed by the generator, so
  *     the iteration cost is constant and only the edge build scales →
  *     exponent < 1 (build-dominated).
  *   - g8/dq6: lineitem-derived; the co-purchase pair expansion is the
  *     g3/g4-audited shape.
  *   - ir6: brute MaxSim candidates scale linearly (broadcast query side).
  *   - er2: registry is the DISTINCT vocabulary — fixed here, so only the
  *     token scan scales.
  *   - a20/dq7 (r13): one lineitem-keyed shuffle each (cumulative-weight
  *     frame / FK pre-agg) → exponent ≈ 1.
  *   - log1/cons1 (r13): events-/orders-sized scan + one pivot/dedup
  *     shuffle; catalog side broadcast-fixed → exponent ≈ 1.
  *   (h2_ancestors closes over customer — a symlinked DIM table in the
  *   10x dir — so it has no fact-scaled probe here.)
  *
  * Usage: runMain graft.tools.NewOpsProbe <dir> [<dir> ...]
  */
object NewOpsProbe {
  private val queries = Seq(
    "d22_contamination_coverage", "samp7_dsir_selection", "g7_hits_keywords",
    "g8_multisource_sssp", "ir6_maxsim_topk", "geo2_geohash_cells",
    "er2_soundex_blocking", "dq6_fd_audit",
    "a20_weighted_median", "dq7_join_fanout",
    "log1_end_to_end", "cons1_end_to_end", "dq4_referential_integrity")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = graft.SparkEntry.queries
    for (dir <- args; name <- queries) {
      def run(): Unit =
        fns(name)(spark, dir).write.format("noop").mode("overwrite").save()
      run() // warm: JIT + artifact builds land outside the timed pass
      System.gc()
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $dir $name $dt%.2f s")
    }
    spark.stop()
  }
}
