package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for g6_similar_nodes: does the neighbor-set MinHash band
  * join stay linear as the graph grows with DEGREE HELD CONSTANT (the
  * regime the operator claims — the bucketed-similarity invariant: band
  * keys derive from neighbor-id content, so the key space grows with the
  * node universe)?
  *
  * Synthetic graph: n nodes, each with 100 hash-chosen neighbors from
  * [0, n); every 200th node gets a structural twin (same neighbors minus
  * every z % 10 == 3, J = 0.9 exactly). Random-pair neighborhood Jaccard
  * shrinks as 100/n, so organic band collisions (~J⁴ per 4-row band)
  * vanish as the graph grows — candidates should track the PLANTED twin
  * count (n/200), not n².
  *
  * Usage: runMain graft.tools.G6Probe <n> [<n> ...]
  */
object G6Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- args.map(_.toLong)) {
      // LONG neighbor sets — the exact input shape g6 feeds the r14
      // long-token kernel (stringified-token probes pre-date it; the band
      // space is bit-identical either way, so exponents are comparable)
      val base = spark.range(n).select(col("id").as("doc_id"),
        expr(s"""transform(sequence(0, 99),
                  j -> cast(pmod(hash(id * 100 + j), $n) as bigint))""").as("toks"))
      val twins = spark.range(n).filter(col("id") % 200 === 0)
        .select((col("id") + 10000000L).as("doc_id"),
          expr(s"""filter(transform(sequence(0, 99),
                    j -> cast(pmod(hash(id * 100 + j), $n) as bigint)),
                   z -> z % 10 != 3)""").as("toks"))
      val sets = base.unionByName(twins).localCheckpoint(true)

      val bandRows = Dedup.minhashBandIndexLong(sets, "doc_id", "toks",
        k = 16, bands = 4).localCheckpoint(true)
      val cand = bandRows.select(col("doc_id").as("id1"), col("band_idx"), col("bh"))
        .join(bandRows.select(col("doc_id").as("id2"), col("band_idx"), col("bh")),
          Seq("band_idx", "bh"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct().count()

      def timed(): (Long, Double) = {
        val t0 = System.nanoTime()
        val c = Dedup.minhashLshPairsLong(sets, "doc_id", "toks",
          k = 16, bands = 4, threshold = 0.5).count()
        (c, (System.nanoTime() - t0) / 1e9)
      }
      timed() // warm
      val (pairs, secs) = timed()
      println(f"n=$n%d nodes=${n + n / 200}%d candidates=$cand%d " +
        f"verified=$pairs%d planted=${n / 200}%d ${secs}%.2f s")
    }
    spark.stop()
  }
}
