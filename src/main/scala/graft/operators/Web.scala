package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain operators for crawl-corpus curation: host extraction,
  * registrable-domain (eTLD+1) resolution against a public-suffix table,
  * and RefinedWeb-style per-domain document caps (Penedo et al. 2023 —
  * bounding any single site's share of the training set).
  *
  * Everything is a pure column expression except the cap, which is one
  * hash-ordered rank per domain. */
object Web {

  /** Spark-dialect SQL: host of an http(s) URL string expr. */
  def hostSql(url: String): String =
    s"regexp_extract($url, 'https?://([^/]+)', 1)"

  /** Two-level public suffixes the resolver knows. The real mechanism is
    * the full public-suffix list; swapping it in changes this literal set
    * only (the t13 trained-weights argument). */
  val twoLevelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  /** Spark-dialect SQL: registrable domain (eTLD+1) of a host expr —
    * last two labels, or last three when the last two form a two-level
    * public suffix. Let-bound so the label split evaluates once. */
  def registrableDomainSql(host: String): String = {
    val set = twoLevelSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")
    TextOps.letSql(s"split($host, '\\\\.')", "ls") { ls =>
      s"""if(array_join(slice($ls, size($ls) - 1, 2), '.') in $set,
         |   array_join(slice($ls, size($ls) - 2, 3), '.'),
         |   array_join(slice($ls, size($ls) - 1, 2), '.'))""".stripMargin
    }
  }

  /** Spark-dialect SQL: canonical form of an http(s) URL — the dedup key
    * of crawl-frontier / re-crawl pipelines. Rules: drop the fragment,
    * lowercase scheme+host, strip trailing slashes from the path, drop
    * `utm_*` tracking params while PRESERVING every other param in order.
    * Let-bound per stage (catalyst-eval-cost invariant); patterns in the
    * Java∩RE2 intersection so the DuckDB twin replays them ('g'-flag
    * regexp_replace, COALESCE over its empty-list array_to_string). */
  def canonicalizeUrlSql(url: String): String =
    TextOps.letSql(s"regexp_replace($url, '#.*$$', '')", "nf") { nf =>
      TextOps.letSql(s"lower(regexp_extract($nf, '(?i)^(https?://[^/?]+)', 1))", "sh") { sh =>
        TextOps.letSql(
          s"regexp_replace(regexp_extract($nf, '(?i)^https?://[^/?]+([^?]*)', 1), '/+$$', '')", "pa") { pa =>
          TextOps.letSql(
            s"""array_join(filter(split(regexp_extract($nf, '\\\\?(.*)$$', 1), '&'),
               |  p -> p != '' and not startswith(p, 'utm_')), '&')""".stripMargin, "qq") { qq =>
            s"concat($sh, $pa, if($qq = '', '', concat('?', $qq)))"
          }
        }
      }
    }

  /** Per-domain document cap: deterministic md5-ordered rank within each
    * registrable domain plus the domain's total count; `kept` keeps the
    * first `cap` docs of every domain. One shuffle (both window specs
    * share the domain partitioning).
    *
    * Scale: domains are a naturally high-cardinality key, so the window
    * partitions evenly; a pathological single-domain crawl (one domain
    * holding a whole task's worth of rows) routes to the distributed
    * selection machinery instead (`Distribution.distributedQuantiles`
    * shape — rank boundaries, not per-row sort), the same escape hatch
    * f18c documents for few-huge-groups. */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
                cap: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("domain_docs", count(lit(1)).over(Window.partitionBy(col(domainCol))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("kept", col("rk") <= cap)
  }

  /** The persisted artifact for the incremental cap: the KEPT (id, domain)
    * membership rows of [[domainCap]] — presence rows, so the cap's state
    * is just the store's per-domain row count. */
  def domainKeptIndex(df: DataFrame, idCol: String, domainCol: String,
                      cap: Int): DataFrame =
    domainCap(df, idCol, domainCol, cap).filter(col("kept"))
      .select(col(idCol), col(domainCol))

  /** Incremental per-domain cap against a persisted membership index:
    * arrival-order priority (indexed docs hold their quota — the d12
    * later-batches-demoted semantic). The index contributes ONE count
    * aggregation per batch and only its per-domain COUNTS move over the
    * wire — a broadcast-sized frame bounded by the registrable-domain
    * space, not the corpus; batch docs rank within themselves by md5 and
    * keep while `prior + rank <= cap`. Equals the full [[domainCap]] over
    * index ∪ batch under index-first ordering (WebSpec pins the
    * equivalence). */
  def incrementalDomainCap(index: DataFrame, batch: DataFrame, idCol: String,
                           domainCol: String, cap: Int): DataFrame = {
    val prior = index.groupBy(col(domainCol))
      .agg(count(lit(1)).as("prior"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    batch.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(prior), Seq(domainCol), "left")
      .withColumn("prior", coalesce(col("prior"), lit(0L)))
      .withColumn("kept", col("prior") + col("rk") <= cap)
  }
}
