package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Web

/** Measurement harness for the web-curation family: at each arg dir, time
  * (a) d18's URL canonicalization dedup (plant → canonicalize → groupBy on
  * the canonical string → verdict join), (b) the u1 full domain cap
  * (domain window), and (c) folding a FIXED 500-doc batch against the
  * dir's persisted domain-membership index (index build untimed — the
  * persisted-artifact premise, as D13/D15/D16Probe). Expected shapes: the
  * full passes scale ~linearly (content-keyed shuffle / high-cardinality
  * domain window); the incremental fold's only corpus-sized work is ONE
  * count aggregate over the membership store, whose row count is capped
  * at domains × cap — so the fold should stay near-FLAT as the corpus
  * grows (flatter than d16b's index-scan-bound fold). */
object WebProbe {

  private val urlPlant =
    """concat('https://',
      |  case when element_at(array('www','blog','news',''), cast(doc_id % 4 as int) + 1) = ''
      |       then ''
      |       else concat(element_at(array('www','blog','news',''), cast(doc_id % 4 as int) + 1), '.') end,
      |  element_at(array('alpha','beta','gamma','delta','epsilon','zeta','eta'), cast(doc_id * 3 % 7 as int) + 1),
      |  '.', element_at(array('com','co.uk','org'), cast(doc_id % 3 as int) + 1),
      |  '/p/', cast(doc_id as string))""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (dir <- args) {
      val ids = graft.Tables.documents(spark, dir).select("doc_id")
      val nDocs = ids.count()

      // d18 shape: canonicalize + content-keyed dedup (3-variant groups)
      val urls = ids.withColumn("__g", expr("doc_id div 3"))
        .withColumn("url", expr(urlPlant.replace("doc_id", "__g")))
        .withColumn("url", expr(
          """case when doc_id % 3 = 1 then concat(url, '?utm_source=feed#top')
            |     when doc_id % 3 = 2 then concat(upper(url), '/?utm_medium=m')
            |     else url end""".stripMargin))
      val canon = urls.withColumn("canon", expr(Web.canonicalizeUrlSql("url")))
        .select("doc_id", "canon")
      def d18Once(): Unit = {
        val grp = canon.groupBy(col("canon"))
          .agg(min(col("doc_id")).as("kept_id"), count(lit(1)).as("n_variants"))
        noop(canon.join(grp, Seq("canon")))
      }

      // u1 shape: registrable domain + exact cap window
      val dom = ids
        .withColumn("url", expr(urlPlant))
        .select(col("doc_id"), expr(Web.hostSql("url")).as("host"))
        .withColumn("domain", expr(Web.registrableDomainSql("host")))
        .select("doc_id", "domain")
      def u1Once(): Unit =
        noop(Web.domainCap(dom, "doc_id", "domain", cap = 20))

      // u1b shape: fixed 500-doc batch vs the persisted membership store
      // (store build untimed; its size is min(corpus, domains × cap))
      val index = Web.domainKeptIndex(dom, "doc_id", "domain", cap = 20)
        .localCheckpoint(true)
      val batch = dom.filter(col("doc_id") < 500)
        .select((col("doc_id") + 1000000000L).as("bid"), col("domain"))
      def u1bOnce(): Unit =
        noop(Web.incrementalDomainCap(index, batch, "bid", "domain", cap = 20))

      d18Once(); u1Once(); u1bOnce() // untimed warm (codegen JIT)
      val td18 = timed(d18Once())
      val tu1 = timed(u1Once())
      val tu1b = timed(u1bOnce())
      println(f"WEBPROBE dir=$dir n=$nDocs d18=$td18%.2f u1=$tu1%.2f u1b_fold=$tu1b%.2f")
    }
    spark.stop()
  }
}
