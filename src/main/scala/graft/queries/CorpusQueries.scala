package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Similarity, TextOps, Web}

/** Web-corpus cleaning operators — the published filter batteries and
  * corpus-organization steps a crawl-to-training-set pipeline runs
  * between raw extraction and dedup: C4 line rules, domain-level caps,
  * HTML-to-text extraction, epoch-aware mixture upsampling.
  *
  * The synthetic `documents` corpus has no newlines, markup, or URLs, so
  * each query PLANTS its structure deterministically from (doc_id, text)
  * — the same closed formula on both engines (the t9 planted-PII
  * precedent) — and the operator under test then removes/extracts it.
  * Cleaned text is always proven by md5 (bytes, not re-rendered strings).
  */
object CorpusQueries {

  /** Planted "lines" for t14: the token stream cut into 10-token lines,
    * with C4-rule violations injected by closed formula — a "lorem ipsum"
    * prefix on ~1/23 of lines, a trailing brace on ~1/29, a "javascript"
    * prefix on ~1/17, and terminal punctuation withheld from 1/4. The
    * prefix/suffix CASE pair keeps the base-line expression single-use so
    * the DuckDB twin needs no nested lambda. */
  private val c4PlantSpark: String = TextOps.letSql("split(text, ' ')", "tv") { tv =>
    s"""transform(sequence(0, cast(ceil(size($tv) / 10.0) as int) - 1),
       |  i -> concat(
       |    case when (doc_id * 7 + i) % 23 = 0 then 'lorem ipsum '
       |         when (doc_id * 13 + i) % 29 = 0 then ''
       |         when (doc_id * 11 + i) % 17 = 0 then 'javascript '
       |         else '' end,
       |    array_join(slice($tv, cast(i * 10 + 1 as int), 10), ' '),
       |    case when (doc_id * 7 + i) % 23 = 0 then '.'
       |         when (doc_id * 13 + i) % 29 = 0 then ' {'
       |         when (doc_id * 11 + i) % 17 = 0 then '.'
       |         when (doc_id + i) % 4 != 0 then '.'
       |         else '' end))""".stripMargin
  }

  private val Dim = 64

  /** DuckDB left-fold cosine over [[Dim]] dims (the LlmQueries idiom —
    * same accumulation order as the native DotProduct expression). */
  private def dCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i] * $y[i]))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Planted URL per doc — 21 registrable domains (7 words × 3 TLDs,
    * one of them a two-level public suffix) with rotating subdomains;
    * shared by u1/u1b/web1. */
  private val urlPlantSpark =
    """concat('https://',
      |  case when element_at(array('www','blog','news',''), cast(doc_id % 4 as int) + 1) = ''
      |       then ''
      |       else concat(element_at(array('www','blog','news',''), cast(doc_id % 4 as int) + 1), '.') end,
      |  element_at(array('alpha','beta','gamma','delta','epsilon','zeta','eta'), cast(doc_id * 3 % 7 as int) + 1),
      |  '.', element_at(array('com','co.uk','org'), cast(doc_id % 3 as int) + 1),
      |  '/p/', cast(doc_id as string))""".stripMargin

  /** (doc_id, host, domain) over the planted URLs. */
  private def plantedDomains(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(urlPlantSpark).as("url"))
      .select(col("doc_id"), expr(Web.hostSql("url")).as("host"))
      .withColumn("domain", expr(Web.registrableDomainSql("host")))

  /** DuckDB twin of [[plantedDomains]]: CTEs `u`, `h`, `dm` ending in
    * dm(doc_id, host, domain). */
  private val dDomainsCte =
    """u AS (
      |  SELECT doc_id,
      |    list_extract(['www','blog','news',''], CAST(doc_id % 4 AS INTEGER) + 1) AS sub,
      |    list_extract(['alpha','beta','gamma','delta','epsilon','zeta','eta'], CAST(doc_id * 3 % 7 AS INTEGER) + 1) AS word,
      |    list_extract(['com','co.uk','org'], CAST(doc_id % 3 AS INTEGER) + 1) AS tld
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    regexp_extract('https://' ||
      |      (CASE WHEN sub = '' THEN '' ELSE sub || '.' END) ||
      |      word || '.' || tld || '/p/' || CAST(doc_id AS VARCHAR),
      |      'https?://([^/]+)', 1) AS host
      |  FROM u),
      |dm AS (
      |  SELECT doc_id, host,
      |    CASE WHEN array_to_string(list_slice(ls, len(ls) - 1, len(ls)), '.')
      |              IN ('co.uk', 'com.au', 'co.jp')
      |         THEN array_to_string(list_slice(ls, len(ls) - 2, len(ls)), '.')
      |         ELSE array_to_string(list_slice(ls, len(ls) - 1, len(ls)), '.') END AS domain
      |  FROM (SELECT doc_id, host, string_split(host, '.') AS ls FROM h))""".stripMargin

  /** u1b's persisted artifact: the capped corpus's domain membership
    * ([[Web.domainKeptIndex]]), memoized per sf dir with an eager
    * localCheckpoint — the d13/d15/d16 persisted-index pattern (one
    * untimed build via Q.setup; Verify stays correct without it). */
  private val u1Indexes =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def u1Index(s: SparkSession, d: String): DataFrame =
    QH.sessionMemo(u1Indexes, d, s)(identity) {
      Web.domainKeptIndex(plantedDomains(s, d), "doc_id", "domain", 20)
        .localCheckpoint(true)
    }

  /** Deterministic HTML shell around each doc (t15/web1): head/title,
    * style + script blocks with content, entities planted in the body. */
  private val htmlPlantSpark =
    """concat('<html><head><title>Doc ', cast(doc_id as string),
      |  '</title><style>p { color: red; }</style><script>var id = ',
      |  cast(doc_id as string), '; track(id);</script></head><body><h1>Doc ',
      |  cast(doc_id as string), '</h1><p>', replace(text, 'data', '&amp;'),
      |  '</p><div class="foot">powered &lt;by&gt; graft</div></body></html>')""".stripMargin

  /** DuckDB twin of the plant + extraction: CTEs `p`, `c` ending in
    * c(doc_id, n_html_chars, cl). */
  private val dHtmlCte =
    """p AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>p { color: red; }</style><script>var id = ' ||
      |    CAST(doc_id AS VARCHAR) || '; track(id);</script></head><body><h1>Doc ' ||
      |    CAST(doc_id AS VARCHAR) || '</h1><p>' || replace(text, 'data', '&amp;') ||
      |    '</p><div class="foot">powered &lt;by&gt; graft</div></body></html>' AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(length(h) AS BIGINT) AS n_html_chars,
      |    trim(regexp_replace(
      |      replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(h, '(?s)<script.*?</script>', ' ', 'g'),
      |            '(?s)<style.*?</style>', ' ', 'g'),
      |          '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
      |      ' +', ' ', 'g')) AS cl
      |  FROM p)""".stripMargin

  val all: Seq[Q] = Seq(

    // C4 cleaning battery (Raffel et al. 2020 §2.2): line-level retention
    // (terminal punctuation, >=5 words, no "javascript") and page-level
    // drops ("lorem ipsum", curly brace, <3 surviving lines) — the second
    // published rule battery alongside t12's Gopher gate. Zero shuffle:
    // one codegen'd projection; the corpus-level half of C4 (duplicate
    // three-sentence spans) is the d16 substring family.
    Q("t14_c4_rules",
      (s, d) => TextOps.c4Rules(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", c4PlantSpark)
        .orderBy("doc_id"),
      Some(
        """WITH lines AS (
          |  SELECT doc_id,
          |    list_transform(range(0, CAST(ceil(len(string_split(text, ' ')) / 10.0) AS BIGINT)),
          |      i -> (CASE WHEN (doc_id * 7 + i) % 23 = 0 THEN 'lorem ipsum '
          |                 WHEN (doc_id * 13 + i) % 29 = 0 THEN ''
          |                 WHEN (doc_id * 11 + i) % 17 = 0 THEN 'javascript '
          |                 ELSE '' END)
          |           || array_to_string(list_slice(string_split(text, ' '), i * 10 + 1, i * 10 + 10), ' ')
          |           || (CASE WHEN (doc_id * 7 + i) % 23 = 0 THEN '.'
          |                 WHEN (doc_id * 13 + i) % 29 = 0 THEN ' {'
          |                 WHEN (doc_id * 11 + i) % 17 = 0 THEN '.'
          |                 WHEN (doc_id + i) % 4 != 0 THEN '.'
          |                 ELSE '' END)) AS ls
          |  FROM documents),
          |k AS (
          |  SELECT doc_id, ls,
          |    list_filter(ls, l -> right(l, 1) = '.'
          |      AND len(string_split(l, ' ')) >= 5
          |      AND NOT contains(l, 'javascript')) AS ks
          |  FROM lines)
          |SELECT doc_id,
          |  CAST(len(ls) AS BIGINT) AS n_lines,
          |  CAST(len(ks) AS BIGINT) AS n_kept,
          |  len(list_filter(ls, l -> contains(l, 'lorem ipsum'))) > 0 AS has_lorem,
          |  len(list_filter(ls, l -> contains(l, '{'))) > 0 AS has_brace,
          |  (len(ks) >= 3
          |   AND len(list_filter(ls, l -> contains(l, 'lorem ipsum'))) = 0
          |   AND len(list_filter(ls, l -> contains(l, '{'))) = 0) AS page_keep,
          |  md5(COALESCE(array_to_string(ks, ' '), '')) AS clean_md5
          |FROM k ORDER BY doc_id""".stripMargin)),

    // Per-domain document caps (RefinedWeb, Penedo et al. 2023): planted
    // URLs → host via regexp → registrable domain via a public-suffix
    // table (two-level suffixes resolved to eTLD+1) → deterministic
    // md5-ranked cap of 20 docs per domain. 21 planted domains × ~24 docs
    // at sf0.01, so the cap genuinely trims. One shuffle (both window
    // specs share the domain partitioning).
    Q("u1_domain_caps",
      (s, d) => Web.domainCap(plantedDomains(s, d), "doc_id", "domain", cap = 20)
        .select("doc_id", "host", "domain", "domain_docs", "rk", "kept")
        .orderBy("doc_id"),
      Some(
        s"""WITH $dDomainsCte,
           |r AS (
           |  SELECT doc_id, host, domain,
           |    COUNT(*) OVER (PARTITION BY domain) AS domain_docs,
           |    row_number() OVER (PARTITION BY domain
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           |  FROM dm)
           |SELECT doc_id, host, domain, CAST(domain_docs AS BIGINT) AS domain_docs,
           |  CAST(rk AS BIGINT) AS rk, rk <= 20 AS kept
           |FROM r ORDER BY doc_id""".stripMargin)),

    // Incremental domain caps vs the persisted membership store — the
    // u-family joins the d11–d16 incremental pattern: the capped corpus's
    // kept (doc, domain) rows are the persisted artifact (built once,
    // untimed via setup); a new upload batch re-ranks ONLY itself and
    // consumes the store as per-domain counts (broadcast-sized — domains,
    // not docs). Arrival-order priority: earlier uploads hold their quota
    // (the d12 later-batches-demoted semantic, pinned == full-pass-with-
    // priority in WebSpec). Batch = every 5th doc re-uploaded under a new
    // id — half into its original (saturated) domain, which the store
    // demotes; half into a fresh `.net` mirror domain, which admits.
    Q("u1b_incremental_domain_caps",
      (s, d) => {
        val batch = plantedDomains(s, d).filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("bid"),
            expr("""if(doc_id % 2 = 0, domain,
                   |   concat(element_at(split(domain, '\\.'), 1), '.net'))""".stripMargin)
              .as("domain"))
        Web.incrementalDomainCap(u1Index(s, d), batch, "bid", "domain", cap = 20)
          .select("bid", "domain", "prior", "rk", "kept")
          .orderBy("bid")
      },
      Some(
        s"""WITH $dDomainsCte,
           |cr AS (
           |  SELECT doc_id, domain,
           |    row_number() OVER (PARTITION BY domain
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           |  FROM dm),
           |pr AS (
           |  SELECT domain, COUNT(CASE WHEN rk <= 20 THEN 1 END) AS prior
           |  FROM cr GROUP BY domain),
           |b AS (
           |  SELECT doc_id + 1000000 AS bid,
           |    CASE WHEN doc_id % 2 = 0 THEN domain
           |         ELSE string_split(domain, '.')[1] || '.net' END AS domain
           |  FROM dm WHERE doc_id % 5 = 0),
           |br AS (
           |  SELECT bid, domain,
           |    row_number() OVER (PARTITION BY domain
           |      ORDER BY md5(CAST(bid AS VARCHAR)), bid) AS rk
           |  FROM b)
           |SELECT bid, br.domain, CAST(COALESCE(pr.prior, 0) AS BIGINT) AS prior,
           |  CAST(br.rk AS BIGINT) AS rk,
           |  COALESCE(pr.prior, 0) + br.rk <= 20 AS kept
           |FROM br LEFT JOIN pr ON br.domain = pr.domain
           |ORDER BY bid""".stripMargin),
      setup = Some((s, d) => { u1Index(s, d); () })),

    // HTML→text extraction (the crawl pipeline's first real transform):
    // each doc is wrapped in a deterministic HTML shell (head/title,
    // style and script blocks with content, entities planted into the
    // body), then TextOps.htmlToTextSql strips blocks/tags, decodes
    // entities and collapses whitespace. Zero shuffle; the cleaned text
    // is proven by md5 (bytes, not re-rendered strings).
    Q("t15_html_extract",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"), expr(htmlPlantSpark).as("__h"))
          .select(col("doc_id"),
            length(col("__h")).cast("long").as("n_html_chars"),
            expr(TextOps.htmlToTextSql("__h")).as("__c"))
          .select(col("doc_id"), col("n_html_chars"),
            length(col("__c")).cast("long").as("n_clean_chars"),
            md5(col("__c")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $dHtmlCte
           |SELECT doc_id, n_html_chars,
           |  CAST(length(cl) AS BIGINT) AS n_clean_chars, md5(cl) AS clean_md5
           |FROM c ORDER BY doc_id""".stripMargin)),

    // Web-pipeline capstone: HTML extraction (t15) → model-based quality
    // filter on the EXTRACTED text (t13's hashed-linear inference) →
    // per-domain cap over the quality survivors (u1, cap 10 so it bites)
    // → one per-doc verdict. The crawl-to-corpus spine in one frame:
    // zero-shuffle extraction + scoring, then the one domain-window
    // shuffle; every stage replayed in the oracle below.
    Q("web1_pipeline_end_to_end",
      (s, d) => {
        val extracted = Tables.documents(s, d)
          .select(col("doc_id"), expr(htmlPlantSpark).as("__h"))
          .select(col("doc_id"), expr(TextOps.htmlToTextSql("__h")).as("__t"))
        val qual = TextOps.hashedLinearQuality(extracted, "doc_id", "__t",
          buckets = 4096, thresholdMilli = -105L)
        val dom = plantedDomains(s, d).select("doc_id", "domain")
        val capped = Web.domainCap(
            qual.filter(col("keep")).join(dom, Seq("doc_id")),
            "doc_id", "domain", cap = 10)
          .select(col("doc_id"), col("kept").as("__domain_kept"))
        qual.join(dom, Seq("doc_id"))
          .join(capped, Seq("doc_id"), "left")
          .select(col("doc_id"), col("domain"), col("n_grams"), col("score_sum"),
            col("keep").as("quality_keep"),
            coalesce(col("__domain_kept"), lit(false)).as("final_keep"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $dHtmlCte,
           |t AS (SELECT doc_id, string_split(cl, ' ') AS toks FROM c),
           |g AS (SELECT doc_id,
           |        list_concat(toks,
           |          list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
           |            i -> concat_ws(' ', toks[i], toks[i+1]))) AS grams
           |      FROM t),
           |sc AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
           |        CAST(list_sum(list_transform(grams, g ->
           |          ((('0x' || substr(md5('w:' || CAST((('0x' || substr(md5(g),1,15))::BIGINT) % 4096 AS VARCHAR)),1,15))::BIGINT) % 2001) - 1000)) AS BIGINT) AS score_sum
           |      FROM g),
           |q AS (SELECT doc_id, n_grams, score_sum,
           |        score_sum > -105 * n_grams AS quality_keep
           |      FROM sc),
           |$dDomainsCte,
           |k AS (SELECT q.doc_id, dm.domain FROM q JOIN dm USING (doc_id)
           |      WHERE q.quality_keep),
           |r AS (SELECT doc_id, domain,
           |        row_number() OVER (PARTITION BY domain
           |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           |      FROM k)
           |SELECT q.doc_id, dm.domain, q.n_grams, q.score_sum, q.quality_keep,
           |  COALESCE(r.rk <= 10, FALSE) AS final_keep
           |FROM q JOIN dm USING (doc_id) LEFT JOIN r ON q.doc_id = r.doc_id
           |ORDER BY q.doc_id""".stripMargin)),

    // Epoch-aware mixture upsampling: per-source weights in eighths
    // (md5-derived stand-ins for tuned mixture weights — swapping in real
    // weights changes the literal derivation only), full epochs replicate
    // every doc, the fractional remainder admits a deterministic
    // hash-gated subset (the samp1 gate applied per epoch). Each emitted
    // row carries its md5 interleave key and 8-way shard — the
    // deterministic "shuffled, weighted, sharded" training order, no
    // global sort. Explode is the only fan-out; no shuffle until the
    // export's own layout step.
    Q("samp4_epoch_upsample",
      (s, d) => {
        val w8 = s"(8 + ${TextOps.md5LongSql("source")} % 17)"
        val fracGate = TextOps.md5LongSql("concat(source, ':', cast(doc_id as string))")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .withColumn("__n", expr(
            s"$w8 div 8 + if($fracGate % 8 < $w8 % 8, 1, 0)"))
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(0, cast(__n as int) - 1)")).as("epoch"))
          .select(col("doc_id"), col("source"), col("epoch").cast("long").as("epoch"),
            md5(expr("concat(cast(epoch as string), ':', cast(doc_id as string))")).as("ord_key"))
          .withColumn("shard", expr(s"${TextOps.md5LongSql("ord_key")} % 8"))
          .orderBy("doc_id", "epoch")
      },
      Some(
        """WITH w AS (
          |  SELECT source,
          |    8 + (('0x' || substr(md5(source), 1, 15))::BIGINT % 17) AS w8
          |  FROM (SELECT DISTINCT source FROM documents)),
          |d AS (
          |  SELECT doc_id, dd.source,
          |    w8 // 8 + CASE WHEN (('0x' || substr(md5(dd.source || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8) < w8 % 8
          |              THEN 1 ELSE 0 END AS n_copies
          |  FROM documents dd JOIN w USING (source)),
          |e AS (
          |  SELECT doc_id, source, unnest(range(0, n_copies)) AS epoch FROM d),
          |o AS (
          |  SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch,
          |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS ord_key
          |  FROM e)
          |SELECT doc_id, source, epoch, ord_key,
          |  ('0x' || substr(md5(ord_key), 1, 15))::BIGINT % 8 AS shard
          |FROM o ORDER BY doc_id, epoch""".stripMargin)),

    // Embedding-space decontamination — the semantic sibling of d7/d9:
    // benchmark vectors (vec_id % 50 = 0) broadcast against the corpus;
    // planted contamination (every 7th corpus vector replaced by a
    // benchmark vector through a broadcast fetch) must flag at
    // tau = 0.999, organic vectors (max cross-sim 0.45 in this corpus)
    // must not. Corpus never shuffles; one map-side-combined max per cid.
    Q("d17_embedding_decontam",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        val bench = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("bid"), col("v").as("bvec"))
        val corpus = e.filter(col("vec_id") % 50 =!= 0)
          .withColumn("__pb", expr("if(vec_id % 7 = 3, (vec_id * 3 % 10) * 50, -1)"))
          .join(broadcast(bench.select(col("bid").as("__pbid"), col("bvec").as("__pbv"))),
            col("__pb") === col("__pbid"), "left")
          .select(col("vec_id").as("cid"), coalesce(col("__pbv"), col("v")).as("cvec"))
        Similarity.embeddingDecontaminate(corpus, bench, tauFp = 999000L)
          .orderBy("cid")
      },
      Some(
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |          FROM embeddings),
           |b AS (SELECT vec_id AS bid, v AS bv FROM e WHERE vec_id % 50 = 0),
           |c0 AS (SELECT vec_id AS cid, v,
           |         CASE WHEN vec_id % 7 = 3 THEN (vec_id * 3 % 10) * 50 ELSE -1 END AS pb
           |       FROM e WHERE vec_id % 50 <> 0),
           |c AS (SELECT cid, COALESCE(bv, v) AS cv
           |      FROM c0 LEFT JOIN b ON pb = bid),
           |s AS (SELECT cid, bid,
           |        CAST(floor((list_sum(list_transform(range(1, 65), i -> cv[i] * bv[i])) /
           |          (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))) *
           |           sqrt(list_sum(list_transform(range(1, 65), i -> bv[i] * bv[i]))))) * 1000000.0) AS BIGINT) AS sim_fp
           |      FROM c CROSS JOIN b)
           |SELECT cid, MAX(sim_fp) AS max_sim_fp,
           |  CAST(COUNT(CASE WHEN sim_fp >= 999000 THEN 1 END) AS BIGINT) AS n_contacts,
           |  MAX(sim_fp) >= 999000 AS contaminated
           |FROM s GROUP BY cid ORDER BY cid""".stripMargin)),


    // URL canonicalization dedup — the crawl-frontier dedup key BEFORE any
    // content hashing: fragment dropped, scheme+host lowercased, trailing
    // slash stripped, utm_* tracking params removed (other params kept in
    // order). Planted: every 3 consecutive docs share a resource; variant
    // 1 adds tracking params + fragment, variant 2 re-crawls with an
    // uppercased host + trailing slash; every 5th group's variant 1
    // carries a REAL param that must survive and stay distinct. One
    // shuffle, keyed on the canonical string (content-derived key space).
    Q("d18_url_dedup",
      (s, d) => {
        val urls = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("__g", expr("doc_id div 3"))
          .withColumn("url", expr(TextOps.letSql(
            """case when element_at(array('www','blog','news',''), cast(__g % 4 as int) + 1) = ''
              |     then concat(element_at(array('alpha','beta','gamma','delta','epsilon','zeta','eta'), cast(__g * 3 % 7 as int) + 1),
              |       '.', element_at(array('com','co.uk','org'), cast(__g % 3 as int) + 1))
              |     else concat(element_at(array('www','blog','news',''), cast(__g % 4 as int) + 1), '.',
              |       element_at(array('alpha','beta','gamma','delta','epsilon','zeta','eta'), cast(__g * 3 % 7 as int) + 1),
              |       '.', element_at(array('com','co.uk','org'), cast(__g % 3 as int) + 1)) end""".stripMargin, "hh") { hh =>
            s"""case when doc_id % 3 = 0 then concat('https://', $hh, '/p/', cast(__g as string))
               |     when doc_id % 3 = 1 then concat('https://', $hh, '/p/', cast(__g as string),
               |       if(__g % 5 = 0, '?page=2&utm_source=feed#top', '?utm_source=feed&utm_campaign=c#top'))
               |     else concat('HTTPS://', upper($hh), '/p/', cast(__g as string), '/?utm_medium=m') end""".stripMargin
          }))
        val canon = urls.withColumn("canon", expr(Web.canonicalizeUrlSql("url")))
          .select("doc_id", "url", "canon")
        val grp = canon.groupBy(col("canon"))
          .agg(min(col("doc_id")).as("kept_id"), count(lit(1)).as("n_variants"))
        canon.join(grp, Seq("canon"))
          .select(col("doc_id"), col("canon"), col("kept_id"), col("n_variants"),
            (col("doc_id") === col("kept_id")).as("is_canonical"))
          .orderBy("doc_id")
      },
      Some(
        """WITH g0 AS (SELECT doc_id, doc_id // 3 AS g FROM documents),
          |hp AS (SELECT doc_id, g,
          |    list_extract(['www','blog','news',''], CAST(g % 4 AS INTEGER) + 1) AS sub,
          |    list_extract(['alpha','beta','gamma','delta','epsilon','zeta','eta'], CAST(g * 3 % 7 AS INTEGER) + 1) AS word,
          |    list_extract(['com','co.uk','org'], CAST(g % 3 AS INTEGER) + 1) AS tld
          |  FROM g0),
          |hh AS (SELECT doc_id, g,
          |    CASE WHEN sub = '' THEN word || '.' || tld
          |         ELSE sub || '.' || word || '.' || tld END AS h
          |  FROM hp),
          |uu AS (SELECT doc_id,
          |    CASE WHEN doc_id % 3 = 0 THEN 'https://' || h || '/p/' || CAST(g AS VARCHAR)
          |         WHEN doc_id % 3 = 1 THEN 'https://' || h || '/p/' || CAST(g AS VARCHAR) ||
          |              CASE WHEN g % 5 = 0 THEN '?page=2&utm_source=feed#top'
          |                   ELSE '?utm_source=feed&utm_campaign=c#top' END
          |         ELSE 'HTTPS://' || upper(h) || '/p/' || CAST(g AS VARCHAR) || '/?utm_medium=m' END AS url
          |  FROM hh),
          |c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '', 'g') AS nf FROM uu),
          |c2 AS (SELECT doc_id, url,
          |    lower(regexp_extract(nf, '(?i)^(https?://[^/?]+)', 1)) ||
          |    regexp_replace(regexp_extract(nf, '(?i)^https?://[^/?]+([^?]*)', 1), '/+$', '', 'g') ||
          |    CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon
          |  FROM (SELECT doc_id, url, nf,
          |          COALESCE(array_to_string(list_filter(string_split(regexp_extract(nf, '\?(.*)$', 1), '&'),
          |            p -> p != '' AND NOT starts_with(p, 'utm_')), '&'), '') AS q2
          |        FROM c1)),
          |grp AS (SELECT canon, MIN(doc_id) AS kept_id, COUNT(*) AS n_variants
          |        FROM c2 GROUP BY canon)
          |SELECT c2.doc_id, c2.canon, grp.kept_id,
          |  CAST(grp.n_variants AS BIGINT) AS n_variants,
          |  c2.doc_id = grp.kept_id AS is_canonical
          |FROM c2 JOIN grp USING (canon) ORDER BY c2.doc_id""".stripMargin)),

    // Attribute-filtered IVF search (same-label retrieval — the filtered-
    // ANN production shape): identical cell-keyed probe join as s4 with
    // the label as an extra equi-constraint INSIDE the join, so k stays
    // full within the query's slice (post-filtering a plain top-k would
    // starve recall — the documented filtered-ANN failure mode).
    Q("s9_filtered_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"),
            col("label"))
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("v").as("centvec"))
        val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
          .select(col("vec_id").as("qid"), col("v").as("qvec"), col("label"))
        val c = e.select(col("vec_id").as("cid"), col("v").as("cvec"), col("label"))
        Similarity.ivfTopKFiltered(q, c, centroids, "label", k = 3, nProbe = 2)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               |            label
               |          FROM embeddings),
               |cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
               |ca AS (SELECT cid, cvec, clabel, cell FROM (
               |        SELECT e.vec_id AS cid, e.v AS cvec, e.label AS clabel, cent_id AS cell,
               |          row_number() OVER (PARTITION BY e.vec_id
               |            ORDER BY ${dCos("e.v", "cv")} DESC, cent_id) AS rn
               |        FROM e CROSS JOIN cent) WHERE rn = 1),
               |qp AS (SELECT qid, qvec, qlabel, cell FROM (
               |        SELECT e.vec_id AS qid, e.v AS qvec, e.label AS qlabel, cent_id AS cell,
               |          row_number() OVER (PARTITION BY e.vec_id
               |            ORDER BY ${dCos("e.v", "cv")} DESC, cent_id) AS rn
               |        FROM e CROSS JOIN cent
               |        WHERE e.vec_id >= 100 AND e.vec_id < 120) WHERE rn <= 2),
               |cand AS (SELECT DISTINCT qid, qvec, cid, cvec
               |         FROM ca JOIN qp USING (cell)
               |         WHERE qid <> cid AND clabel = qlabel),
               |sc AS (SELECT qid, cid, ${dCos("qvec", "cvec")} AS sim FROM cand),
               |r AS (SELECT qid, cid, sim,
               |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |      FROM sc)
               |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, CAST(floor(sim * 100000.0) AS BIGINT) AS sim_fp
               |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin))

  )
}
