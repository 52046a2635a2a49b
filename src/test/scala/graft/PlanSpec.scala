package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Physical-plan audits: the scale properties the engine is designed around
  * must be visible in the executed plans, not just intended.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Reused)Exchange".r.findAllIn(plan(df)).length

  test("date filter pushes down to the parquet scan (W4 early-stop)") {
    val df = Tables.lineitem(spark, sf()).filter(col("l_shipdate") >= lit("2001-01-01"))
    val p = plan(df)
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"no pushed date filter in:\n$p")
  }

  test("projection prunes the parquet read schema") {
    val df = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projection in:\n$p")
  }

  test("dimension joins broadcast (J1)") {
    val df = Tables.customer(spark, sf())
      .join(broadcast(Tables.nation(spark, sf())), col("c_nationkey") === col("n_nationkey"))
    assert(plan(df).contains("BroadcastHashJoin"), plan(df))
  }

  test("conditional-count pivot is a single shuffle (A5)") {
    val ev = Tables.events(spark, sf())
    val agg = Relational.conditionalCountPivot(ev, Seq("user_id"), "event_type",
      Seq("click", "view"), "nb")
    assert(countExchanges(agg) == 1, plan(agg))
  }

  test("as-of join is a single shuffle (J12)") {
    val ev = Tables.events(spark, sf())
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts_us_long")
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us_long"), col("event_id").as("sig_id"))
    val j = Relational.asOfJoin(p, s, "user_id", "ts_us_long", Seq("sig_id"))
    assert(countExchanges(j) == 1, plan(j))
  }

  test("blocked LSH candidate join shuffles on (block, band, hash), never the block key alone (d4)") {
    val docs = Tables.documents(spark, sf())
      .select(col("source"), col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("toks"))
    val pairs = graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "toks", w = 2, blockCols = Seq("source"))
    val p = plan(pairs)
    // the candidate join must key on (source, band_idx, band hash) — a key
    // whose cardinality grows with data; a join keyed on source alone is the
    // quadratic per-block anti-pattern (20 distinct values at every scale)
    assert("Join \\[source#\\d+, band_idx#\\d+, bh#\\d+\\]".r
      .findFirstIn(p).isDefined, p)
    assert("Join \\[source#\\d+\\], \\[source#\\d+\\]".r.findFirstIn(p).isEmpty, p)
  }

  test("semdedup pair join keys on cid and shuffles ids only (d14)") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val r = graft.operators.Similarity.semDedupRemovedPinned(
      e, "vid", "v", threshold = 0.85, k = 4, iters = 1)
    val p = plan(r)
    // candidate join on the cluster id (k grows with the corpus via
    // semDedupKFor; the catalog query pins it only for oracle replay)
    assert("SortMergeJoin \\[cid#\\d+\\], \\[cid#\\d+\\]".r.findFirstIn(p).isDefined, p)
    // the cid exchanges must carry (cid, id) alone — vector payloads
    // re-attach by id AFTER pair generation, never ride the cid shuffle
    val cidExchangeInputs = "Exchange hashpartitioning\\(cid#\\d+[^\\n]*\\n[^\\n]*".r
      .findAllIn(p).toSeq
    assert(cidExchangeInputs.nonEmpty, p)
    // payload columns are __v# / __va# / __vb# (NOT __vid#, the id)
    cidExchangeInputs.foreach(x =>
      assert("__v[ab]?#".r.findFirstIn(x).isEmpty, x))
  }

  test("incremental semdedup never shuffles the vector index (d15)") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val (cents, idx) = graft.operators.Similarity.semClusterIndex(
      e, "vid", "v", k = 4, iters = 1)
    val batch = e.filter(col("vid") % 7 === 0)
      .select((col("vid") + 100000).as("vid"), col("v"))
    val r = graft.operators.Similarity.incrementalSemDedup(
      batch, cents, idx, "vid", "v", threshold = 0.85)
    val p = plan(r)
    // both candidate legs broadcast the batch side onto a streamed scan —
    // the corpus-sized index must never hash-partition on the cluster id
    assert("BroadcastHashJoin \\[cid#\\d+\\]".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("Exchange hashpartitioning(cid"), p)
  }

  test("salted join keys on (key, salt), spreading the hot key (j15)") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "source", "n_chars")
    val dim = docs.groupBy("source").agg(count(lit(1)).as("src_docs"))
    val j = Relational.saltedJoin(docs, dim, "source", col("doc_id"), nSalts = 8)
    val p = plan(j)
    assert("Join \\[source#\\d+, __salt#\\d+\\]".r.findFirstIn(p).isDefined, p)
  }

  test("metrics DAG base spine pushes event_type filters to the parquet scan") {
    // deriveBase checkpoints the shared pre-aggregated spine (one events
    // pass for all 9 facts — r16 opt), so the pushdown is visible on the
    // UNMATERIALIZED spine, not on a fact's post-checkpoint plan
    val p = plan(graft.pipelines.MetricsViews.baseSpine(spark, sf()))
    assert(p.contains("PushedFilters") && p.contains("In(event_type"), p)
    // and the facts read the materialized spine, not events again
    val base = graft.pipelines.MetricsViews.deriveBase(spark, sf())
    val pf = plan(base.visitsDatasets)
    assert(!pf.contains("Scan parquet"), pf)
  }

  test("metrics DAG aggregates are partial (map-side combine) before every shuffle") {
    val base = graft.pipelines.MetricsViews.deriveBase(spark, sf())
    val views = graft.pipelines.MetricsViews.compose(base)
    val p = plan(views("metrics_organizations"))
    // every sum feeding a left join aggregates before the exchange
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    // no exchange keyed on a constant (single-partition collapse) except the
    // driver-side sort at the very top would be rangepartitioning — fine
    assert(!p.contains("SinglePartition"), p)
  }

  test("paragraph-count aggregation is partial before the shuffle (d8)") {
    import spark.implicits._
    val docs = Seq((1L, Seq("a", "b")), (2L, Seq("b", "c"))).toDF("id", "paras")
    val out = graft.operators.Dedup.paragraphDedup(docs, "id", "paras", 3L)
    val p = plan(out)
    // a billion-copy boilerplate paragraph must partial-aggregate map-side
    assert("partial_count".r.findAllIn(p).nonEmpty, s"no partial agg in:\n$p")
  }

  test("wide-simhash candidate join keys on (band index, band bits), carrying only longs (d3c)") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
    val out = graft.operators.Dedup.simhashNearDupPairsWide(docs, "doc_id", "toks")
    val p = plan(out)
    // the candidate join must key on (band index, band bits) — cardinality
    // grows with data — and its inputs carry only (id, hi, lo, j, band)
    // longs, never token arrays (at sf0.001 AQE may broadcast one side;
    // the join KEY is the scale property being pinned)
    assert("Join \\[j#\\d+, band#\\d+L?\\]".r.findFirstIn(p).isDefined, p)
    // and never on doc id or a constant-cardinality key alone
    assert("Join \\[doc_id#\\d+L?\\]".r.findFirstIn(p).isEmpty, p)
  }

  test("whole-stage codegen covers the scan-filter-project spine") {
    val df = Tables.lineitem(spark, sf())
      .filter(col("l_quantity") > 10)
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen stage n
    val p = plan(df)
    assert(p.contains("*(1) Project") && p.contains("*(1) Filter"), p)
  }

  test("bloom prefilter survives into the physical plan before the confirm join (d9)") {
    import graft.operators.{Dedup, TextOps}
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shinglesExpr("toks", 4).as("sh"))
    val grams = docs.select(col("doc_id"), explode(col("sh")).as("gram"))
    val bench = grams.filter(col("doc_id") % 37 === 0).select("gram")
    val out = Dedup.bloomDecontaminate(
      grams.filter(col("doc_id") % 37 =!= 0), bench, "doc_id", "gram")
    val p = plan(out)
    // the codegen'd membership test must not be optimized away — it is the
    // operator's whole point (pre-shuffle pruning of the big side)
    assert(p.contains("might_contain"), p.take(3000))
  }

  test("bucketed tables equi-join with ZERO exchanges (co-located join)") {
    import graft.sources.Writers
    // the warehouse dir outlives the in-memory catalog: saveAsTable refuses
    // an orphaned location from a previous JVM, so clear it first
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        val walk = java.nio.file.Files.walk(dir.toPath)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
      }
    }
    Writers.bucketedTable(
      Tables.orders(spark, sf()).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8, Seq("o_orderkey"))
    Writers.bucketedTable(
      Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"),
        s"bucketed join must read co-located buckets, not shuffle:\n${p.take(3000)}")
      assert(p.contains("Bucketed: true"), p.take(3000))
      // and the result is actually correct, not just well-planned
      val n = j.count()
      val ref = Tables.orders(spark, sf()).join(Tables.lineitem(spark, sf()),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(n == ref)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("corpus layout: bounded files per partition dir, scan prunes at planning time") {
    import graft.sources.Writers
    val root = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val docs = Tables.documents(spark, sf())
    Writers.corpusLayout(docs, root, Seq("lang"), filesPerPartition = 2)
    // file-count bound: exactly filesPerPartition data files per lang dir,
    // however many tasks wrote the corpus (the anti-small-files contract)
    val langDirs = new java.io.File(root).listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.length == 5, langDirs.map(_.getName).mkString(", "))
    langDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"${dir.getName}: ${files.length} files")
      assert(files.nonEmpty, s"${dir.getName} is empty")
    }
    // planning-time pruning: the lang predicate lands in PartitionFilters
    // (directory pruning) and is NOT a data filter pushed into the files
    val pruned = spark.read.parquet(root).filter(col("lang") === "fr")
    val p = plan(pruned)
    assert(p.contains("PartitionFilters:") && p.contains("(lang"),
      s"lang filter did not become a partition filter:\n${p.take(2000)}")
    // the scan touches ONLY lang=fr files: 2 of the 10 on disk
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata.get("Location").forall(_.contains(root)))
    pruned.collect() // populate metrics
    val numFiles = scans.head.metrics("numFiles").value
    assert(numFiles <= 2, s"pruned scan read $numFiles files, want <= 2")
    // and the pruned read is the right answer
    assert(pruned.count() == docs.filter(col("lang") === "fr").count())
  }

  test("incremental CC never shuffles the label table (d13)") {
    import graft.operators.Dedup
    import spark.implicits._
    val oldPairs = Seq((10L, 12L), (20L, 22L), (30L, 31L)).toDF("id1", "id2")
    val newPairs = Seq((12L, 22L), (99L, 31L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(oldPairs, "id1", "id2")
    val out = Dedup.incrementalConnectedComponents(labels, newPairs, "id1", "id2")
    val p = plan(out)
    // every label-side join is an explicit broadcast: a SortMergeJoin here
    // would mean the corpus-sized table got shuffled
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p.take(3000))
  }

  test("scalable sessionize has no window over the data rows (w1b)") {
    import spark.implicits._
    val df = (0 until 200).map(i => (s"u${i % 3}", i.toLong, i.toLong))
      .toDF("user", "ts", "id")
    val (out, cleanup) = Relational.sessionizeScalableBuild(
      df, "user", "ts", "id", gap = 10L)
    try {
      // the only window runs over the (pid, key) SUMMARY aggregate (≤ P
      // rows per key), never the data: exactly one Window node, its spec
      // partitioned by the key, and an aggregate in its subtree (printed
      // below it) — AQE hides the exec nodes pre-execution, so pin on the
      // printed tree
      val p = plan(out)
      assert("Window \\[".r.findAllIn(p).length == 1, p.take(3000))
      val wIdx = p.indexOf("Window [")
      assert(p.indexOf("windowspecdefinition(user", wIdx) >= 0, p.take(3000))
      assert(p.indexOf("HashAggregate", wIdx) >= 0,
        s"window runs over raw data, not the summary:\n${p.take(3000)}")
    } finally cleanup()
  }

  test("piiRedact evaluates the redaction chain once (t9)") {
    val df = Tables.documents(spark, sf()).select("doc_id", "text")
    val red = graft.operators.TextOps.piiRedact(df, "doc_id", "text")
    val p = plan(red)
    // red_len and red_sha both read the 3-pass regexp_replace chain; if
    // CollapseProject inlined it per reference the plan would carry 6
    // replaces — the non-cheap-duplication guard must keep it at 3
    val n = "regexp_replace".r.findAllIn(p).length
    assert(n == 3, s"redaction chain duplicated ($n occurrences):\n${p.take(3000)}")
  }

  test("substring-dedup duplicate test shuffles on the window value (d16)") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val out = graft.operators.Dedup.substringDedupSpans(docs, "doc_id", "text", 40)
    val p = plan(out)
    // the duplicate test must key its one corpus-wide exchange on the
    // window VALUE — a content-derived key space that grows with the
    // corpus; any fixed-cardinality key here would be the hidden-quadratic
    // anti-pattern (the repo bucketed-similarity invariant)
    assert("hashpartitioning\\(__win".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("incremental substring probe joins on the window value (d16b)") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val index = graft.operators.Dedup.substringWindowIndex(corpus, "text", 40)
    val out = graft.operators.Dedup.incrementalSubstringSpans(
      batch, index, "doc_id", "text", 40)
    val p = plan(out)
    // the index probe is an equi-join keyed on the window value; the
    // corpus appears ONLY through its distinct-window index (one scan
    // under an aggregate), never as a second text scan
    assert("Join \\[__win#\\d+\\], \\[__win#\\d+\\]".r.findFirstIn(p).isDefined,
      p.take(3000))
  }

  test("k-means assignment broadcasts the k centroid rows (s5)") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    // the trained frame is localCheckpoint'ed (lineage deliberately cut), so
    // pin the assignment plan through assignClusters, which shares assignStep
    val centroids = Similarity.kmeansLloyd(e, "vid", "v", k = 4, iters = 1)
    val out = Similarity.assignClusters(e, centroids, "vid", "v")
    val p = plan(out)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // and the argmin must be a partial-agg min_by, not a window sort
    assert(p.contains("partial_min_by") || p.contains("partial_min") ||
      p.contains("HashAggregate"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("embedding decontamination broadcasts the benchmark; one shuffle for the per-doc max (d17)") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val bench = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("bid"), col("v").as("bvec"))
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("cid"), col("v").as("cvec"))
    val out = Similarity.embeddingDecontaminate(corpus, bench, 999000L)
    val p = plan(out)
    // the benchmark rides a broadcast; corpus payloads never shuffle —
    // the only SHUFFLE exchange carries the map-side-combined (cid, max)
    // rows (the broadcast's own BroadcastExchange is not a shuffle)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(3000))
    assert(p.contains("partial_max"), p.take(3000))
  }

  test("incremental domain cap ships the store as broadcast COUNTS, not rows (u1b)") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source").as("domain"))
    val index = graft.operators.Web.domainKeptIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "domain", 10)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val out = graft.operators.Web.incrementalDomainCap(
      index, batch, "doc_id", "domain", 10)
    val p = plan(out)
    // the store reaches the batch only through an aggregate feeding a
    // broadcast join — its rows never co-shuffle with the batch
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("dyadic register build is ONE shuffle; range count filters, never scans (sk5)") {
    val fx = Tables.events(spark, sf())
      .select(lit("g").as("g"), floor(col("value") * lit(128)).cast("long").as("v"))
    val reg = graft.operators.Sketches.dyadicRegister(fx, Seq("g"), "v")
    // the 17-level explode collapses map-side into the single (group, key)
    // aggregation — the register never costs more than one exchange
    assert(countExchanges(reg) == 1, plan(reg))
    val rc = graft.operators.Sketches.dyadicRangeCount(reg, Seq("g"), 12800L, 31999L)
    // the cover is a planning-time constant: the register is FILTERED on
    // literal keys before the final aggregation — In-filter present,
    // still just the register's own shuffle + the tiny count's
    assert(plan(rc).contains("key#") && plan(rc).contains(" IN "), plan(rc))
  }

  test("triangle listing joins are all equi — no cartesian/nested-loop (g3)") {
    import spark.implicits._
    val edges = (for { a <- 0L until 40L; b <- a + 1 until 40L
      if graft.operators.DetHash.md5Long(s"pe:$a:$b") % 4 == 0 } yield (a, b))
      .toDF("a", "b")
    val p = plan(graft.operators.Graph.triangles(edges, "a", "b"))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("symmetric SymSpell join keys on the deletion-neighborhood string (fz/er1)") {
    import spark.implicits._
    val recs = (0L until 50L).map(i => (i, s"name$i")).toDF("id", "s")
    val p = plan(graft.operators.Fuzzy.symmetricSelfJoin(recs, "id", "s"))
    // candidate generation must be an equi-join on __k — content-derived,
    // grows with the corpus; all-pairs never exists
    assert("Join \\[__k#\\d+\\], \\[__k#\\d+\\]".r.findFirstIn(p).isDefined ||
      "Join.*\\[__k#\\d+\\]".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("prefix Jaccard join keys candidates on the element value (d19)") {
    import spark.implicits._
    val recs = (0L until 40L)
      .map(i => (i, (0 until 10).map(j => s"e${(i * 7 + j) % 60}")))
      .toDF("id", "toks")
    val p = plan(graft.operators.Dedup.prefixJaccardSelfJoin(recs, "id", "toks", 500000L))
    // candidate generation must be an equi-join on __k — a content-derived
    // key space that grows with the corpus; all-pairs never exists
    assert("Join.*\\[__k#\\d+\\]".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("grouping sets expand map-side into ONE shuffle (a19)") {
    val agg = Tables.lineitem(spark, sf())
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    // all four grains ride one Expand + one exchange — never one
    // aggregation pass per grain
    assert(countExchanges(agg) == 1, plan(agg))
    assert(plan(agg).contains("Expand"), plan(agg))
  }

  test("k-core round joins are all equi — no cartesian/nested-loop (g4)") {
    import spark.implicits._
    val edges = (for { a <- 0L until 30L; b <- a + 1 until 30L
      if graft.operators.DetHash.md5Long(s"kc:$a:$b") % 3 == 0 } yield (a, b))
      .toDF("a", "b")
    val p = plan(graft.operators.Graph.kcorePeel(edges, "a", "b", 2, 3))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("overlap counts broadcast the day-domain cumulative table (fn6)") {
    import spark.implicits._
    val iv = (0L until 200L).map(i => (i, i % 50, i % 50 + i % 7))
      .toDF("id", "s", "e")
    val days = iv.select(col("s").as("d"), lit(1L).as("ns"), lit(0L).as("ne"))
      .unionByName(iv.select(col("e").as("d"), lit(0L).as("ns"), lit(1L).as("ne")))
      .groupBy("d").agg(sum("ns").as("n_starts"), sum("ne").as("n_ends"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(Long.MinValue, 0)
    val cum = days.withColumn("cum_s", sum("n_starts").over(wCum))
      .withColumn("cum_e", sum("n_ends").over(wCum))
    val ov = iv
      .join(broadcast(cum.select(col("d").as("e"), col("cum_s"))), Seq("e"))
      .join(broadcast(cum.select(col("d").as("s"), col("cum_e"), col("n_ends"))), Seq("s"))
    val p = plan(ov)
    // the interval-sized side never shuffles for these joins: both prefix
    // lookups ride broadcasts of the calendar-bounded cumulative table
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p.take(3000))
  }

  test("hamming scan broadcasts the query signatures; corpus never shuffles before the cut (s10)") {
    import spark.implicits._
    val vecs = (0L until 200L)
      .map(i => (i, (0 until 64).map(j =>
        ((i * 31 + j * 7) % 13).toDouble - 6.0)))
      .toDF("vec_id", "v")
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val c = vecs.select(col("vec_id").as("cid"), col("v").as("cvec"))
    val p = plan(graft.operators.Similarity.hammingTopK(q, c, 3, 10))
    // the exhaustive first pass is a broadcast of the (small) query
    // signatures over the corpus scan — no corpus-wide shuffle exists
    // before the per-query top-R cut, and no join is ever nested-loop
    // on the full-width vectors (the only BNLJ is the signature
    // broadcast itself)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("hammingwords") || p.contains("HammingWords") ||
      p.contains("signpack") || p.contains("SignPack"), p.take(3000))
  }

  test("scalable RFM has no window over the customer frame (fn8b)") {
    // fn8 ranks with three global NTILE windows; its scalable sibling
    // must show ZERO Window nodes — scores ride the broadcast cut-key
    // branch chain, boundaries come from RangeShard's selection
    val cust = Tables.orders(spark, sf())
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("freq"))
      .withColumn("fk", expr("freq * 100000000L + o_custkey"))
    val (_, cutsF) = graft.operators.RangeShard.cuts(cust, "fk", 5)
    val scored = cust
      .withColumn("f_score",
        graft.operators.RangeShard.shardCol(col("fk"), cutsF) + lit(1))
      .groupBy("f_score").agg(count(lit(1)).as("n"))
    val p = plan(scored)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("containment join keys candidates on the element value (d20)") {
    import spark.implicits._
    val recs = (0L until 40L)
      .map(i => (i, (0 until 10).map(j => s"e${(i * 7 + j) % 60}")))
      .toDF("id", "toks")
    val p = plan(graft.operators.Dedup.containmentSelfJoin(recs, "id", "toks", 800000L))
    // candidate generation must be an equi-join on __k — a content-derived
    // key space that grows with the corpus; all-ordered-pairs never exists
    assert("Join.*\\[__k#\\d+\\]".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("multi-probe LSH broadcasts the probe rows; buckets are the fused kernel (s11)") {
    // parquet-backed input — a local literal relation constant-folds the
    // bucketing expression away at planning time
    val vecs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val c = vecs.select(col("vec_id").as("cid"), col("v").as("cvec"))
    val p = plan(graft.operators.Similarity.multiProbeTopKPinned(q, c, 1,
      nPlanes = 4, dim = 64, nTables = 2))
    // the probe expansion lives on the broadcast QUERY side; the corpus
    // bucket rows join by hash, and bucketing is the fused native kernel
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.toLowerCase.contains("lshbuckets"), p.take(3000))
  }

  test("seed-anchored link prediction broadcasts the seed frame (g5)") {
    import spark.implicits._
    val edges = (for (a <- 0L until 30L; b <- 0L until 30L
                      if a < b && (a * 31 + b) % 3 == 0) yield (a, b))
      .toDF("p1", "p2")
    val seeds = Seq(0L, 5L).toDF("q")
    val p = plan(graft.operators.Graph.relatedBySharedNeighbors(
      edges, "p1", "p2", seeds, k = 3))
    // the wedge probe is anchored: the seed frame broadcasts onto the
    // neighbor rows; nothing all-pairs exists anywhere in the plan
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("image stats and resize are single-pass — zero exchanges (m8/m10)") {
    import spark.implicits._
    val meta = (0L until 6L).map(i => (i, i, false)).toDF("media_id", "seed", "noise")
    val media = graft.operators.Images.synthPngCorpus(meta, "media_id", "seed", "noise")
    assert(countExchanges(graft.operators.Images.imageStats(media, "media_id", "image")) == 0)
    assert(countExchanges(graft.operators.Images.blockSumGrid(media, "media_id", "image")) == 0)
  }

  test("RRF fusion never touches a corpus-sized frame (ir4 fuse stage)") {
    import spark.implicits._
    val legA = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val legB = Seq((0L, 11L, 1L)).toDF("query_id", "doc_id", "rank")
    val p = plan(graft.operators.Ir.rrfFuse(Seq(legA, legB), k = 3))
    // one union of per-query top-K legs, one keyed aggregate, one window —
    // no join at all (the legs carry everything the fuse needs)
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("repetition signals are a zero-exchange projection (t11 kernel)") {
    val docs = Tables.documents(spark, sf())
    val df = graft.operators.TextOps.repetitionSignals(
      docs, "doc_id", "text", "n_chars")
    assert(countExchanges(df) == 0, plan(df).take(3000))
    assert(plan(df).contains("repsignals"), plan(df).take(3000))
  }

  test("d19/d20 shingle input is the native kernel, not interpreted HOFs") {
    // the r12 5.8 s finding: two nested CodegenFallback ArrayTransforms
    // (md5-hex + conv per gram) in the hot input projection. The pin is on
    // the projection that feeds the prefix join.
    val docs = Tables.documents(spark, sf())
      .withColumn("__toks", graft.functions.MinhashBands.shingleHashes(
        split(col("text"), " "), 3))
      .select(col("doc_id"), col("__toks"))
    val p = plan(docs)
    assert(p.contains("shinglehashes"), p.take(2000))
    assert(!p.contains("transform("), p.take(2000))
  }

  test("deletionJoin runs no edit-distance at all (fz1)") {
    import spark.implicits._
    val refs = Seq((1L, "abc"), (2L, "abcd")).toDF("rid", "name")
    val probes = Seq((10L, "ab")).toDF("pid", "pname")
    val p = plan(graft.operators.Fuzzy.deletionJoin(
      probes, "pid", "pname", refs, "rid", "name"))
    // candidates ARE the result (probe == variant ⇒ lev exactly 1): the
    // plan must contain no levenshtein evaluation anywhere
    assert(!p.toLowerCase.contains("levenshtein"), p.take(3000))
  }

  test("d22 matches ride a broadcast semi-join; training windows never shuffle pre-match") {
    // the query checkpoints the matched frame (so its count/coverage
    // branches share one kernel pass), which hides the join from the final
    // plan — pin the MATCHED stage's own plan via the SAME builder the
    // query calls, so the pin can never drift from the shipped query
    val p = plan(graft.queries.LlmQueries.d22Matched(spark, sf()))
    // the eval window-hash set is the broadcast side of a LeftSemi
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!plan(graft.SparkEntry.queries("d22_contamination_coverage")(spark, sf()))
      .contains("CartesianProduct"))
  }

  test("samp7 weight table broadcasts back onto the feature stream") {
    val p = plan(graft.SparkEntry.queries("samp7_dsir_selection")(spark, sf()))
    // bounded 16384-row weight table -> BroadcastHashJoin on the bucket id;
    // the 1-row totals crossJoin is the only nested-loop and builds a
    // broadcast scalar
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("ir6 broadcasts the query token bag; candidate tokens stream unshuffled into the dots") {
    val p = plan(graft.SparkEntry.queries("ir6_maxsim_topk")(spark, sf()))
    // qid =!= cid over a broadcast 160-row side is the intended
    // BroadcastNestedLoopJoin; the corpus side must never sort-merge
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("geo2 is the aggregation exchanges plus the output sort — no join, no extra pass") {
    val q = graft.SparkEntry.queries("geo2_geohash_cells")(spark, sf())
    // count-distinct expands to (gh, user) partial + gh final -> 2 data
    // exchanges + 1 range exchange for the ORDER BY, nothing else; the
    // interleave/base32 math is a pure projection (no Join node at all)
    assert(countExchanges(q) <= 3, plan(q))
    assert(!plan(q).contains("Join"), plan(q).take(2000))
  }

  test("er2 candidates are an equi-join on the soundex block key") {
    val p = plan(graft.SparkEntry.queries("er2_soundex_blocking")(spark, sf()))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("sk3's exact legs never Expand — one min-day pass feeds both slices (r12 verdict)") {
    val p = plan(graft.SparkEntry.queries("sk3_hll_cube")(spark, sf()))
    // two sibling countDistinct aggregates would plan an Expand (each value
    // shuffled once per distinct leg); the per-(type, value) min-day fold
    // must keep the plan Expand-free, and every join here is tiny-per-type
    // (broadcast), never a data-sized sort-merge
    assert(!p.contains("Expand"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("log1's catalog join broadcasts; the pivot is the only data-sized shuffle path") {
    val p = plan(graft.SparkEntry.queries("log1_end_to_end")(spark, sf()))
    // the slug->id catalog is a dim table: BroadcastHashJoin, never a
    // sort-merge of the daily metrics against it
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("cons1 is the dedup shuffle plus the output sort — no join anywhere") {
    val q = graft.SparkEntry.queries("cons1_end_to_end")(spark, sf())
    // project-to-schema + required-drop + union are projection/filter work;
    // the keep-most-recent window is the ONE key-space exchange, the ORDER
    // BY adds the range exchange, and nothing joins
    assert(countExchanges(q) == 2, plan(q))
    assert(!plan(q).contains("Join"), plan(q).take(2000))
  }

  test("k-core wave decrement under broadcastWaves never exchanges the incidence frame") {
    // g4's opt-in: without the explicit broadcast AQE still converts the
    // join at runtime, but only after the planned exchange's map stage has
    // materialized — the resident incidence frame is written to shuffle
    // storage every peel round (PLANS r15 s6). With the hint the STATIC
    // plan is already the broadcast join: the only shuffle is the dst
    // aggregation's, and it carries the (shrinking) decrement rows, never
    // the incidence frame.
    val nbr = spark.range(100)
      .select(col("id").as("n"), (col("id") + 1).as("z")).localCheckpoint(true)
    val deg = nbr.groupBy("n").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val removed = deg.filter(col("deg") < 75).select("n")
    val dec = nbr.join(broadcast(removed), "n")
      .groupBy(col("z").as("n")).agg(count(lit(1)).as("__d"))
    val p = plan(dec)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert("Exchange hashpartitioning\\(n#".r.findAllIn(p).isEmpty,
      s"incidence frame re-exchanged:\n${p.take(2000)}")
  }

  test("t20's dictionary scan is a zero-exchange pruned projection (AcScan kernel)") {
    // the scan phase: dictionary as kernel data, never a join or an
    // unrolled per-term expression — one codegen'd projection over a
    // two-column read
    val df = Tables.documents(spark, sf())
      .select(col("doc_id"),
        graft.functions.AcDistinctHits.distinctHits(col("text"),
          Seq("fast table", "agg", "row scan")).as("n"))
    val p = plan(df)
    assert(countExchanges(df) == 0, p.take(2000))
    assert(p.contains("acdistincthits"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(2000))
  }
}
