package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is materialized with a noop-format write: every operator
  * executes end-to-end (unlike count(), which lets Catalyst prune the
  * projection for scan-shaped plans) without paying sink I/O.
  *
  * Noise protocol: each query runs SPARK_GRAFT_RUNS times (default 3) and
  * the recorded number is the per-query MEDIAN — this host has measured
  * 217-397 s catalog totals on identical code (r12 close-out), so a
  * single-shot artifact lets host drift masquerade as a regression. The
  * median also absorbs the one query-specific codegen-JIT cold run that a
  * single pass lands on whichever query comes first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ~100 sequential queries in one driver: ContextCleaner only reclaims
      // shuffle files / broadcasts when the driver GCs, which a large heap
      // rarely does — stale state then stalls arbitrary later queries. A 30s
      // GC timer fixed that in round 2 but landed full-GC pauses INSIDE
      // timed queries (up to 200% per-query spread across runs), so the GC
      // now runs explicitly between queries — outside the timed window —
      // and the timer is only a long-stop fallback.
      .config("spark.cleaner.periodicGC.interval", "30min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM / codegen / parquet reader paths so the first timed
    // query doesn't absorb one-time startup cost. The group/agg/median/sort
    // warmup matters: without it the alphabetically-first a* aggregates
    // absorbed ~30s of JIT/classloading on a cold JVM (3-run measurement).
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(200000)
      .selectExpr("id % 97 AS k", "cast(id as double) AS v")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("sum(v)"),
        org.apache.spark.sql.functions.expr("avg(v)"),
        org.apache.spark.sql.functions.expr("median(v)"),
        org.apache.spark.sql.functions.expr("count(distinct v)"))
      .orderBy("k").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Also warm the exact shape every timed query takes: parquet vectorized
    // scan -> shuffle agg -> sort -> noop-format write. The range-based
    // warmups above never touch the parquet reader codegen, the shuffle
    // writer init, or the noop DataSource lookup (a ServiceLoader scan over
    // every jar on the classpath), so the alphabetically-first catalog query
    // absorbed them all (r4 driver run: a10 5.4s in-catalog vs 1.0s locally).
    spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.expr("min(c_custkey) AS k"),
        org.apache.spark.sql.functions.expr("count(1) AS cnt"))
      .orderBy("c_mktsegment")
      .write.format("noop").mode("overwrite").save()
    // Touch the text/vector tables too: in a RESTRICTED run
    // (SPARK_GRAFT_ONLY) the alphabetically-first d*/s* query otherwise
    // absorbs the first documents/embeddings scan + string-kernel codegen
    // (r6 isolated-run probe: d7 swung 4.8-14.7 s as first-in-set).
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("count(distinct substring(text, 1, 8))").collect()
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("sum(aggregate(embedding, 0d, (a, x) -> a + x))").collect()
    // Local iteration aid: SPARK_GRAFT_ONLY=j2_large_join_agg,j6_join_preagg
    // restricts the run (spread checks, drift isolation). Driver leaves it
    // unset and benches the whole catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // SPARK_GRAFT_WARM=1: run each selected query once UNTIMED first.
    // Restricted runs (SPARK_GRAFT_ONLY) measure steady state this way —
    // without it, the first execution absorbs that query's own codegen
    // JIT, which the full catalog amortizes across neighbors (r6: d7
    // isolated swung 2.2-14.7 s cold vs tight warm).
    if (sys.env.get("SPARK_GRAFT_WARM").contains("1"))
      selected.foreach { case (name, fn) =>
        // NonFatal only: a query that dies in warmup will die timed too —
        // log it as the early signal — and fatal errors (OOM) must escape.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warmup failed for $name: ${e.getMessage}")
        }
        System.gc()
      }
    // Local-mode floor: the fixed per-query harness cost (scheduler +
    // noop-sink commit on a 5-row scan) under TODAY'S host state. With
    // ~60 catalog queries sitting at 0.2-0.5s, host drift in this floor
    // dominates their signal — recording it per run lets a later
    // adjudication normalize totals across runs instead of chasing
    // phantom regressions (this host has measured 126-180s catalog
    // totals on identical code).
    val floorTimes = (1 to 15).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/region.parquet")
        .selectExpr("r_regionkey", "upper(r_name) AS n")
        .orderBy("r_regionkey")
        .write.format("noop").mode("overwrite").save()
      // elapsed captured BEFORE the gc: timed catalog queries exclude their
      // inter-query gc, so the floor must too, or it overstates the very
      // harness cost it normalizes
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }.sorted
    val floor = floorTimes(floorTimes.size / 2)
    System.err.println(f"[bench] floor (median of 15)          $floor%8.2f s")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption)
      .getOrElse(3).max(1)
    val setups = SparkEntry.setups
    val results = selected
      .map { case (name, fn) =>
      // Untimed setup: materialize any persisted artifact the query's
      // premise assumes (e.g. d13's baseline label table) outside the
      // timed window — the catalog number measures the advertised work.
      setups.get(name).foreach { prep =>
        try { prep(spark, sfDir); System.gc() }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] setup failed for $name: ${e.getMessage}")
        }
      }
      // N timed executions, median recorded (see the noise protocol in the
      // scaladoc). A failure on any run marks the query failed — a query
      // that dies once is broken, not noisy.
      var failed = false
      val times = (1 to runs).iterator.takeWhile(_ => !failed).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed = true
        }
        val secs = (System.nanoTime() - t0) / 1e9
        // Untimed inter-run/inter-query GC: lets the ContextCleaner reclaim
        // the finished run's shuffles/broadcasts without a pause landing in
        // the next timed window.
        System.gc()
        secs
      }.toVector
      // true median: lower-middle for odd run counts, mean of the two
      // middles for even ones (SPARK_GRAFT_RUNS is user-settable — a
      // lower-middle-only pick would record a low-biased "median" at
      // runs=4 while the artifact claims a median)
      val secs =
        if (failed) -1.0
        else {
          val s = times.sorted
          val n = s.size
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
        }
      System.err.println(f"[bench] $name%-28s $secs%8.2f s" +
        (if (failed) "" else
          times.map(t => f"$t%.2f").mkString("  [", " ", "]")))
      name -> secs
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma decimal separator would corrupt the JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // 2-decimal twin for the stdout line: the driver parses a bounded
    // stdout TAIL, so the line that must survive whole is kept as short as
    // the data allows (VERDICT r15 #2 — the durable 3-decimal copy lives in
    // BENCH_FULL.json, written below).
    def num2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val qs2 = results.map { case (k, v) => "\"" + k + "\":" + num2(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val full =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","floor":${num(floor)},"runs":$runs,"queries":$qs,"sf":"$sfDir"}"""
    // The driver records only a bounded stdout TAIL and parses the complete
    // one-line JSON (it needs the `queries` map) from it. r15 printed the
    // full line FIRST and a queries-less headline last — the driver parsed
    // none of three runs (PERF_r15 empty). So: the compact headline prints
    // first, the COMPLETE one-line JSON (2-decimal medians, no spaces)
    // prints LAST where a tail capture keeps it whole; the 3-decimal
    // artifact goes to a committed repo file.
    // Restricted runs (SPARK_GRAFT_ONLY) are adjudication probes, never the
    // catalog record — only a full run may overwrite the committed artifact.
    if (only.isEmpty) {
      // BENCH_FULL.json is the latest-run pointer; a round-stamped copy
      // (BENCH_FULL_r{N}.json, N = 1 + highest committed driver record)
      // survives the next round's overwrite so per-query regression
      // analysis never depends on the driver's truncated stdout tail
      // (VERDICT r10 #4 — the r9 per-query map is unrecoverable).
      val round = try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.matches("BENCH_r\\d+\\.json") =>
            s.stripPrefix("BENCH_r").stripSuffix(".json").toInt }
          .maxOption.getOrElse(0) + 1
      } catch { case _: Exception => 0 }
      val targets = Seq("BENCH_FULL.json") ++
        (if (round > 0) Seq(f"BENCH_FULL_r$round%02d.json") else Nil)
      for (t <- targets)
        try java.nio.file.Files.writeString(java.nio.file.Paths.get(t), full + "\n")
        catch { case e: java.io.IOException =>
          System.err.println(s"[bench] could not write $t: ${e.getMessage}")
        }
    }
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","floor":${num(floor)},"runs":$runs,"n_queries":${results.size},"n_failed":${results.count(_._2 < 0)},"slowest20":$slowest,"full":"BENCH_FULL.json","sf":"$sfDir"}""")
    // only a FULL run may put the catalog-shaped record on the guaranteed-
    // last line — a restricted probe's subset total must never be
    // tail-parsable as the round's result
    if (only.isEmpty)
      println(s"""{"metric":"total","value":${num2(total)},"unit":"sec","floor":${num2(floor)},"runs":$runs,"queries":$qs2,"sf":"$sfDir"}""")
    spark.stop()
  }
}
