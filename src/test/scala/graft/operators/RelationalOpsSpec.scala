package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst keeps exactly the top-priority row per key") {
    val df = Seq(
      ("a", 2, "keep"), ("a", 5, "drop"), ("b", 1, "keep"), ("b", 9, "drop"), ("c", 7, "keep")
    ).toDF("k", "prio", "tag")
    val out = Relational.dedupKeepFirst(df, Seq("k"), Seq(asc("prio")))
      .select("k", "tag").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "keep", "b" -> "keep", "c" -> "keep"))
  }

  test("sessionize splits runs on gaps > threshold") {
    // user u: ts 0, 10, 1000, 1005, 5000 with gap 100 → sessions {0,10}, {1000,1005}, {5000}
    val df = Seq(("u", 0L, 1L), ("u", 10L, 2L), ("u", 1000L, 3L), ("u", 1005L, 4L),
      ("u", 5000L, 5L), ("v", 0L, 6L)).toDF("user", "ts", "id")
    val out = Relational.sessionize(df, "user", "ts", "id", gap = 100L)
    val sessions = out.filter($"user" === "u").groupBy("session_id").count()
      .as[(Long, Long)].collect().toMap
    assert(sessions == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
    assert(out.filter($"user" === "v").select("session_id").as[Long].head() == 1L)
  }

  test("sessionizeScalable equals sessionize row-for-row, incl. one giant key") {
    // one key with 20k rows (spans many range partitions), several small
    // keys, gaps planted every ~500 rows, shuffled input order
    val rows = (0 until 20000).map { i =>
      val ts = i.toLong * 10 + (if (i % 500 == 0) 0 else 0) + (i / 500) * 100000L
      ("giant", ts, i.toLong)
    } ++ (0 until 50).flatMap { k =>
      (0 until 40).map(j => (s"k$k", j.toLong * 7 + (j / 10) * 50000L, 100000L + k * 1000 + j))
    }
    val df = rows.toDF("user", "ts", "id").repartition(17)
    val gap = 1000L
    val exp = Relational.sessionize(df, "user", "ts", "id", gap)
      .select("user", "id", "session_id").as[(String, Long, Long)].collect().toSet
    val got = Relational.sessionizeScalable(df, "user", "ts", "id", gap)
      .select("user", "id", "session_id").as[(String, Long, Long)].collect().toSet
    assert(got === exp)
  }

  test("sessionizeScalable matches sessionize on null timestamps and binary keys") {
    // null ts rows sort first within a key and each starts a session in
    // the window form (lag(null) branch) — the scan must reproduce that;
    // binary keys exercise value equality (Array[Byte].equals is
    // reference identity, which would split every key)
    val rows = Seq(
      ("a", null.asInstanceOf[java.lang.Long], 1L),
      ("a", null.asInstanceOf[java.lang.Long], 2L),
      ("a", java.lang.Long.valueOf(100L), 3L),
      ("a", java.lang.Long.valueOf(150L), 4L),
      ("a", java.lang.Long.valueOf(5000L), 5L),
      ("b", java.lang.Long.valueOf(0L), 6L))
    val df = rows.toDF("user", "ts", "id").repartition(5)
    val exp = Relational.sessionize(df, "user", "ts", "id", gap = 100L)
      .select("id", "session_id").as[(Long, Long)].collect().toSet
    val got = Relational.sessionizeScalable(df, "user", "ts", "id", gap = 100L)
      .select("id", "session_id").as[(Long, Long)].collect().toSet
    assert(got === exp)

    val bin = (0 until 4000).map(i =>
      (Array[Byte]((i % 5).toByte, 7), i.toLong * 3 + (i / 200) * 10000L, i.toLong))
      .toDF("user", "ts", "id").repartition(9)
    val expB = Relational.sessionize(bin, "user", "ts", "id", gap = 500L)
      .select("id", "session_id").as[(Long, Long)].collect().toSet
    val gotB = Relational.sessionizeScalable(bin, "user", "ts", "id", gap = 500L)
      .select("id", "session_id").as[(Long, Long)].collect().toSet
    assert(gotB === expB)
  }

  test("sessionizeScalable keeps continuation runs across partition boundaries") {
    // a single key whose rows all continue one session: any boundary
    // mishandling would split it
    val df = (0 until 5000).map(i => ("only", i.toLong, i.toLong))
      .toDF("user", "ts", "id").repartition(13)
    val out = Relational.sessionizeScalable(df, "user", "ts", "id", gap = 5L)
    assert(out.select(max("session_id")).as[Long].head() === 1L)
    assert(out.count() === 5000L)
  }

  test("asOfJoin attaches the latest right row at or before each left ts") {
    val left = Seq((1, 5L, "p5"), (1, 15L, "p15"), (1, 2L, "p2"), (2, 9L, "q9"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 3L, "r3"), (1, 10L, "r10"), (2, 20L, "r20"))
      .toDF("k", "ts", "payload")
    val out = Relational.asOfJoin(left, right, "k", "ts", Seq("payload"))
      .select($"tag", $"asof_payload", $"asof_ts").as[(String, Option[String], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("p2") == ((None, None)))           // nothing at or before ts=2
    assert(out("p5") == ((Some("r3"), Some(3L))))
    assert(out("p15") == ((Some("r10"), Some(10L))))
    assert(out("q9") == ((None, None)))           // right row is later (20 > 9)
  }

  test("asOfJoin match is inclusive at equal timestamps") {
    val left = Seq((1, 10L, "p")).toDF("k", "ts", "tag")
    val right = Seq((1, 10L, "r")).toDF("k", "ts", "payload")
    val out = Relational.asOfJoin(left, right, "k", "ts", Seq("payload"))
    assert(out.select("asof_payload").as[String].head() == "r")
  }

  test("asOfJoin never blends payload columns from different right rows") {
    // right rows: (ts=10, a=null, b=x) and (ts=20, a=y, b=z). A per-column
    // ignoreNulls fill would hand a backward match at ts=20 the PAIR (y, z)
    // but a forward retry at ts=5 the blend (y-from-20, x-from-10); the
    // whole-row struct must return (null, x) from the single ts=10 row.
    val left = Seq((1, 5L, "fwd"), (1, 25L, "back")).toDF("k", "ts", "tag")
    val right = Seq((1, 10L, Option.empty[String], Some("x")),
      (1, 20L, Some("y"), Some("z"))).toDF("k", "ts", "a", "b")
    val out = Relational.asOfJoin(left, right, "k", "ts", Seq("a", "b"),
        forwardRetry = true)
      .select($"tag", $"asof_a", $"asof_b", $"asof_ts")
      .as[(String, Option[String], Option[String], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("fwd") == ((None, Some("x"), Some(10L))))       // atomic ts=10 row
    assert(out("back") == ((Some("y"), Some("z"), Some(20L)))) // atomic ts=20 row
  }

  test("asOfJoin forwardRetry fills backward misses with the first later right row") {
    val left = Seq((1, 5L, "early"), (1, 15L, "late"), (2, 9L, "noRight"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 8L, "r8"), (1, 10L, "r10")).toDF("k", "ts", "payload")
    val out = Relational.asOfJoin(left, right, "k", "ts", Seq("payload"),
        forwardRetry = true)
      .select($"tag", $"asof_payload", $"asof_ts", $"asof_dir")
      .as[(String, Option[String], Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // ts=5 precedes every right row → retried forward onto r8 (the FIRST later)
    assert(out("early") == ((Some("r8"), Some(8L), Some("forward"))))
    // a backward match stays backward (never overwritten by later rows)
    assert(out("late") == ((Some("r10"), Some(10L), Some("backward"))))
    // no right row for the key at all → still unmatched, direction null
    assert(out("noRight") == ((None, None, None)))
  }

  test("cdcDiff returns multiplicity-aware additions and deletions") {
    val old = Seq(("x", 1), ("x", 1), ("y", 2)).toDF("k", "v")
    val neu = Seq(("x", 1), ("y", 2), ("z", 3)).toDF("k", "v")
    val (added, removed) = Relational.cdcDiff(neu, old)
    assert(added.as[(String, Int)].collect().toSet == Set(("z", 3)))
    assert(removed.as[(String, Int)].collect().toSeq == Seq(("x", 1))) // one copy survives
  }

  test("keepKeysWithCount keeps only keys with the exact cardinality") {
    val df = Seq(("a", 1), ("b", 1), ("b", 2), ("c", 1)).toDF("k", "v")
    val out = Relational.keepKeysWithCount(df, "k", 1L).select("k").as[String].collect().toSet
    assert(out == Set("a", "c"))
  }

  test("conditionalCountPivot counts per segment") {
    val df = Seq(("d1", "fr"), ("d1", "fr"), ("d1", "api"), ("d2", "api"))
      .toDF("id", "seg")
    val out = Relational.conditionalCountPivot(df, Seq("id"), "seg", Seq("fr", "api"), "nb")
      .orderBy("id").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("d1", 2L, 1L), ("d2", 0L, 1L)))
  }
}
