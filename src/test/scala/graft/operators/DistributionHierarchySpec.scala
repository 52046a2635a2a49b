package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DistributionHierarchySpec extends SparkSpec {
  import spark.implicits._

  test("repairBins rounds to step and pushes collisions upward") {
    assert(Distribution.repairBins(Seq(110.0, 130.0, 151.0, 390.0), 100.0) ==
      Seq(100.0, 200.0, 300.0, 400.0)) // 130→100 collides → 200; 151→200 collides → 300
    assert(Distribution.repairBins(Seq(90.0, 480.0, 910.0), 100.0) ==
      Seq(100.0, 500.0, 900.0)) // no collisions, plain rounding
  }

  test("approxProfile sketch estimates stay inside the error envelope") {
    val df = graft.Tables.lineitem(spark, sf())
    val out = Distribution.approxProfile(df, Seq("l_extendedprice", "l_quantity")).head()
    val exact = df.agg(
      org.apache.spark.sql.functions.countDistinct("l_extendedprice"),
      org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.5)"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head()
    val (ndvE, p50E, nE) = (exact.getLong(0), exact.getDouble(1), exact.getLong(2))
    assert(out.getAs[Long]("n_rows") == nE)                     // exact by construction
    val ndvA = out.getAs[Long]("l_extendedprice_ndv")
    assert(math.abs(ndvA - ndvE).toDouble / ndvE < 0.10, s"ndv $ndvA vs $ndvE")
    val p50A = out.getAs[Double]("l_extendedprice_p50")
    // approx_percentile returns a VALUE FROM THE DATA whose rank error is
    // bounded by 1/accuracy — compare by rank, not by value distance
    val rankLo = df.filter(org.apache.spark.sql.functions.col("l_extendedprice") <= p50A).count()
    assert(math.abs(rankLo.toDouble / nE - 0.5) < 0.02, s"p50 $p50A rank ${rankLo.toDouble / nE}")
    assert(p50E > 0.0)
  }

  test("priceDistribution: bins sum to group size; small groups are nulled") {
    val df = Tables.lineitem(spark, sf())
    val out = Distribution.priceDistribution(df, Seq("l_returnflag"),
      "l_extendedprice", nBins = 10, step = 100.0, minSupport = 100L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      if (n >= 100) {
        val edges = r.getSeq[Double](r.fieldIndex("edges"))
        assert(edges.size == 11 && edges == edges.sorted && edges.distinct == edges,
          s"edges not strictly increasing: $edges")
        val total = (1 to 10).map(i => r.getAs[Long](s"bin_$i")).sum
        assert(total == n, s"histogram sums $total != $n")
      } else {
        assert(r.isNullAt(r.fieldIndex("edges")))
      }
    }
  }

  test("applyCdcPolicy applies the diff under the threshold, replaces above it") {
    val old = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val neu = Seq(("a", 1), ("b", 99), ("d", 4)).toDF("k", "v")
    // 2 removals (b:2, c:3) — threshold 5 → incremental apply
    val (inc, replacedInc) = Relational.applyCdcPolicy(neu, old, threshold = 5)
    assert(!replacedInc)
    assert(inc.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 99), ("d", 4)))
    // threshold 1 → full replace
    val (full, replacedFull) = Relational.applyCdcPolicy(neu, old, threshold = 1)
    assert(replacedFull)
    assert(full.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 99), ("d", 4)))
  }

  test("transitiveClosure computes all ancestors of a 4-level geography") {
    val edges = Seq(
      ("communeA", "epci1"), ("communeB", "epci1"), ("epci1", "dept1"),
      ("dept1", "region1"), ("communeC", "dept2"), ("dept2", "region1")
    ).toDF("child", "parent")
    val closure = Hierarchy.transitiveClosure(edges, "child", "parent")
    val anc = Hierarchy.ancestorArrays(closure)
      .as[(String, Seq[String])].collect().toMap
    assert(anc("communeA") == Seq("dept1", "epci1", "region1"))
    assert(anc("communeC") == Seq("dept2", "region1"))
    assert(anc("epci1") == Seq("dept1", "region1"))
    assert(anc("dept1") == Seq("region1"))
  }

  test("closestExportedParents climbs through filtered-out levels") {
    // 4 levels: commune -> canton -> dept -> region, with cantons NOT
    // exported (the reference's filtered level) and a diamond for communeB.
    val edges = Seq(
      ("communeA", "canton1"), ("canton1", "dept1"), ("dept1", "region1"),
      ("communeB", "canton1"), ("communeB", "epci1"), ("epci1", "dept1"),
      ("communeC", "dept1"),
      // all-filtered dead end: communeD's only path never reaches an export
      ("communeD", "cantonX"), ("cantonX", "cantonY")
    ).toDF("child", "parent")
    val exported = Seq("communeA", "communeB", "communeC", "communeD",
      "epci1", "dept1", "region1").toDF("id")
    val parents = Hierarchy.closestExportedParents(edges, "child", "parent", exported, "id")
    val m = Hierarchy.parentArrays(parents).as[(String, Seq[String])].collect().toMap
    assert(m("communeA") == Seq("dept1"))          // canton1 skipped -> dept1
    assert(m("communeB") == Seq("dept1", "epci1")) // diamond: canton path + epci
    assert(m("communeC") == Seq("dept1"))          // direct exported parent
    assert(m("dept1") == Seq("region1"))
    assert(m("epci1") == Seq("dept1"))
    assert(!m.contains("communeD"))                // dead-ends resolve to no parent
    assert(!m.contains("region1"))                 // roots have no parents
  }

  test("closestExportedParents terminates on a non-exported cycle") {
    val edges = Seq(("a", "x"), ("x", "y"), ("y", "x")).toDF("child", "parent")
    val exported = Seq("a").toDF("id")
    val parents = Hierarchy.closestExportedParents(edges, "child", "parent",
      exported, "id", maxRounds = 5)
    assert(parents.count() == 0)
  }
}
