package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("assertUnique passes on a key and fails with a counted diagnosis") {
    Checks.assertUnique(Tables.orders(spark, sf()), Seq("o_orderkey"), "orders")
    val e = intercept[Checks.CheckFailed] {
      Checks.assertUnique(Tables.lineitem(spark, sf()), Seq("l_orderkey"), "lineitem")
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("assertSameCount, assertNoNulls, assertInRange") {
    val o = Tables.orders(spark, sf())
    Checks.assertSameCount(o, o.select("o_orderkey"))
    intercept[Checks.CheckFailed] { Checks.assertSameCount(o, o.limit(3)) }
    Checks.assertNoNulls(o, Seq("o_orderkey", "o_custkey"))
    intercept[Checks.CheckFailed] {
      Checks.assertNoNulls(Seq((1, Option.empty[String])).toDF("a", "b"), Seq("b"))
    }
    Checks.assertInRange(o, "o_totalprice", 0.0, 1e9)
    intercept[Checks.CheckFailed] { Checks.assertInRange(o, "o_totalprice", 0.0, 10.0) }
  }

  test("fdAudit counts uniqueness and FD violations exactly") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "b", 20L),
      (3L, "b", 30L), (4L, "c", 40L)).toDF("k", "g", "v")
    // k unique? k=3 appears twice -> one violating group
    val u = Checks.fdAudit(df, "k unique", Seq("k"), None).head()
    assert(u.getAs[String]("rule") === "k unique")
    assert(u.getAs[Long]("n_rows") === 5L)
    assert(u.getAs[Long]("n_groups") === 4L)
    assert(u.getAs[Long]("n_violating") === 1L)
    assert(!u.getAs[Boolean]("holds"))
    // g -> v: g=b maps to {20,30} -> violated; g=a maps to {10} ok
    val f = Checks.fdAudit(df, "g->v", Seq("g"), Some("v")).head()
    assert(f.getAs[Long]("n_groups") === 3L)
    assert(f.getAs[Long]("n_violating") === 1L)
    assert(!f.getAs[Boolean]("holds"))
    // g -> first letter of g: trivially holds
    val ok = Checks.fdAudit(df.selectExpr("*", "substring(g, 1, 1) AS g2"),
      "g->g2", Seq("g"), Some("g2")).head()
    assert(ok.getAs[Long]("n_violating") === 0L)
    assert(ok.getAs[Boolean]("holds"))
  }

  test("fdAudit counts NULL as a distinct RHS value") {
    // a -> {10, NULL} violates (two "values"); b -> {NULL} alone holds
    // (exactly one value, which happens to be NULL); c -> {30} holds.
    val df = Seq(
      ("a", Some(10L)), ("a", None), ("b", None), ("c", Some(30L)))
      .toDF("g", "v")
    val f = Checks.fdAudit(df, "g->v", Seq("g"), Some("v")).head()
    assert(f.getAs[Long]("n_groups") === 3L)
    assert(f.getAs[Long]("n_violating") === 1L)
    assert(!f.getAs[Boolean]("holds"))
  }

  test("sql registration exposes dot_product and hilbert_index") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT hilbert_index(0L, 0L, 2)").head().getLong(0) == 0L)
    assert(spark.sql("SELECT hilbert_index(3L, 3L, 2)").head().getLong(0) ==
      graft.functions.Hilbert.index(2, 3, 3))
  }
}
