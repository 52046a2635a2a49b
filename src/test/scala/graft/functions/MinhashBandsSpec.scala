package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** The native MinHash expression must be bit-identical to the HOF form that
  * generates the DuckDB oracle SQL — shingle order, signatures, band hashes.
  */
class MinhashBandsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf())
    .select($"doc_id", TextOps.tokens($"text").as("toks"))

  test("native expression equals the HOF form on real documents") {
    val both = docs
      .withColumn("nat", MinhashBands.minhashBands($"toks", 3, 16, 8))
      .withColumn("hof", TextOps.minhashBandsExpr("toks", 3, 16, 8, 2))
    assert(both.filter(
      ($"nat".isNull =!= $"hof".isNull) ||
        ($"nat.shingles" =!= $"hof.shingles") ||
        ($"nat.bands" =!= $"hof.bands")).count() == 0)
  }

  test("interpreted path matches codegen path") {
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try docs.limit(50)
        .select(MinhashBands.minhashBands($"toks", 2, 16, 8).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("long-token kernel equals the stringified string kernel (g6 contract)") {
    // g6-shaped input: sorted distinct long sets (incl. negatives and 0 —
    // the decimal rendering must match cast(x AS string) exactly)
    val sets = graft.Tables.lineitem(spark, sf())
      .groupBy($"l_orderkey".as("id"))
      .agg(sort_array(collect_set($"l_partkey")).as("xs"))
      .unionByName(Seq((-(1L), Seq(-42L, 0L, 7L, 1000000007L)))
        .toDF("id", "xs"))
    val both = sets
      .withColumn("nat", MinhashBands.minhashBandsLong($"xs", 16, 4))
      .withColumn("hof", MinhashBands.minhashBands(
        expr("transform(xs, x -> cast(x as string))"), 1, 16, 4))
    assert(both.filter(
      ($"nat".isNull =!= $"hof".isNull) ||
        ($"nat.bands" =!= $"hof.bands") ||
        (expr("transform(nat.shingles, x -> cast(x as string))") =!=
          $"hof.shingles")).count() == 0)
    // empty array → null on both (too short to shingle at w = 1)
    val empty = Seq(Seq.empty[Long]).toDF("xs")
      .select(MinhashBands.minhashBandsLong($"xs", 16, 4).isNull)
      .as[Boolean].head()
    assert(empty)
    // interpreted == codegen
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try sets.limit(50)
        .select(MinhashBands.minhashBandsLong($"xs", 16, 4).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("shingleHashes equals the HOF chain on real documents, both exec paths") {
    val hof = expr(TextOps.tokenHashesSql(TextOps.shinglesSql("toks", 3)))
    val both = docs
      .withColumn("nat", MinhashBands.shingleHashes($"toks", 3))
      .withColumn("hof", hof)
    assert(both.filter(
      ($"nat".isNull =!= $"hof".isNull) || ($"nat" =!= $"hof")).count() == 0)
    // HOF corner parity: short doc → EMPTY (not null), null array → null,
    // null tokens vanish with their separator
    val corner = Seq(
      (1L, Seq("one", "two")),
      (2L, null.asInstanceOf[Seq[String]]),
      (3L, Seq("a", null, "c", "d"))).toDF("id", "toks")
    val c = corner
      .withColumn("nat", MinhashBands.shingleHashes($"toks", 3))
      .withColumn("hof", expr(TextOps.tokenHashesSql(TextOps.shinglesSql("toks", 3))))
    assert(c.filter(
      ($"nat".isNull =!= $"hof".isNull) || ($"nat" =!= $"hof")).count() == 0)
    assert(c.filter($"id" === 1L).select(size($"nat")).as[Int].head() == 0)
    // interpreted == codegen
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try docs.limit(50)
        .select(MinhashBands.shingleHashes($"toks", 3).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("too-short documents yield null (HOF parity)") {
    val df = Seq(Seq("one"), Seq("a", "b", "c")).toDF("toks")
    val out = df.select(MinhashBands.minhashBands($"toks", 2, 16, 8).isNull)
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
  }

  test("simhash60 matches the HOF vote formula and both execution paths agree") {
    val hof = org.apache.spark.sql.functions.expr(
      TextOps.letSql("toks", "tv") { tv =>
        TextOps.letSql(s"transform($tv, t -> ${TextOps.md5LongSql("t")})", "hs") { hs =>
          s"""aggregate(sequence(0, 59), 0L, (acc, b) -> acc +
             |  if(aggregate($hs, 0L,
             |       (w, h) -> w + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
             |     shiftleft(1L, b), 0L))""".stripMargin
        }
      })
    val df = docs.limit(30)
    val both = df.select($"doc_id",
      MinhashBands.simhash60Col($"toks").as("nat"), hof.as("ref"))
    assert(both.filter($"nat" =!= $"ref").count() == 0)
    // codegen on/off parity — NO_CODEGEN actually exercises interpreted eval
    def run(codegen: Boolean) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen) "FALLBACK" else "NO_CODEGEN")
      try df.select(MinhashBands.simhash60Col($"toks")).as[Long].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run(codegen = true) == run(codegen = false))
  }

  test("simhash120 halves match the HOF vote formulas; nulls fold to [0,0]") {
    def voteHof(hashSql: String => String) = org.apache.spark.sql.functions.expr(
      TextOps.letSql("toks", "tv") { tv =>
        TextOps.letSql(s"transform($tv, t -> ${hashSql("t")})", "hs") { hs =>
          s"""aggregate(sequence(0, 59), 0L, (acc, b) -> acc +
             |  if(aggregate($hs, 0L,
             |       (w, h) -> w + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
             |     shiftleft(1L, b), 0L))""".stripMargin
        }
      })
    val df = docs.limit(30)
    val both = df.select($"doc_id",
      MinhashBands.simhash120Col($"toks").as("nat"),
      voteHof(TextOps.md5LongSql).as("refHi"),
      voteHof(TextOps.md5LongLoSql).as("refLo"))
    assert(both.filter(element_at($"nat", 1) =!= $"refHi" ||
      element_at($"nat", 2) =!= $"refLo").count() == 0)
    // hi half is definitionally simhash60
    assert(df.select(MinhashBands.simhash120Col($"toks").as("nat"),
        MinhashBands.simhash60Col($"toks").as("s60"))
      .filter(element_at($"nat", 1) =!= $"s60").count() == 0)
    // null/empty token arrays fold to [0, 0] through the expression
    val out = Seq(Option.empty[Seq[String]], Some(Seq.empty[String]))
      .toDF("toks")
      .select(MinhashBands.simhash120Col($"toks").as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(out == Seq(Seq(0L, 0L), Seq(0L, 0L)))
  }

  test("minhashSig slices digest to the exact band hashes") {
    val docs = graft.Tables.documents(spark, sf()).limit(50)
      .select($"doc_id", split($"text", " ").as("toks"))
    val (w, k, b) = (3, 60, 12)
    val both = docs.select($"doc_id",
      MinhashBands.minhashSig($"toks", w, k).as("sig"),
      MinhashBands.minhashBands($"toks", w, k, b).getField("bands").as("bands"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long], Seq[String])].collect()
    assert(both.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r = k / b
    both.foreach { case (id, sig, bands) =>
      assert(sig.length == k && bands.length == b, s"doc $id shape")
      (0 until b).foreach { i =>
        val expect = md5hex(sig.slice(i * r, i * r + r).mkString("|"))
        assert(bands(i) == expect, s"doc $id band $i")
      }
    }
  }

  test("simhash60 null semantics match the vote formula (null array -> 0)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    assert(MinhashBands.simhash60(null) == 0L)
    // a null ELEMENT votes -1 on every bit (engine CASE-null behavior), so a
    // single-null-element array and an empty array both yield signature 0
    assert(MinhashBands.simhash60(new GenericArrayData(Array[Any](null))) == 0L)
    assert(MinhashBands.simhash60(new GenericArrayData(Array[Any]())) == 0L)
    // and through the expression: null toks column gives 0, never null
    val out = Seq(Option.empty[Seq[String]], Some(Seq("a", "b")))
      .toDF("toks")
      .select(MinhashBands.simhash60Col($"toks").as("sig"))
      .as[Long].collect().toSeq
    assert(out.head == 0L)
    assert(out(1) != 0L)
  }
}
