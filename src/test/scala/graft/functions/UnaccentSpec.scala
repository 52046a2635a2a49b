package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.Unaccent.unaccent

class UnaccentSpec extends SparkSpec {
  import spark.implicits._

  private def run(inputs: Seq[String], codegen: Boolean): Seq[String] = {
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    spark.conf.set("spark.sql.codegen.factoryMode", if (codegen) "FALLBACK" else "NO_CODEGEN")
    try inputs.toDF("s").select(unaccent($"s")).as[String].collect().toSeq
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private val cases = Map(
    "Café Señor" -> "Cafe Senor",
    "œuvre Œuvre" -> "oeuvre OEuvre",
    "Ærøskøbing ß" -> "AEroskobing ss",
    "Łódź Đorđe" -> "Lodz Dorde",
    "déjà-vu à Nîmes" -> "deja-vu a Nimes",
    "" -> "",
    "plain ascii 123" -> "plain ascii 123")

  test("strips accents and transliterates ligatures (codegen on)") {
    assert(run(cases.keys.toSeq, codegen = true) == cases.values.toSeq)
  }

  test("interpreted path matches codegen path") {
    assert(run(cases.keys.toSeq, codegen = false) == run(cases.keys.toSeq, codegen = true))
  }

  test("null passes through") {
    val r = Seq[String](null).toDF("s").select(unaccent($"s")).collect()
    assert(r.head.isNullAt(0))
  }

  test("sql registration works") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT unaccent('élevé')").head().getString(0) == "eleve")
  }

  test("property: idempotent over generated mixed strings") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr,
      Gen.oneOf("éàüœßØ çñ", "Łódź", "ÆON", "ïôù"))).map(_.mkString(" "))
    (0 until 200).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      val once = Unaccent.strip(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      val twice = Unaccent.strip(
        org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString
      assert(once == twice, s"not idempotent for: $s")
    }
  }
}
