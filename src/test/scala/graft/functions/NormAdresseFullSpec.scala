package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference parity for the full normadresse port: every golden pair from
  * the reference's own test fixture must reproduce exactly, plus the budget
  * invariant and both execution paths of the Catalyst expression.
  */
class NormAdresseFullSpec extends SparkSpec {
  import spark.implicits._

  test("reproduces all 41 reference golden fixtures exactly") {
    val bad = NormAdresseGoldens.cases.filter { case (in, exp) =>
      NormAdresseFull.abrev(in) != exp
    }
    assert(bad.isEmpty, bad.map { case (in, exp) =>
      s"$in\n  expected: $exp\n  got:      ${NormAdresseFull.abrev(in)}"
    }.mkString("\n"))
  }

  test("budget invariant: every golden fixture abbreviates to <= 32 chars") {
    NormAdresseGoldens.cases.foreach { case (in, _) =>
      val out = NormAdresseFull.abrev(in)
      assert(out.length <= 32, s"'$in' -> '$out' (${out.length})")
    }
  }

  test("short inputs pass through as cleaned uppercase (optimistic exit)") {
    assert(NormAdresseFull.abrev("sentier de la Côte") == "SENTIER DE LA COTE")
    assert(NormAdresseFull.abrev("RUE X") == "RUE X")
  }

  test("expression matches driver-side abrev with codegen on and off") {
    val df = NormAdresseGoldens.cases.map(_._1).toDF("addr")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val got = df.select(NormAdresseFull.normadresseFull($"addr").as("n"))
          .as[String].collect().toSeq
        val want = NormAdresseGoldens.cases.map(c => NormAdresseFull.abrev(c._1))
        assert(got == want, s"codegen=$codegen")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("expression handles null and empty input") {
    val df = Seq(Some(""), None, Some("BOULEVARD DU MARECHAL JEAN MARIE DE LATTRE DE TASSIGNY"))
      .toDF("addr")
    val got = df.select(NormAdresseFull.normadresseFull($"addr").as("n"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some(""), None, Some("bd mal j m de LATTRE de TASSIGNY")))
  }
}
