package graft.operators

import graft.SparkSpec

/** Fuzzy.scala: deletion-variant generation and the blocked deletion join
  * — exactly the deletion-edit pairs, verified lev, multi-match. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants enumerates every 1-deletion with its position") {
    val v = Fuzzy.deletionVariants(Seq(("abc")).toDF("s"), "s").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("variant"))).sorted.toSeq
    assert(v === Seq((1L, "bc"), (2L, "ac"), (3L, "ab")))
  }

  test("deletionJoin matches deletion-distance-1 pairs only, with multi-match") {
    val refs = Seq((1L, "ring"), (2L, "rink"), (3L, "kings"), (4L, "ping")).toDF("rid", "name")
    val probes = Seq((10L, "rin"), (11L, "king"), (12L, "xyz")).toDF("pid", "p")
    val got = Fuzzy.deletionJoin(probes, "pid", "p", refs, "rid", "name")
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rid"))).toSet
    // "rin" = ring-'g' = rink-'k'; "king" = kings-'s'; "xyz" matches nothing
    assert(got === Set((10L, 1L), (10L, 2L), (11L, 3L)))
  }

  test("a doubled letter yields one distinct pair despite two equal variants") {
    val refs = Seq((1L, "aab")).toDF("rid", "name")
    val probes = Seq((10L, "ab")).toDF("pid", "p")
    val got = Fuzzy.deletionJoin(probes, "pid", "p", refs, "rid", "name").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("lev") === 1L)
  }

  test("symmetricSelfJoin finds all lev<=1 unordered pairs and no others") {
    // covers every lev<=1 edit kind: equal (1,2), deletion/insertion
    // (1,3), substitution (1,4), plus lev-2 pairs that share a blocking
    // key but must be verified away ((3,5): "rig"/"rink"; (4,6) via none)
    val recs = Seq((1L, "ring"), (2L, "ring"), (3L, "rig"), (4L, "rang"),
      (5L, "rink"), (6L, "bling")).toDF("id", "s")
    val got = Fuzzy.symmetricSelfJoin(recs, "id", "s").collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) -> r.getAs[Long]("lev"))
      .toMap
    // brute-force reference over all 15 pairs
    val m = Map(1L -> "ring", 2L -> "ring", 3L -> "rig", 4L -> "rang",
      5L -> "rink", 6L -> "bling")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- m.keys; j <- m.keys if i < j
      l = lev(m(i), m(j)) if l <= 1
    } yield (i, j) -> l.toLong).toMap
    assert(got === want)
    // sanity on the fixture: the reference itself contains all three kinds
    assert(want((1L, 2L)) === 0L)
    assert(want((1L, 3L)) === 1L)
    assert(want((1L, 4L)) === 1L)
    assert(!want.contains((3L, 5L)))
  }

  test("soundex expression matches the pinned-variant scalar reference") {
    import org.apache.spark.sql.functions.expr
    // the simplified variant pinned in Fuzzy.soundexSparkSql's doc:
    // adjacent EQUAL CODES collapse (vowels do not separate), first code
    // dropped, zeros removed, truncate/pad to 3
    def ref(s: String): String = {
      val u = s.toUpperCase
      val codes = u.map {
        case c if "BFPV".contains(c) => '1'
        case c if "CGJKQSXZ".contains(c) => '2'
        case c if "DT".contains(c) => '3'
        case 'L' => '4'
        case c if "MN".contains(c) => '5'
        case 'R' => '6'
        case _ => '0'
      }
      val dd = codes.foldLeft(List.empty[Char])((acc, c) =>
        if (acc.nonEmpty && acc.head == c) acc else c :: acc).reverse
      s"${u.head}${dd.drop(1).filter(_ != '0').mkString.take(3).padTo(3, '0')}"
    }
    val names = Seq("robert", "rupert", "tymczak", "ashcraft", "x", "aeiou",
      "customer", "custmer", "merge", "mrge", "pfister", "jackson")
    val got = names.toDF("name")
      .withColumn("sx", expr(Fuzzy.soundexSparkSql("name")))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("sx")).toMap
    names.foreach(n => assert(got(n) === ref(n), n))
    // classic pairs land in shared blocks; the all-vowel/1-char edges pad
    assert(got("robert") === "R163")
    assert(got("robert") === got("rupert"))
    assert(got("customer") === got("custmer"))
    assert(got("aeiou") === "A000")
    assert(got("x") === "X000")
  }
}
