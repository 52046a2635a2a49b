package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketches.scala: register layout vs a BigInt reference, estimator
  * exactness, mergeability (the scale claim), and accuracy envelopes. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replica of the register/estimator pipeline for a value set. */
  private def refHll(values: Seq[String]): (Map[Long, Int], Long, Int) = {
    val reg = values.map { v =>
      val h = DetHash.md5Long(v)
      val bucket = h % Sketches.M
      val rem = h / Sketches.M
      val rho = if (rem == 0) Sketches.R
                else Sketches.R - java.lang.Long.toBinaryString(rem).length
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val z = reg.values.map(mj => BigInt(1) << (Sketches.R - mj)).sum +
      BigInt(Sketches.M - reg.size) * (BigInt(1) << Sketches.R)
    val est = BigInt(Sketches.AlphaPpm) * Sketches.M * Sketches.M *
      (BigInt(1) << Sketches.R) / (z * 1000000)
    (reg, est.toLong, Sketches.M - reg.size)
  }

  test("hllRegister and hllEstimate match the BigInt reference") {
    val values = (0 until 3000).map(i => s"val:$i")
    val df = values.map(v => ("g", v)).toDF("g", "v")
    val reg = Sketches.hllRegister(df, "g", "v")
    val (refReg, refEst, refVZero) = refHll(values)
    val gotReg = reg.collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("mj")).toMap
    assert(gotReg === refReg)
    val est = Sketches.hllEstimate(reg, "g").collect().head
    assert(est.getAs[Long]("est") === refEst)
    assert(est.getAs[Long]("v_zero") === refVZero.toLong)
  }

  test("HLL raw estimate lands within 15% at n/m ~ 12 (3000 over 256)") {
    val df = (0 until 3000).map(i => ("g", s"val:$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(Sketches.hllRegister(df, "g", "v"), "g")
      .collect().head.getAs[Long]("est")
    assert(math.abs(est - 3000L) <= 450L, s"est=$est")
  }

  test("HLL registers merge: max-merge of shard registers == global register") {
    val all = (0 until 2000).map(i => ("g", s"m:$i"))
    val (s1, s2) = all.splitAt(700)
    val merged = Sketches.hllRegister(s1.toDF("g", "v"), "g", "v")
      .unionByName(Sketches.hllRegister(s2.toDF("g", "v"), "g", "v"))
      .groupBy("g", "bucket").agg(max("mj").as("mj"))
    val global = Sketches.hllRegister(all.toDF("g", "v"), "g", "v")
    assert(merged.exceptAll(global).count() == 0)
    assert(global.exceptAll(merged).count() == 0)
  }

  test("composite-cell registers max-merge to the single-group register") {
    // the sketch-cube premise: registers at (g, day) cells, any day range
    // answered by max-merging cells == registering the slice directly
    val rows = (0 until 1500).map(i => ("g", (i % 5).toLong, s"c:$i"))
      .toDF("g", "day", "v")
    val cells = Sketches.hllRegisterBy(rows, Seq("g", "day"), "v")
    val mergedDays = cells.filter(col("day") < 3)
      .groupBy("g", "bucket").agg(max("mj").as("mj"))
    val direct = Sketches.hllRegister(rows.filter(col("day") < 3), "g", "v")
    assert(mergedDays.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(mergedDays).count() == 0)
  }

  test("kmvSketch keeps exactly the k smallest distinct hashes") {
    val df = (0 until 500).map(i => ("g", s"k:${i % 300}")).toDF("g", "v")
    val sk = Sketches.kmvSketch(df, "g", "v", k = 32).collect()
      .map(_.getAs[Long]("h")).sorted.toSeq
    val ref = (0 until 300).map(i => DetHash.md5Long(s"k:$i"))
      .distinct.sorted.take(32)
    assert(sk === ref)
  }

  test("count-min register matches a manual fold; estimates never undercount") {
    val items = Seq(("x", 5L), ("y", 3L), ("x", 2L), ("z", 1L)).toDF("it", "w")
    val reg = Sketches.cmRegister(items, "it", "w").collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt"))
      .toMap
    // manual fold with the same seeded hash
    val exp = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for ((it, w) <- Seq(("x", 7L), ("y", 3L), ("z", 1L)); i <- 0 until Sketches.CmD) {
      val b = DetHash.md5Long(s"$i:$it") % Sketches.CmW
      exp((i, b)) = exp.getOrElse((i, b), 0L) + w
    }
    assert(reg === exp.toMap)
    val cand = Seq("x", "y", "z", "never_seen").toDF("it")
    val est = Sketches.cmEstimate(Sketches.cmRegister(items, "it", "w"), cand, "it")
      .collect().map(r => r.getAs[String]("it") -> r.getAs[Long]("est")).toMap
    assert(est("x") >= 7L && est("y") >= 3L && est("z") >= 1L)
    assert(est("never_seen") >= 0L)
    // with 3 items in 4x1024 cells, collisions are absent: exact equality
    assert(est("x") === 7L && est("y") === 3L && est("z") === 1L)
    assert(est("never_seen") === 0L)
  }

  test("kmvOverlap matches the BigInt reference and is exact under k") {
    // two groups: 400 shared + 300/200 private values -> estimator path;
    // and two tiny groups (10 shared of 15/12) -> exact path
    val ga = (0 until 700).map(i => ("A", s"s:${if (i < 400) i else 1000 + i}"))
    val gb = (0 until 600).map(i => ("B", s"s:${if (i < 400) i else 5000 + i}"))
    val ta = (0 until 15).map(i => ("C", s"t:$i"))
    val tb = (0 until 12).map(i => ("D", s"t:${i + 5}"))
    val df = (ga ++ gb ++ ta ++ tb).toDF("g", "v")
    val k = 64
    val sk = Sketches.kmvSketch(df, "g", "v", k)
    val got = Sketches.kmvOverlap(sk, "g", k).collect()
      .map(r => (r.getAs[String]("ga"), r.getAs[String]("gb")) -> r).toMap

    // estimator-path reference for (A, B)
    val hA = ga.map(x => DetHash.md5Long(x._2)).distinct.sorted.take(k)
    val hB = gb.map(x => DetHash.md5Long(x._2)).distinct.sorted.take(k)
    val union = (hA ++ hB).distinct.sorted.take(k)
    val uk = union.last
    val nCommon = union.count(h => hA.contains(h) && hB.contains(h))
    val estU = (BigInt(k - 1) * (BigInt(1) << 60) / uk).toLong
    val estI = (BigInt(nCommon) * (k - 1) * (BigInt(1) << 60) / (BigInt(k) * uk)).toLong
    val ab = got(("A", "B"))
    assert(ab.getAs[Long]("n_common") === nCommon.toLong)
    assert(ab.getAs[Long]("est_union") === estU)
    assert(ab.getAs[Long]("est_inter") === estI)
    // sanity: estimates in the right ballpark (truth: union 900, inter 400)
    assert(math.abs(estU - 900L) < 350, s"estU=$estU")
    assert(math.abs(estI - 400L) < 250, s"estI=$estI")

    // exact path for (C, D): union 17 < k -> exact counts
    val cd = got(("C", "D"))
    assert(cd.getAs[Long]("est_union") === 17L)
    assert(cd.getAs[Long]("est_inter") === 10L)
    assert(cd.getAs[Long]("n_common") === 10L)
  }

  test("dyadicCover is a disjoint exact cover with <= 2 nodes per level") {
    val rng = new scala.util.Random(42)
    val ranges = Seq((0L, 0L), (0L, 65535L), (1L, 65534L), (12800L, 31999L)) ++
      (0 until 50).map { _ =>
        val a = rng.nextInt(65536).toLong
        val b = a + rng.nextInt((65536 - a).toInt).toLong
        (a, b)
      }
    for ((a, b) <- ranges) {
      val cover = Sketches.dyadicCover(a, b)
      // node (l, bk) covers [bk << l, (bk + 1) << l); sizes sum to the range
      assert(cover.map { case (l, _) => 1L << l }.sum === b - a + 1,
        s"[$a,$b] size")
      // disjoint + inside the range: every covered point lands in [a, b]
      // exactly once (checked via a few sampled points and full span ends)
      val pts = Seq(a, b) ++ (0 until 20).map(_ => a + (rng.nextLong().abs % (b - a + 1)))
      for (p <- pts) {
        val hits = cover.count { case (l, bk) => (p >> l) == bk }
        assert(hits === 1, s"point $p in [$a,$b] covered $hits times")
      }
      assert(cover.groupBy(_._1).values.forall(_.size <= 2))
    }
  }

  test("dyadic register: range counts == direct counts; registers sum-merge") {
    val rng = new scala.util.Random(7)
    val vals = (0 until 4000).map(_ => ("g", (rng.nextInt(60000)).toLong))
    val df = vals.toDF("g", "v")
    val reg = Sketches.dyadicRegister(df, Seq("g"), "v")
    for ((a, b) <- Seq((0L, 65535L), (12800L, 31999L), (100L, 100L), (59999L, 65535L))) {
      val got = Sketches.dyadicRangeCount(reg, Seq("g"), a, b).collect()
        .headOption.map(_.getAs[Long]("range_cnt")).getOrElse(0L)
      val want = vals.count { case (_, v) => v >= a && v <= b }.toLong
      assert(got === want, s"[$a,$b]")
    }
    // mergeability: registers of two halves, summed per cell == full register
    val (h1, h2) = vals.splitAt(1500)
    val merged = Sketches.dyadicRegister(h1.toDF("g", "v"), Seq("g"), "v")
      .unionByName(Sketches.dyadicRegister(h2.toDF("g", "v"), Seq("g"), "v"))
      .groupBy("g", "key").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(reg).count() === 0)
    assert(reg.exceptAll(merged).count() === 0)
  }

  test("dyadic register: the domain contract — clamped ingestion keeps the root total exact") {
    // the r15 s7 sf0.1 catch: an UNCLAMPED out-of-domain value lands
    // outside the root cell (total under-reads COUNT(*)); the ingestion
    // clamp restores root == row count with the tail absorbed at 65535
    val vals = Seq(("g", 10L), ("g", 70000L), ("g", 65535L), ("g", 200000L))
    def rootOf(df: org.apache.spark.sql.DataFrame): Long =
      Sketches.dyadicRegister(df, Seq("g"), "v")
        .filter(col("key") === Sketches.dyadicKey(16, 0L))
        .collect().headOption.map(_.getAs[Long]("cnt")).getOrElse(0L)
    assert(rootOf(vals.toDF("g", "v")) === 2L) // unclamped: 2 rows lost
    val clamped = vals.toDF("g", "v")
      .select(col("g"), least(greatest(col("v"), lit(0L)), lit(65535L)).as("v"))
    assert(rootOf(clamped) === 4L)
  }

  test("dyadicRankSelect: every rank returns the k-th smallest, incl. duplicates") {
    val rng = new scala.util.Random(11)
    // two groups, heavy duplication (values mod 50) so rank selection must
    // handle multi-count cells; plus the boundary ranks 1 and n
    val vals = (0 until 3000).map(i =>
      (if (i % 3 == 0) "a" else "b", (rng.nextInt(50)).toLong * 7L))
    val df = vals.toDF("g", "v")
    val reg = Sketches.dyadicRegister(df, Seq("g"), "v").localCheckpoint(true)
    val byG = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.toIndexedSeq }
    val ranks = byG.toSeq.flatMap { case (g, vs) =>
      Seq(1L, vs.size / 4L max 1L, vs.size / 2L, vs.size.toLong)
        .distinct.map(k => (g, k))
    }.toDF("g", "k")
    val got = Sketches.dyadicRankSelect(reg, Seq("g"), ranks, "k")
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("k")) ->
        r.getAs[Long]("value")).toMap
    for (((g, k), v) <- got)
      assert(v === byG(g)(k.toInt - 1), s"group $g rank $k")
  }
}
