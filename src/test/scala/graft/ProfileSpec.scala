package graft

import graft.operators.Profile

/** Single-pass DQ profiler semantics: null counting, distinct
  * counting (null-excluding, both engines' convention), one row per
  * profiled column.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, and distincts per column in one result") {
    val d = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("b"))).toDF("x", "s")
    val got = Profile.profile(d, Seq("x", "s"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "x" -> ((4L, 1L, 2L)), // countDistinct excludes the null
      "s" -> ((4L, 1L, 2L))))
  }

  test("rfmSegments: quartile thresholds score 1-4, ties share a bucket, decimal-exact monetary") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 00:00:00")
    // 4 customers with strictly increasing recency/frequency/monetary
    // → scores 1,2,3,4 on every axis; customer 5 ties customer 4's
    // monetary exactly (same bucket, not an arbitrary ntile split).
    val orders = (
      (1 to 1).map(_ => (1L, ts(1), 10.0)) ++
      (1 to 2).map(_ => (2L, ts(2), 20.0)) ++
      (1 to 3).map(_ => (3L, ts(3), 30.0)) ++
      (1 to 4).map(_ => (4L, ts(4), 40.0)) ++
      (1 to 4).map(_ => (5L, ts(4), 40.0))
    ).toDF("k", "t", "amt").withColumn("t", $"t".cast("timestamp_ntz"))
    val got = Profile.rfmSegments(orders, "k", "t", "amt")
      .as[(Long, Timestamp, Long, Double, Int, Int, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    // thresholds over (1,2,3,4,4) are (2,3,4): a value ON a cut stays
    // in the lower bucket (strict >), so c2 scores 1, c3 2, c4/c5 3
    assert(got(1L)._8 == "111" && got(2L)._8 == "111")
    assert(got(3L)._8 == "222" && got(4L)._8 == "333")
    assert(got(4L)._8 == got(5L)._8) // exact ties → same segment
    assert(got(4L)._3 == 4L && got(4L)._4 == 160.0)
    // monotone: each axis score is non-decreasing in its metric
    for (axis <- Seq(5, 6, 7)) {
      val scores = Seq(1L, 2L, 3L, 4L).map(k =>
        got(k).productElement(axis - 1).asInstanceOf[Int])
      assert(scores == scores.sorted, s"axis $axis not monotone: $scores")
    }
  }

  test("chiSquare: hand-computed 2x2, zero on independence, N on full association") {
    import org.apache.spark.sql.functions.col
    def table(cells: (String, String, Int)*) =
      cells.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }.toDF("a", "b")
    // O = [[10,20],[20,10]]: all E=15, chi2 = 4·(25/15) = 20/3, dof 1,
    // V = sqrt((20/3)/60) = 1/3
    val r1 = Profile.chiSquare(
      table(("a", "x", 10), ("a", "y", 20), ("b", "x", 20), ("b", "y", 10)),
      col("a"), col("b")).collect()(0)
    assert(r1.getLong(0) == 60L && r1.getLong(1) == 1L)
    assert(math.abs(r1.getDouble(2) - 20.0 / 3.0) < 1e-12)
    assert(math.abs(r1.getDouble(3) - 1.0 / 3.0) < 1e-12)
    // proportional rows → independent → chi2 exactly 0
    val r2 = Profile.chiSquare(
      table(("a", "x", 2), ("a", "y", 4), ("b", "x", 3), ("b", "y", 6)),
      col("a"), col("b")).collect()(0)
    assert(r2.getDouble(2) == 0.0)
    // diagonal-only (zero-observed off-cells still contribute): chi2 = N
    val r3 = Profile.chiSquare(
      table(("a", "x", 5), ("b", "y", 5)), col("a"), col("b")).collect()(0)
    assert(math.abs(r3.getDouble(2) - 10.0) < 1e-12)
    assert(math.abs(r3.getDouble(3) - 1.0) < 1e-12)
  }

  test("mannWhitney: exact U on separated and tied samples, tie-corrected z") {
    import org.apache.spark.sql.functions.col
    // disjoint: A=[1,2,3] < B=[4,5,6] → U_A = 0, z = −4.5/√5.25
    val d1 = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val r1 = Profile.mannWhitney(d1, col("g"), col("v")).collect()(0)
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 3L)
    assert(r1.getDouble(4) == 0.0)
    assert(math.abs(r1.getDouble(5) - (-4.5 / math.sqrt(5.25))) < 1e-12)
    // ties across groups: A=[1,2,2], B=[2,3,4] → avg rank of the 2s is
    // 3 (doubled-int exact), R_A=7, U_A=1; tie3=24 → σ²=4.65
    val d2 = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 2), ("b", 3), ("b", 4))
      .toDF("g", "v")
    val r2 = Profile.mannWhitney(d2, col("g"), col("v")).collect()(0)
    assert(r2.getDouble(4) == 1.0)
    assert(math.abs(r2.getDouble(5) - (-3.5 / math.sqrt(4.65))) < 1e-12)
  }

  test("benford: hand-computed digit table; sub-unit values excluded") {
    import org.apache.spark.sql.functions.col
    // digits 1..9 once each, plus 0.5 (excluded: first significant
    // digit of sub-unit magnitudes is out of scope) and 1234 (digit 1)
    val d = ((1 to 9).map(_.toDouble) ++ Seq(0.5, 1234.0)).toDF("v")
    val got = Profile.benford(d, col("v"))
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 9)
    assert(got(1)._2 == 2L && got(2)._2 == 1L && got(9)._2 == 1L)
    assert(got(1)._3 == 10L) // 0.5 excluded from N
    val p1 = 0.301029996
    assert(math.abs(got(1)._4 - p1) < 1e-15)
    val expTerm = (2.0 - 10.0 * p1) * (2.0 - 10.0 * p1) / (10.0 * p1)
    assert(math.abs(got(1)._5 - expTerm) < 1e-12)
    // a digit absent from the data still contributes its expected mass
    val only1 = Seq(1.0, 10.0, 100.0).toDF("v")
    val z = Profile.benford(only1, col("v"))
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(z(5)._2 == 0L && z(5)._5 > 0.0)
  }

  test("spearman: hand-computed tied case, ±1 on monotone data, NULL on constants") {
    import org.apache.spark.sql.functions.col
    // (x, y) with ties both sides: average ranks x = 1, 2.5, 2.5, 4;
    // y = 1, 2, 3.5, 3.5 → Pearson over ranks = 3.75/4.5 = 5/6
    val d = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 2L, 30L),
      ("a", 3L, 30L)).toDF("g", "x", "y")
    val r = Profile.spearman(d, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].head()
    assert(r._1 == "a" && r._2 == 4L)
    assert(math.abs(r._3.get - 5.0 / 6.0) < 1e-12)
    // strictly monotone (nonlinear) → ±1 up to the √s·√s ulp (the
    // fixed tree divides by sqrt(sxx)·sqrt(syy), not by sxx exactly)
    val m = Seq(("u", 1L, 1L), ("u", 2L, 100L), ("u", 3L, 101L),
      ("v", 1L, 9L), ("v", 2L, 5L), ("v", 3L, 1L)).toDF("g", "x", "y")
    val got = Profile.spearman(m, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3).toMap
    assert(math.abs(got("u").get - 1.0) < 1e-12)
    assert(math.abs(got("v").get + 1.0) < 1e-12)
    // zero variance in either variable → NULL, not NaN
    val z = Seq(("c", 5L, 1L), ("c", 5L, 2L)).toDF("g", "x", "y")
    assert(Profile.spearman(z, col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double])].head()._3.isEmpty)
  }

  test("anovaF: hand-computed two-group F, zero on equal means, NULL degenerates") {
    import org.apache.spark.sql.functions.col
    // (1,2,3) vs (4,5,6): SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5
    val d = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val r = Profile.anovaF(d, col("g"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(r._1 == 2L && r._2 == 6L)
    assert(math.abs(r._3.get - 13.5) < 1e-12)
    assert(math.abs(r._4.get - 13.5 / 17.5) < 1e-12)
    // equal group means, positive within-variance → F exactly 0
    val e = Seq(("a", 1), ("a", 3), ("b", 2), ("b", 2)).toDF("g", "v")
    val r2 = Profile.anovaF(e, col("g"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(r2._3.contains(0.0))
    // a single group cannot test between-variance → NULL
    val one = Seq(("a", 1), ("a", 2)).toDF("g", "v")
    assert(Profile.anovaF(one, col("g"), col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].head()._3.isEmpty)
  }

  test("ksTest: exact D on hand-built samples; identical samples score 0") {
    import org.apache.spark.sql.functions.col
    // A=[1,2,3,4], B=[3,4,5,6]: D = |F_A − F_B| peaks at v=2:
    // F_A=2/4, F_B=0 → d_num = |2·4 − 0·4| = 8, D = 8/16 = 0.5
    val d1 = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 3), ("b", 4), ("b", 5), ("b", 6)).toDF("g", "v")
    val r1 = Profile.ksTest(d1, col("g"), col("v")).collect()(0)
    assert(r1.getLong(2) == 4L && r1.getLong(3) == 4L)
    assert(r1.getLong(4) == 8L && r1.getDouble(5) == 0.5)
    // identical distributions → D exactly 0
    val d2 = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("g", "v")
    val r2 = Profile.ksTest(d2, col("g"), col("v")).collect()(0)
    assert(r2.getLong(4) == 0L && r2.getDouble(5) == 0.0)
    // disjoint supports → D exactly 1
    val d3 = Seq(("a", 1), ("a", 2), ("b", 9), ("b", 10)).toDF("g", "v")
    val r3 = Profile.ksTest(d3, col("g"), col("v")).collect()(0)
    assert(r3.getDouble(5) == 1.0)
  }

  test("olsFit: exact fit on a perfect line; NULLs on degenerate groups") {
    import org.apache.spark.sql.functions.col
    // y = 3x + 2 exactly → slope 3, intercept 2, r² 1 with NO tolerance
    val d1 = Seq(("g", 1, 5), ("g", 2, 8), ("g", 3, 11), ("g", 4, 14))
      .toDF("g", "x", "y")
    val r1 = Profile.olsFit(d1, Seq(col("g")), col("x"), col("y")).collect()(0)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == 3.0 && r1.getDouble(3) == 2.0 &&
      r1.getDouble(4) == 1.0)
    // known non-trivial fit: (1,2),(2,3),(3,5) → slope 3/2, intercept 1/3
    val d2 = Seq(("g", 1, 2), ("g", 2, 3), ("g", 3, 5)).toDF("g", "x", "y")
    val r2 = Profile.olsFit(d2, Seq(col("g")), col("x"), col("y")).collect()(0)
    assert(math.abs(r2.getDouble(2) - 1.5) < 1e-15)
    assert(math.abs(r2.getDouble(3) - 1.0 / 3.0) < 1e-15)
    // r² = num²/(dx·dy) = (3·23−6·10)²/((3·14−36)(3·38−100)) = 81/(6·14)
    assert(math.abs(r2.getDouble(4) - 81.0 / 84.0) < 1e-15)
    // zero x-variance → NULL slope/intercept/r2; n=1 group → NULLs
    val d3 = Seq(("a", 2, 1), ("a", 2, 9), ("b", 7, 7)).toDF("g", "x", "y")
    val r3 = Profile.olsFit(d3, Seq(col("g")), col("x"), col("y"))
      .orderBy("__g0").collect()
    assert(r3(0).isNullAt(2) && r3(0).isNullAt(3) && r3(0).isNullAt(4))
    assert(r3(1).isNullAt(2) && r3(1).isNullAt(3) && r3(1).isNullAt(4))
    // zero y-variance: slope 0, intercept = ȳ, r² NULL (deny = 0)
    val d4 = Seq(("g", 1, 4), ("g", 2, 4), ("g", 3, 4)).toDF("g", "x", "y")
    val r4 = Profile.olsFit(d4, Seq(col("g")), col("x"), col("y")).collect()(0)
    assert(r4.getDouble(2) == 0.0 && r4.getDouble(3) == 4.0 && r4.isNullAt(4))
  }

  test("pairwiseCorr: exact ±1 on linear columns, NULL on zero variance") {
    val d = Seq(
      ("g", 1.0, 2.0, -1.0, 5.0),
      ("g", 2.0, 4.0, -2.0, 5.0),
      ("g", 3.0, 6.0, -3.0, 5.0)).toDF("g", "x", "y", "z", "c")
    val got = Profile.pairwiseCorr(d, $"g", Seq("x", "y", "z", "c"))
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // √ of the variance product isn't exactly representable — allow
    // one ulp-scale slack around ±1 (the VALUE is deterministic; the
    // oracle hash-match is what pins it bit-for-bit)
    assert(math.abs(got(("x", "y")).get - 1.0) < 1e-12)  // y = 2x
    assert(math.abs(got(("x", "z")).get + 1.0) < 1e-12)  // z = -x
    assert(got(("x", "c")) == None)       // constant → zero variance
    assert(got.size == 6)                 // all 4·3/2 pairs emitted
  }

  test("welchTTest: hand-computed t/df on a known pair; degenerate n=1 yields NULL") {
    import org.apache.spark.sql.functions.col
    // A = [1..5]: mean 3, var 2.5; B = [2,4,..,12]: mean 7, var 14
    // t = −4/√(2.5/5 + 14/6) ≈ −2.376354; Welch–Satterthwaite df ≈ 6.97226
    val d = (Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) ++
      Seq.tabulate(6)(i => ("b", 2.0 * (i + 1))) ++
      Seq(("c", 9.0))).toDF("g", "v")
    val rows = Profile.welchTTest(d, col("g"), col("v")).collect()
      .map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b")) -> r).toMap
    val ab = rows(("a", "b"))
    assert(math.abs(ab.getAs[Double]("t_stat") - (-2.3763541031440183)) < 1e-12)
    assert(math.abs(ab.getAs[Double]("df") - 6.9722557297949335) < 1e-9)
    assert(ab.getAs[Double]("mean_a") == 3.0 && ab.getAs[Double]("mean_b") == 7.0)
    // group c has n=1: both its pairs are NULL-guarded, means still real
    assert(rows(("a", "c")).isNullAt(rows(("a", "c")).fieldIndex("t_stat")))
    assert(rows(("b", "c")).isNullAt(rows(("b", "c")).fieldIndex("df")))
    assert(rows.size == 3)
  }

  test("kruskalWallis: hand-computed tie-corrected H; degenerate single row NULL-guarded") {
    import org.apache.spark.sql.functions.col
    // a=[1,2,3,3,5] b=[3,4,4,6] c=[7,8,8]: N=12, midranks with ties,
    // H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) = 7.476923…,
    // tie term Σ(t³−t) = 6+6+6 = 18 ⇒ H' = H/(1−18/1716) = 7.637142…
    val d = (Seq(1, 2, 3, 3, 5).map(("a", _)) ++
      Seq(3, 4, 4, 6).map(("b", _)) ++
      Seq(7, 8, 8).map(("c", _))).toDF("g", "v")
    val r = Profile.kruskalWallis(d, col("g"), col("v")).collect().head
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n_rows") == 12)
    assert(math.abs(r.getAs[Double]("h_stat") - 7.476923076923079) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_corrected") - 7.637142857142859) < 1e-12)
    // permuting group labels of identical value multisets cannot move H
    val p = (Seq(1, 2, 3, 3, 5).map(("c", _)) ++
      Seq(3, 4, 4, 6).map(("a", _)) ++
      Seq(7, 8, 8).map(("b", _))).toDF("g", "v")
    val r2 = Profile.kruskalWallis(p, col("g"), col("v")).collect().head
    assert(math.abs(r2.getAs[Double]("h_stat") -
      r.getAs[Double]("h_stat")) < 1e-12)
    // n_rows == 1: the h expressions are NULL-guarded, counts real
    val one = Profile.kruskalWallis(Seq(("z", 7)).toDF("g", "v"),
      col("g"), col("v")).collect().head
    assert(one.getAs[Long]("n_rows") == 1 &&
      one.isNullAt(one.fieldIndex("h_stat")))
  }

  test("histogram: integer-cents bins are exact, width clamps on constants") {
    // cents 100..499 → lo=100, hi=499, width=ceil(400/4)=100
    val d = Seq(1.00, 1.99, 2.00, 3.50, 4.99).toDF("v")
    val got = Profile.histogram(d, $"v", bins = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 100L, 199L, 2L),  // 1.00, 1.99 — boundary 1.99 stays low
      (1L, 200L, 299L, 1L),  // 2.00 flips up exactly at the boundary
      (2L, 300L, 399L, 1L),
      (3L, 400L, 499L, 1L)))
    // all-identical values: width clamps to 1, single bin 0
    val const = Seq(7.77, 7.77, 7.77).toDF("v")
    assert(Profile.histogram(const, $"v", 5)
      .as[(Long, Long, Long, Long)].collect().toSet ==
      Set((0L, 777L, 777L, 3L)))
  }

  test("profile of an empty frame yields zero rows per column, not no rows") {
    val d = Seq.empty[(Option[Int], Option[String])].toDF("x", "s")
    val got = Profile.profile(d, Seq("x", "s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("x", 0L, 0L, 0L), ("s", 0L, 0L, 0L)))
  }

  test("expectations: NULL predicates count as failures (conservative convention)") {
    import org.apache.spark.sql.functions._
    val d = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, null))
      .toDF("x", "s")
    val got = Profile.expectations(d, Seq(
        // x > 0 is NULL on the null row → must count as a failure
        "pos:x" -> (col("x") > 0),
        "set:s" -> col("s").isin("a", "b")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("pos:x") == ((3L, 1L, false)))
    assert(got("set:s") == ((3L, 1L, false)))
  }

  test("expectUnique surplus and expectForeignKey orphans (null key = orphan)") {
    import org.apache.spark.sql.functions._
    val child = Seq[(java.lang.Long, String)]((1L, "r1"), (1L, "r2"), (2L, "r3"),
      (9L, "r4"), (null, "r5")).toDF("k", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val uniq = Profile.expectUnique(child, "v")
      .as[(String, Long, Long, Boolean)].head()
    assert(uniq == (("unique:v", 5L, 0L, true)))
    val dupk = Profile.expectUnique(child, "k")
      .as[(String, Long, Long, Boolean)].head()
    // 5 rows, 3 distinct non-null keys → surplus 2 (the dup 1 AND the null)
    assert(dupk == (("unique:k", 5L, 2L, false)))
    val fk = Profile.expectForeignKey(child, "k", parent, "pk", "parent")
      .as[(String, Long, Long, Boolean)].head()
    // 9L unmatched + null key → 2 orphans
    assert(fk == (("fk:k->parent.pk", 5L, 2L, false)))
  }
}
