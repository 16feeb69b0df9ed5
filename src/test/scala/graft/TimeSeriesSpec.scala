package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Gap-fill semantics on a stream with a known hole. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  test("gapFillHourly synthesizes missing hours, flags them, forward-fills values") {
    // key A: hours 1, 2, 5 occupied (3-4 are a hole); key B: hour 2 only
    val e = Seq(
      ("A", ts(1), 10.0), ("A", ts(2), 5.0), ("A", ts(2), 5.0), ("A", ts(5), 7.0),
      ("B", ts(2), 1.0),
    ).toDF("k", "t", "value")
    val out = TimeSeries.gapFillHourly(e, "k", "t",
        sum(col("value").cast("decimal(18,2)")).cast("double"))
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "01", false, 10.0),
      ("A", "02", false, 10.0), // two rows in hour 2 aggregate first
      ("A", "03", true, 10.0),  // hole: flagged + carries hour-2 total
      ("A", "04", true, 10.0),
      ("A", "05", false, 7.0),
      ("B", "02", false, 1.0))) // single-bucket key: 1-row grid, no gaps
  }

  test("gapFillHourly grid is per-key bounded (no cross-key hour bleed)") {
    val e = Seq(("A", ts(1), 1.0), ("B", ts(20), 2.0)).toDF("k", "t", "value")
    val out = TimeSeries.gapFillHourly(e, "k", "t", sum(col("value")))
    assert(out.count() == 2) // neither key inherits the other's span
    assert(out.filter(col("is_gap")).count() == 0)
  }

  private def tsm(m: Int) = Timestamp.valueOf(f"2026-01-01 01:$m%02d:00")

  test("ewma: seeded recursion matches an in-memory fold; lookback truncates the tail") {
    val vals = Seq(10.0, 20.0, 5.0, 40.0, 15.0, 30.0)
    val e = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, ts(i + 1), v) }
      .toDF("k", "id", "t", "v")
    val full = TimeSeries.ewma(e, "k", "t", "id", "v", alpha = 0.3, lookback = 20)
      .orderBy("id").select("n_obs", "ewma")
      .as[(Long, Double)].collect()
    // reference: s_0 = v_0; s_i = 0.3 v_i + 0.7 s_{i-1}, rounded at read
    val ref = vals.tail.scanLeft(vals.head)((acc, x) => 0.3 * x + 0.7 * acc)
    assert(full.map(_._2).toSeq ==
      ref.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(full.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // lookback=3: row 5 folds only rows 3..5, seeded with row 3's value
    val short = TimeSeries.ewma(e, "k", "t", "id", "v", alpha = 0.3, lookback = 3)
      .orderBy("id").select("n_obs", "ewma").as[(Long, Double)].collect()
    val refShort = Seq(40.0, 15.0).foldLeft(5.0)((acc, x) => 0.3 * x + 0.7 * acc)
    assert(short(4)._1 == 3L && short(4)._2 ==
      BigDecimal(refShort).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("holt: fold matches in-memory reference; exact on linear series; closes EWMA lag") {
    val vals = Seq(10.0, 20.0, 5.0, 40.0, 15.0, 30.0)
    val e = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, ts(i + 1), v) }
      .toDF("k", "id", "t", "v")
    val out = TimeSeries.holt(e, "k", "t", "id", "v",
      alpha = 0.3, gamma = 0.1, lookback = 20)
      .orderBy("id").select("n_obs", "level", "trend", "forecast")
      .as[(Long, Double, Double, Double)].collect()
    // reference: l₁=v₁, b₁=0; l=αx+(1−α)(l+b), b=γ(l'−l)+(1−γ)b
    var l = vals.head; var b = 0.0
    val ref = Seq((l, b)) ++ vals.tail.map { x =>
      val ln = 0.3 * x + 0.7 * (l + b); b = 0.1 * (ln - l) + 0.9 * b; l = ln; (l, b)
    }
    assert(out.map(r => (r._2, r._3)).toSeq == ref)
    assert(out.forall(r => r._4 == r._2 + r._3))
    // α=γ=1 on an exactly linear series: level tracks x, trend = slope,
    // one-step forecast is EXACT from the third point on
    val lin = (0 until 8).map(i => (1L, i.toLong, ts(i + 1), 3.0 + 2.0 * i))
      .toDF("k", "id", "t", "v")
    val f = TimeSeries.holt(lin, "k", "t", "id", "v",
      alpha = 1.0, gamma = 1.0, lookback = 20)
      .orderBy("id").select("forecast").as[Double].collect()
    for (i <- 2 until 7) assert(f(i) == 3.0 + 2.0 * (i + 1), s"row $i")
    // on a drifting series the trended forecast beats plain EWMA
    val drift = (0 until 20).map(i => (1L, i.toLong, ts(i + 1), 10.0 + 5.0 * i))
      .toDF("k", "id", "t", "v")
    val h = TimeSeries.holt(drift, "k", "t", "id", "v").orderBy("id")
      .select("forecast").as[Double].collect()
    val w = TimeSeries.ewma(drift, "k", "t", "id", "v").orderBy("id")
      .select("ewma").as[Double].collect()
    val next = (i: Int) => 10.0 + 5.0 * (i + 1)
    val holtErr = (10 until 19).map(i => math.abs(h(i) - next(i))).sum
    val ewmaErr = (10 until 19).map(i => math.abs(w(i) - next(i))).sum
    assert(holtErr < ewmaErr / 2,
      s"holt $holtErr should close ewma's lag $ewmaErr")
  }

  test("acf: alternating series gives exact ±(n−ℓ)/n; constant series NULL-guarded") {
    // c_t = ±10.00 alternating, mean 0: r_ℓ = (−1)^ℓ·(n−ℓ)/n exactly
    val alt = (0 until 10).map(i =>
      (1L, i.toLong, ts(i + 1), if (i % 2 == 0) 10.0 else -10.0))
      .toDF("k", "id", "t", "v")
    val r = TimeSeries.acf(alt, "k", "t", "id", "v", maxLag = 4)
      .orderBy("lag").select("lag", "n_pairs", "acf")
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      (1L, 9L, -0.9), (2L, 8L, 0.8), (3L, 7L, -0.7), (4L, 6L, 0.6)))
    // zero-variance series: denominator 0 → NULL, not a division error
    val const = (0 until 5).map(i => (1L, i.toLong, ts(i + 1), 7.0))
      .toDF("k", "id", "t", "v")
    val c = TimeSeries.acf(const, "k", "t", "id", "v", maxLag = 2).collect()
    assert(c.length == 2 && c.forall(_.isNullAt(3)))
  }

  test("madOutliers: flags the planted spike the mean-based z-score masks; constant series dropped") {
    // 20 calm points + TWO extreme spikes: the spikes inflate the
    // stddev enough to matter for mean-based scoring, the median/MAD
    // pair shrugs them off
    val vals = (0 until 20).map(i => 10.0 + (i % 3)) ++ Seq(500.0, 480.0)
    val d = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, ts(i + 1), v) }
      .toDF("k", "id", "tt", "v")
    val out = TimeSeries.madOutliers(d, "k", "tt", "id", "v").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("robust_z")).toMap
    assert(out.keySet == Set(20L, 21L), s"flagged ${out.keySet}")
    assert(out.values.forall(_ > 3.0))
    // constant series: MAD = 0 → dropped, not a division error
    val const = (0 until 6).map(i => (2L, (100 + i).toLong, ts(i + 1), 5.0))
      .toDF("k", "id", "tt", "v")
    assert(TimeSeries.madOutliers(const, "k", "tt", "id", "v").isEmpty)
  }

  test("decompose: components sum back to the value; edges dropped; trend flat on linear data") {
    import java.sql.Timestamp
    // hourly ticks: linear trend + deterministic hour wobble
    val rows = (0 until 120).map { i =>
      val t = Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      (1L, i.toLong, t, 100.0 + 0.5 * i + (if (i % 24 < 12) 5.0 else -5.0))
    }
    val df = rows.toDF("k", "t", "ts", "v")
      .select(col("k"), col("t").as("id"), col("ts"), col("v"))
    val out = TimeSeries.decompose(df, "k", "ts", "id", "v", half = 12)
      .collect()
    // 120 rows minus 12 at each edge
    assert(out.length == 120 - 24)
    for (r <- out) {
      val v = r.getAs[Double]("v")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(v - sum) < 1e-9, s"decomposition identity: $v vs $sum")
    }
    // a 25-row centered MA of trend+wobble: the wobble has period 24,
    // so the MA is nearly linear — successive trend deltas ≈ 0.5
    val tr = out.sortBy(_.getAs[Long]("id")).map(_.getAs[Double]("trend"))
    for (i <- 1 until tr.length)
      assert(math.abs(tr(i) - tr(i - 1) - 0.5) < 0.5, s"trend jump at $i")
  }

  test("transitionMatrix: per-key ordered steps, row-normalized probabilities") {
    // user 1: a→b→a→b  (a→b ×2, b→a ×1); user 2: a→a→c (a→a, a→c)
    val e = Seq(
      (1L, 1L, ts(1), "a"), (1L, 2L, ts(2), "b"),
      (1L, 3L, ts(3), "a"), (1L, 4L, ts(4), "b"),
      (2L, 5L, ts(1), "a"), (2L, 6L, ts(2), "a"), (2L, 7L, ts(3), "c"),
    ).toDF("k", "id", "t", "state")
    val out = TimeSeries.transitionMatrix(e, "k", "t", "id", "state")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out == Map(
      ("a", "b") -> (2L, 0.5), ("a", "a") -> (1L, 0.25),
      ("a", "c") -> (1L, 0.25), ("b", "a") -> (1L, 1.0)))
    // probabilities sum to 1 within each from_state
    val sums = out.toSeq.groupBy(_._1._1)
      .map { case (f, rs) => f -> rs.map(_._2._2).sum }
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("rollingZScore flags a planted spike; baseline excludes the row itself") {
    // 12 calm observations (alternating 10/12) then a spike of 100.
    val calm = (0 until 12).map(i =>
      (i.toLong, "A", tsm(i), if (i % 2 == 0) 10.0 else 12.0))
    val e = (calm :+ (12L, "A", tsm(12), 100.0))
      .toDF("id", "k", "t", "value")
    val out = TimeSeries.rollingZScore(e, "k", "t", "id", "value",
        lookback = 20, minBaseline = 10, zThreshold = 3.0)
      .orderBy("id")
      .select("id", "n_base", "is_anomaly")
      .as[(Long, Long, Boolean)].collect().toSeq
    // ids 0-9 have < 10 priors → dropped; 10, 11 calm; 12 is the spike
    assert(out.map(_._1) == Seq(10L, 11L, 12L))
    assert(out.map(_._3) == Seq(false, false, true))
    // the spike's baseline is the 12 calm priors, itself excluded
    assert(out.last._2 == 12L)
    // calm series → z magnitudes ≈ 1; the spike is way out
    val z = TimeSeries.rollingZScore(e, "k", "t", "id", "value")
      .orderBy("id").select("z").as[Double].collect()
    assert(math.abs(z(0)) < 1.5 && math.abs(z(1)) < 1.5 && z(2) > 10)
  }

  test("rollingZScore drops zero-variance baselines instead of dividing by zero") {
    val e = ((0 until 11).map(i => (i.toLong, "A", tsm(i), 5.0))
      :+ (11L, "A", tsm(11), 9.0)).toDF("id", "k", "t", "value")
    // rows 10 (constant baseline) and 11 (constant baseline, jumped
    // value) both sit on zero variance → both dropped
    assert(TimeSeries.rollingZScore(e, "k", "t", "id", "value").isEmpty)
  }

  test("overlapCount: half-open overlap semantics, cross-bucket dedup, loners at zero") {
    import graft.operators.IntervalJoin
    def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
    val iv = Seq(
      // A overlaps B (long interval spans many buckets — must count B once)
      ("A", t("01:00:00"), t("05:00:00")),
      ("B", t("02:30:00"), t("03:10:00")),
      // C touches A end-to-start exactly: half-open => NOT overlapping
      ("C", t("05:00:00"), t("06:00:00")),
      // D is a loner
      ("D", t("20:00:00"), t("20:30:00")))
      .toDF("k", "s", "e")
    val got = IntervalJoin.overlapCount(iv, Seq("k"), "s", "e")
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1L, "B" -> 1L, "C" -> 0L, "D" -> 0L))
  }

  test("ohlcHourly: deterministic open/close under same-timestamp ties") {
    val e = Seq(
      // hour 1: ties on t resolved by id — open is id 0, close is id 3
      (0L, "A", tsm(0), 4.0), (1L, "A", tsm(0), 9.0),
      (2L, "A", tsm(30), 1.0), (3L, "A", tsm(30), 6.0),
      // hour 2, key B: single event — open=high=low=close
      (4L, "B", Timestamp.valueOf("2026-01-01 02:15:00"), 7.0))
      .toDF("id", "k", "t", "value")
    val out = TimeSeries.ohlcHourly(e, "k", "t", "id", "value")
      .orderBy("k")
      .select("k", "open", "high", "low", "close", "n_events", "total")
      .as[(String, Double, Double, Double, Double, Long, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("A", 4.0, 9.0, 1.0, 6.0, 4L, 20.0),
      ("B", 7.0, 7.0, 7.0, 7.0, 1L, 7.0)))
  }

  test("seasonalHourly: exact means on a crafted profile; invariant under repartitioning") {
    import java.sql.Timestamp
    def t(day: Int, h: Int) = Timestamp.valueOf(f"2026-01-0$day $h%02d:00:00")
    // series A, hour 1: values 10.00 and 11.00 → seasonal 10.5,
    // residuals ±0.5; hour 2: single 3.30 → residual 0
    val rows = Seq(
      (1L, "A", t(1, 1), 10.00), (2L, "A", t(2, 1), 11.00),
      (3L, "A", t(1, 2), 3.30), (4L, "B", t(1, 1), 7.77))
    val df = rows.toDF("log_id", "table", "ts", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.seasonalHourly(
        d, key = "table", ts = "ts", id = "log_id", value = "value")
        .as[(Long, String, Long, Double, Double, Double)].collect().toSet
    val got = run(df)
    assert(got == Set(
      (1L, "A", 1L, 10.00, 10.5, -0.5),
      (2L, "A", 1L, 11.00, 10.5, 0.5),
      (3L, "A", 2L, 3.30, 3.3, 0.0),
      (4L, "B", 1L, 7.77, 7.77, 0.0)))
    // the exact-cents discipline's point: identical output at any
    // partitioning (an FP-summed profile would not be)
    assert(run(df.repartition(1)) == got)
    assert(run(df.repartition(16)) == got)
  }

  test("changepoint: exact SSE-zero split on a clean shift; flat series ties to earliest day; single-day keys dropped") {
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")
    // A: daily totals 10,10,10,50,50,50 → split after day 3, SSE 0
    val rows = (1 to 3).map(d => (d.toLong, "A", t(d), 10.00)) ++
      (4 to 6).map(d => (d.toLong, "A", t(d), 50.00)) ++
      (1 to 4).map(d => (d.toLong + 10, "B", t(d), 7.00)) ++ // flat
      Seq((20L, "C", t(1), 3.00)) // one day: no split exists
    val df = rows.toDF("log_id", "table", "ts", "value")
    val got = graft.operators.TimeSeries.changepoint(
        df, key = "table", ts = "ts", value = "value")
      .as[(String, Long, Int, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val x3 = java.time.LocalDate.of(2026, 1, 3).toEpochDay.toInt
    assert(got("A") == (("A", 6L, x3, 3L, 0.0, 10.0, 50.0)))
    // flat series: every split costs 0.0 → tie broken by earliest day
    val x1 = java.time.LocalDate.of(2026, 1, 1).toEpochDay.toInt
    assert(got("B")._3 == x1 && got("B")._5 == 0.0)
    assert(!got.contains("C"))
    // split objective is optimal: no other split of A costs less
    // (shift day 4 off-center → still picks the true boundary)
    val skew = ((1 to 2).map(d => (d.toLong, "A", t(d), 10.00)) ++
      (3 to 6).map(d => (d.toLong, "A", t(d), 50.00)))
      .toDF("log_id", "table", "ts", "value")
    val g2 = graft.operators.TimeSeries.changepoint(
        skew, key = "table", ts = "ts", value = "value")
      .as[(String, Long, Int, Long, Double, Double, Double)].head()
    assert(g2._4 == 2L && g2._5 == 0.0 && g2._6 == 10.0 && g2._7 == 50.0)
  }

  test("theilSen: robust to an outlier day that wrecks OLS; single-day keys dropped") {
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")
    // daily totals 0,1,2,3,100 on consecutive days x₀..x₀+4: 6 of 10
    // pairwise slopes are exactly 1 → discrete median slope 1;
    // residuals y − 1·x = [−x₀ ×4, 96−x₀] → median intercept −x₀
    // (x in epoch days, so the intercept is at the 1970 origin;
    // fitted value at day x is x − x₀). OLS slope would be ≈ 19.
    val rows = Seq(
      (1L, "A", t(1), 0.00), (2L, "A", t(2), 1.00), (3L, "A", t(3), 2.00),
      (4L, "A", t(4), 3.00), (5L, "A", t(5), 100.00),
      (6L, "B", t(1), 5.00)) // one active day: no estimable trend
    val df = rows.toDF("log_id", "table", "ts", "value")
    val x0 = java.time.LocalDate.of(2026, 1, 1).toEpochDay.toDouble
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.theilSen(
        d, key = "table", ts = "ts", value = "value")
        .as[(String, Long, Long, Double, Double)].collect().toSet
    val got = run(df)
    assert(got == Set(("A", 5L, 10L, 1.0, -x0)))
    // two events on one day aggregate before pairing
    val df2 = df.union(Seq((7L, "A", t(5), 0.50)).toDF("log_id", "table", "ts", "value"))
    val g2 = run(df2).head
    assert(g2._1 == "A" && g2._2 == 5L && g2._3 == 10L)
    // partitioning-invariant (discrete medians over exact cents)
    assert(run(df.repartition(1)) == got)
    assert(run(df.repartition(16)) == got)
  }
}
