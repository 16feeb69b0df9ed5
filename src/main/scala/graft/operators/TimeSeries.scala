package graft.operators
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key time grid and forward-fill the gaps — the standard
  * feature-pipeline step between raw logs and anything windowed
  * (a model that reads "activity per key per hour" needs the quiet
  * hours to EXIST, carrying the last observation, not to be absent).
  *
  * The reference has no regular-grid operator (its logs are queried
  * ad hoc, `services/logService.js`), but its hourly-activity shape is
  * the batch face of the same semantics as the streaming windows
  * (`graft.streaming.Streams`) — this operator closes the gap between
  * the two.
  */
object TimeSeries {

  /** Exponentially weighted moving average per key:
    * `s_i = α·v_i + (1−α)·s_{i−1}`, seeded with the first observation,
    * over a bounded trailing window of `lookback` rows (the tail
    * beyond the window contributes < (1−α)^lookback ≈ 0.08% at the
    * defaults — the price of bounded per-row state). The classic
    * smoothing pass ahead of anomaly scoring and trend features.
    *
    * Determinism across engines: the fold is a LEFT fold in (ts, id)
    * window-frame order — both engines apply the identical IEEE
    * multiply-add chain, with (1−α) computed by the same double
    * subtraction — so results are bit-exact (the ordered-fold pattern
    * of `lmCrossEntropy`). Rounding is display-only.
    *
    * Scale shape: one shuffle by key for the window; the per-row
    * state is a `lookback`-bounded array (an UNBOUNDED PRECEDING
    * collect would be O(n²) memory per key) — skew-safe because the
    * frame, not the key's history, bounds the row.
    */
  def ewma(df: DataFrame, key: String, ts: String, id: String,
      value: String, alpha: Double = 0.3, lookback: Int = 20): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0,1]")
    require(lookback >= 1, "lookback must be >= 1")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val beta = 1.0 - alpha
    df.withColumn("__vals", collect_list(col(value).cast("double")).over(w))
      .withColumn("n_obs", size(col("__vals")).cast("long"))
      .withColumn("ewma", round(aggregate(
        slice(col("__vals"), lit(2), greatest(size(col("__vals")) - 1, lit(0))),
        element_at(col("__vals"), 1),
        (acc, x) => lit(alpha) * x + lit(beta) * acc), 4))
      .drop("__vals")
  }

  /** Holt DOUBLE exponential smoothing per key (Holt 1957): the
    * trended sibling of [[ewma]] — plain EWMA lags a drifting series
    * by design, Holt carries an explicit trend term and closes the
    * lag: `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = γ(l_t − l_{t−1}) + (1−γ)b_{t−1}`, seeded `l₁ = x₁,
    * b₁ = 0`, over the same bounded `lookback`-row trailing frame.
    * Emits the smoothed level, the trend, and the one-step-ahead
    * forecast `l_t + b_t` per observation.
    *
    * Determinism across engines: a LEFT fold in (ts, id) frame order
    * over a two-field struct accumulator; both engines evaluate the
    * IDENTICAL duplicated `l_t` subtree inside the `b_t` update (no
    * common-subexpression rewrite changes the IEEE result — it is the
    * same multiply-add chain either way), with (1−α)/(1−γ) computed by
    * the same double subtraction. Bit-exact vs the DuckDB
    * struct-accumulator `list_reduce` replay; rounding display-only.
    *
    * Scale shape: identical to [[ewma]] — one shuffle by key, state
    * bounded by the frame, skew-safe.
    */
  def holt(df: DataFrame, key: String, ts: String, id: String,
      value: String, alpha: Double = 0.3, gamma: Double = 0.1,
      lookback: Int = 20): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0,1]")
    require(gamma >= 0 && gamma <= 1, "gamma must be in [0,1]")
    require(lookback >= 1, "lookback must be >= 1")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val a = lit(alpha); val na = lit(1.0 - alpha)
    val g = lit(gamma); val ng = lit(1.0 - gamma)
    def lNew(acc: Column, x: Column): Column =
      a * x + na * (acc.getField("l") + acc.getField("b"))
    df.withColumn("__vals", collect_list(col(value).cast("double")).over(w))
      .withColumn("n_obs", size(col("__vals")).cast("long"))
      .withColumn("__st", aggregate(
        slice(col("__vals"), lit(2), greatest(size(col("__vals")) - 1, lit(0))),
        struct(element_at(col("__vals"), 1).as("l"), lit(0.0).as("b")),
        (acc, x) => struct(
          lNew(acc, x).as("l"),
          (g * (lNew(acc, x) - acc.getField("l")) + ng * acc.getField("b"))
            .as("b"))))
      // RAW doubles, deliberately unrounded: the fold is bit-identical
      // in both engines, so exact equality holds — while round(x, 4)
      // takes a half-boundary coin flip whenever the true value lands
      // on .xxxx5 (observed live at sf0.01: 59.20295 rounded 59.2029
      // by BigDecimal-of-shortest-repr vs 59.203 by scaled-double)
      .withColumn("level", col("__st").getField("l"))
      .withColumn("trend", col("__st").getField("b"))
      .withColumn("forecast",
        col("__st").getField("l") + col("__st").getField("b"))
      .drop("__vals", "__st")
  }

  /** Autocorrelation function per series at lags 1..`maxLag` (the
    * seasonality/memory detector that decides whether [[ewma]],
    * [[holt]], or [[seasonalHourly]] is the right smoother): the
    * standard biased estimator r_ℓ = Σ(x_t−x̄)(x_{t+ℓ}−x̄) / Σ(x_t−x̄)²
    * with the FULL-series mean in both factors.
    *
    * Exactness: values are exact cents c_t; with n, S=Σc, SS=Σc² and
    * per-lag pair sums P_ℓ=Σc_t·c_{t+ℓ}, A_ℓ=Σ_{t≤n−ℓ}c_t,
    * B_ℓ=Σ_{t>ℓ}c_t, m_ℓ=n−ℓ, multiplying the estimator through by n²
    * clears every division:
    * r_ℓ = (n²P_ℓ − nS(A_ℓ+B_ℓ) + m_ℓS²) / (n²SS − nS²) — EXACT
    * INTEGER numerator and denominator (DECIMAL(38,0) so n²P fits far
    * beyond the long range: safe to ~10³⁸, i.e. any per-series n where
    * n²·Σc² has < 38 digits), ONE double division at the end —
    * partitioning-independent and bit-identical across engines.
    *
    * Scale shape: one key-partitioned window computes every lag's lead
    * in a single pass, one map-side-combined groupBy per series, then
    * the lag unpivot is an inline explode of a maxLag-element array —
    * per-series state is a handful of integers regardless of length.
    */
  def acf(df: DataFrame, key: String, ts: String, id: String,
      value: String, maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
    val base = df.filter(col(value).isNotNull)
      .select(col(key), col(ts), col(id),
        (col(value).cast("decimal(18,2)") * 100).cast("long").as("__c"))
    val withLeads = (1 to maxLag).foldLeft(base) { (d, l) =>
      d.withColumn(s"__l$l", lead(col("__c"), l).over(w))
    }
    val lagAggs = (1 to maxLag).flatMap { l =>
      Seq(
        count(col(s"__l$l")).as(s"__m$l"),
        sum(when(col(s"__l$l").isNotNull, col("__c"))).as(s"__a$l"),
        sum(col(s"__l$l")).as(s"__b$l"),
        sum(col("__c") * col(s"__l$l")).as(s"__p$l"))
    }
    val allAggs = Seq(sum(col("__c")).as("__s"),
      sum(col("__c") * col("__c")).as("__ss")) ++ lagAggs
    val agg = withLeads.groupBy(col(key))
      .agg(count(lit(1)).as("__n"), allAggs: _*)
    def D(c: Column): Column = c.cast("decimal(38,0)")
    val den = D(col("__n")) * D(col("__n")) * D(col("__ss")) -
      D(col("__n")) * D(col("__s")) * D(col("__s"))
    val entries = (1 to maxLag).map { l =>
      val num = D(col("__n")) * D(col("__n")) * D(col(s"__p$l")) -
        D(col("__n")) * D(col("__s")) * (D(col(s"__a$l")) + D(col(s"__b$l"))) +
        D(col(s"__m$l")) * D(col("__s")) * D(col("__s"))
      struct(lit(l.toLong).as("lag"), col(s"__m$l").as("n_pairs"),
        when(den =!= lit(0) && col(s"__m$l") > 0,
          num.cast("double") / den.cast("double")).as("acf"))
    }
    agg.select(col(key), explode(array(entries: _*)).as("e"))
      .select(col(key), col("e.lag").as("lag"),
        col("e.n_pairs").as("n_pairs"), col("e.acf").as("acf"))
  }

  /** MAD-based robust outliers per series (Hampel's rule): flag rows
    * where |x − median| > 3·1.4826·MAD — the robust complement of
    * [[rollingZScore]], whose mean/stddev a single extreme value can
    * drag far enough to mask itself (median and MAD have a 50%
    * breakdown point; 1.4826 is the Gaussian consistency constant).
    *
    * Exactness: values double to EVEN cents (2c), so the interpolated
    * median is an integer-valued double, |2c − med2| is exact, and the
    * MAD of those deviations lands on .0/.5 — all exactly
    * representable, so the single-tree threshold compare and robust-z
    * division are bit-identical across engines. Zero-MAD (constant-
    * majority) series are dropped rather than divided by zero.
    *
    * Scale shape: two map-side-combined per-series aggregations (the
    * exact `percentile` keeps per-key state proportional to distinct
    * VALUES — cents-bounded here; swap `approx_percentile` for
    * unbounded-domain series) and two 1-row-per-series broadcast
    * join-backs.
    */
  def madOutliers(df: DataFrame, key: String, ts: String, id: String,
      value: String, k: Double = 3.0): DataFrame = {
    // base feeds the median agg AND the deviation join; dev feeds the
    // MAD agg AND the outlier filter — materialize the slim base once
    val base = df.filter(col(value).isNotNull)
      .select(col(key), col(id), col(value),
        ((col(value).cast("decimal(18,2)") * 100).cast("long") * 2).as("__c2"))
      .materialize()
    val med = base.groupBy(col(key))
      .agg(percentile(col("__c2"), lit(0.5)).as("__med2"))
    val dev = base.join(broadcast(med), Seq(key))
      .withColumn("__dev2", abs(col("__c2").cast("double") - col("__med2")))
    val mad = dev.groupBy(col(key))
      .agg(percentile(col("__dev2"), lit(0.5)).as("__mad2"))
    dev.join(broadcast(mad), Seq(key))
      .filter(col("__mad2") > lit(0.0) &&
        col("__dev2") > lit(k * 1.4826) * col("__mad2"))
      .select(col(key), col(id), col(value),
        (col("__dev2") / (lit(1.4826) * col("__mad2"))).as("robust_z"))
  }

  /** Classical additive decomposition (the moving-average STL
    * ancestor): value = trend + seasonal + remainder, with the trend a
    * CENTERED (2·half+1)-row moving average, the seasonal component
    * the hour-of-day mean of the detrended series, and the remainder
    * what's left. Rows whose centered window is incomplete (the first/
    * last `half` per series) are DROPPED — the standard
    * classical-decomposition edge behavior, and what keeps
    * the arithmetic exact: interior windows have EXACTLY 2·half+1
    * rows, so the scaled detrended value (2·half+1)·c − Σw is an
    * exact-integer long, the per-(series, hour) seasonal numerator is
    * an exact-integer sum, and every emitted double is ONE fixed FP
    * tree over exact integers (the `ts_seasonal` discipline; no
    * order-dependent double aggregation anywhere).
    *
    * The row-centered MA assumes roughly regular sampling — compose
    * with [[gapFillHourly]] first when the stream has holes.
    *
    * Scale shape: one key shuffle shared by the window and the
    * join-back; the seasonal profile is series×24 rows, broadcast.
    */
  def decompose(df: DataFrame, key: String, ts: String, id: String,
      value: String, half: Int = 12): DataFrame = {
    require(half >= 1, "half window must be >= 1")
    val width = 2 * half + 1
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(-half, half)
    val base = df.filter(col(value).isNotNull)
      .select(col(key), col(ts), col(id), col(value),
        (col(value).cast("decimal(18,2)") * 100).cast("long").as("__c"),
        hour(col(ts)).as("__hh"))
      .withColumn("__sw", sum(col("__c")).over(w))
      .withColumn("__nw", count(col("__c")).over(w))
    val interior = base.filter(col("__nw") === width)
      .withColumn("__det", lit(width.toLong) * col("__c") - col("__sw"))
    val prof = interior.groupBy(col(key), col("__hh"))
      .agg(sum(col("__det")).as("__sd"), count(lit(1)).as("__nh"))
    val joined = interior.join(broadcast(prof), Seq(key, "__hh"))
    val scale = lit((width * 100).toDouble)
    val seasonal = col("__sd").cast("double") /
      (col("__nh").cast("double") * scale)
    joined.select(col(key), col(ts), col(id), col(value),
      (col("__sw").cast("double") / scale).as("trend"),
      seasonal.as("seasonal"),
      (col("__det").cast("double") / scale - seasonal).as("remainder"))
  }

  /** Seasonal decomposition against an hour-of-day profile: per
    * (series, hour) seasonal means and per-observation residuals —
    * the classic detrending step before anomaly scoring or
    * forecasting. The profile aggregates EXACT CENTS (the
    * rolling-z-score discipline: DECIMAL(18,2)→long, summed as
    * integers), and the 4-decimal rounding itself happens in INTEGER
    * arithmetic — seasonal·10⁴ = round(s·100/n), resid·10⁴ =
    * round((c·n − s)·100/n), half away from zero via
    * `(2p + q) div (2q)` on a nonnegative-by-branch numerator — so
    * both outputs are partitioning-independent AND free of the FP
    * half-boundary coin flip a `round(double, 4)` takes when the true
    * value lands exactly on `.xxxx5` (n = 8 does this every odd
    * cents-sum; caught by the sf0.01 oracle gate). Exact while
    * `200·|cents|·n` fits a long — ≳4×10¹⁰ rows per (series, hour) at
    * $10k values. Profile is series×24 rows, broadcast back, map-only
    * join.
    */
  def seasonalHourly(df: DataFrame, key: String, ts: String, id: String,
      value: String): DataFrame = {
    val base = df
      .filter(col(value).isNotNull)
      .select(col(id), col(key), hour(col(ts)).as("hh"),
        col(value).cast("double").as("value"),
        (col(value).cast("decimal(18,2)") * 100).cast("long").as("__c"))
    val prof = base.groupBy(col(key), col("hh"))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("__n"))
    // round-half-away-from-zero of p/q (q > 0) in pure integers; both
    // branches keep the numerator nonnegative, where Spark's
    // truncating `div` and DuckDB's flooring `//` coincide
    def rnd(p: String): String =
      s"CASE WHEN $p >= 0 THEN (2 * ($p) + __n) div (2 * __n) " +
        s"ELSE -((2 * (-($p)) + __n) div (2 * __n)) END"
    base.join(broadcast(prof), Seq(key, "hh"))
      .withColumn("__sea4", expr(rnd("__s * 100")))
      .withColumn("__res4", expr(rnd("(__c * __n - __s) * 100")))
      .select(col(id), col(key), col("hh").cast("long").as("hh"), col("value"),
        (col("__sea4").cast("double") / 10000.0).as("seasonal"),
        (col("__res4").cast("double") / 10000.0).as("resid"))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: for every observed (state → next-state) step, the
    * count and the row-normalized transition probability
    * `P(to | from) = n / Σ_to n`. The standard summary fed to
    * next-action models, anomaly scoring (improbable transitions),
    * and funnel diagnostics.
    *
    * Determinism: counts are exact integers; the probability is ONE
    * double division, rounded once for display.
    *
    * Scale shape: the `lead` window shuffles the stream once by key
    * (key-local ordering, no global sort); the (from, to) count is
    * map-side-combined onto |states|² keys, and the per-from
    * normalizing sum is a window over those same few rows — nothing
    * downstream of the first shuffle exceeds |states|² rows.
    */
  def transitionMatrix(
      df: DataFrame, key: String, ts: String, id: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
    df.select(col(state).as("from_state"),
        lead(col(state), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("prob", round(
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_state")))
            .cast("double"), 4))
  }

  /** Hourly grid per `key` over `[min(bucket), max(bucket)]` of that
    * key, `valueAgg` aggregated per occupied bucket, empty buckets
    * marked `is_gap` and forward-filled from the most recent occupied
    * bucket. First grid row per key is never a gap (the grid starts at
    * an occupied bucket), so `v_filled` is total.
    *
    * Scale shape: the raw stream collapses FIRST (map-side-combined
    * groupBy to |keys|×|hours| rows — the only pass over the events);
    * grid synthesis explodes a bounded `sequence` per key; the
    * grid⋈hourly join and the forward-fill window both shuffle only
    * grid-sized data by key. Keys are time-bucket-bounded, so no
    * per-key partition exceeds |hours| rows — skew-free by
    * construction.
    */
  def gapFillHourly(
      events: DataFrame, key: String, ts: String, valueAgg: Column): DataFrame = {
    val hourly = events
      .groupBy(col(key), date_trunc("hour", col(ts)).as("bucket"))
      .agg(valueAgg.as("v"))
    val grid = hourly.groupBy(col(key))
      .agg(min(col("bucket")).as("__h0"), max(col("bucket")).as("__h1"))
      .select(col(key),
        explode(sequence(col("__h0"), col("__h1"), expr("INTERVAL 1 HOUR")))
          .as("bucket"))
    grid.join(hourly, Seq(key, "bucket"), "left")
      .withColumn("is_gap", col("v").isNull)
      .withColumn("v_filled",
        last(col("v"), ignoreNulls = true).over(
          Window.partitionBy(key).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("v")
  }

  /** Rolling z-score anomaly detection: each observation scored against
    * the mean/stddev of its key's `lookback` PRECEDING observations
    * (current row excluded — an outlier must not dilute its own
    * baseline). Rows with fewer than `minBaseline` priors or a
    * degenerate (zero-variance) baseline are dropped: no score is
    * honest there.
    *
    * Numeric contract (DuckDB oracle parity): the window sums run on
    * exact DECIMAL(18,2) — order-independent, so Spark's running frame
    * and DuckDB's segment tree agree bit-for-bit — and every floating
    * step after them is ONE fixed expression tree evaluated identically
    * on both engines (mean = s/n, var = (ss − s²/n)/(n−1), z =
    * (v − mean)/√var), rounded once for display.
    *
    * Scale shape: one shuffle (hash by key for the window); the frame
    * is a bounded `lookback` rows, so per-row cost is O(lookback) and
    * per-key state is bounded regardless of key skew — a hot key costs
    * one long sorted run, not a blow-up.
    */
  def rollingZScore(
      events: DataFrame, key: String, ts: String, tieBreak: String,
      value: String, lookback: Int = 20, minBaseline: Int = 10,
      zThreshold: Double = 3.0): DataFrame = {
    val fr = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
      .rowsBetween(-lookback, -1)
    val dv = col(value).cast("decimal(18,2)")
    val scored = events
      .filter(col(value).isNotNull)
      .select(col(tieBreak), col(key), col(ts), col(value),
        count(dv).over(fr).as("n_base"),
        sum(dv).over(fr).cast("double").as("__s"),
        sum(dv * dv).over(fr).cast("double").as("__ss"))
    val nd = col("n_base").cast("double")
    val mean = col("__s") / nd
    val variance = (col("__ss") - col("__s") * col("__s") / nd) / (nd - lit(1.0))
    scored
      .withColumn("__z", (col(value) - mean) / sqrt(variance))
      .filter(col("n_base") >= minBaseline && variance > lit(0.0))
      .select(col(tieBreak), col(key), col(ts), col(value), col("n_base"),
        round(col("__z"), 4).as("z"),
        (abs(col("__z")) > lit(zThreshold)).as("is_anomaly"))
  }

  /** OHLC downsampling: per key per hour, the open (first), high, low,
    * close (last) of `value`, with event count and exact-decimal total
    * — the standard lossy compaction from tick-level telemetry to
    * chartable hourly candles. First/last are made deterministic by
    * the `(ts, tieBreak)` total order, not arrival order.
    *
    * Scale shape: both row_number windows share one hash partitioning
    * on (key, bucket) — a single shuffle, two in-partition sorts —
    * and the final aggregation is map-side combinable on the same
    * keys. Partitions are hour-bounded: skew caps at one key-hour.
    */
  def ohlcHourly(
      events: DataFrame, key: String, ts: String, tieBreak: String,
      value: String): DataFrame = {
    val bucketed = events
      .filter(col(value).isNotNull)
      .withColumn("bucket", date_trunc("hour", col(ts)))
    val asc = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col(ts).asc, col(tieBreak).asc)
    val desc = Window.partitionBy(col(key), col("bucket"))
      .orderBy(col(ts).desc, col(tieBreak).desc)
    bucketed
      .withColumn("__rna", row_number().over(asc))
      .withColumn("__rnd", row_number().over(desc))
      .groupBy(col(key), col("bucket"))
      .agg(
        max(when(col("__rna") === 1, col(value))).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max(when(col("__rnd") === 1, col(value))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("total"))
  }

  /** Theil–Sen robust trend per series: the median of all pairwise
    * slopes between DAILY aggregates, with the intercept the median
    * residual at that slope — the estimator with a 29.3% breakdown
    * point (Sen 1968), immune to the outlier days that drag
    * [[graft.operators.Profile.olsFit]]'s least-squares line around.
    *
    * Medians are DISCRETE (lower-median element selection via
    * `row_number`, ties broken by the pair's day indices), never an
    * interpolated average — so the picked value is one of the actual
    * slopes and the whole computation replays exactly: daily sums are
    * exact cents longs, each pairwise slope ONE IEEE division of
    * exactly-converted integers, and the sort order on (slope, xa,
    * xb) is total. The only remaining FP is the final /100 display
    * scaling.
    *
    * Scale shape: Theil–Sen is O(n²) in observations, so the operator
    * aggregates to the bounded DAY grid first — pairs per key are
    * days², independent of row count; the pair join is an equi-join
    * on the key, the median picks are per-key window sorts over
    * bounded rows. Keys with a single active day have no pairs and
    * are dropped (no trend is estimable).
    */
  /** Single best mean-shift changepoint per key — the binary-
    * segmentation step (Scott & Knott 1974; the unit step of PELT/
    * BinSeg): over the DAILY exact-cents series, pick the split t
    * minimizing SSE_left + SSE_right. The CUSUM peak (`ts_cusum`)
    * locates the max deviation of one statistic; this optimizes the
    * actual segmentation objective — the two agree on clean shifts
    * and differ exactly when variance structure matters.
    *
    * Determinism: daily totals are exact cents LONGs; prefix/total
    * sums of squares ride DECIMAL(38,0) (cents² at a large SF
    * overflows 64-bit — the [[acf]] discipline); each candidate's
    * cost is ONE fixed IEEE tree over single casts of those exact
    * moments, and the argmin is the lexicographic min of
    * (cost, day) — double comparison of identical doubles, tie
    * broken by earliest day. Bit-reproducible, oracle-replayable.
    *
    * Shape at scale: one shuffle aggregates rows to the per-key DAY
    * grid; every window after runs on days-per-key rows
    * (row-count-independent, the [[theilSen]] bound); the argmin is a
    * map-side-combined min(struct). No joins.
    */
  def changepoint(df: DataFrame, key: String, ts: String,
      value: String): DataFrame = {
    val daily = df.filter(col(value).isNotNull)
      .groupBy(col(key).as("k"), unix_date(to_date(col(ts))).as("x"))
      .agg(sum((col(value).cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
    val y2 = (col("yc").cast("decimal(19,0)") *
      col("yc").cast("decimal(19,0)")).cast("decimal(38,0)")
    val seq = Window.partitionBy("k").orderBy("x")
    val run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy("k")
    val pre = daily
      .withColumn("t", row_number().over(seq).cast("long"))
      .withColumn("sl", sum(col("yc")).over(run))
      .withColumn("ql", sum(y2).over(run))
      .withColumn("n", count(lit(1)).over(full))
      .withColumn("s", sum(col("yc")).over(full))
      .withColumn("q", sum(y2).over(full))
      .filter(col("t") < col("n")) // split leaves both sides non-empty
    def d(c: String): Column = col(c).cast("double")
    val cost =
      (d("ql") - d("sl") * d("sl") / d("t")) +
        ((d("q") - d("ql")) -
          (d("s") - d("sl")) * (d("s") - d("sl")) / (d("n") - d("t")))
    pre.withColumn("cost", cost)
      .groupBy("k")
      .agg(min(struct(col("cost"), col("x"), col("t"), col("n"),
        col("sl"), col("s"))).as("m"))
      .select(col("k").as(key), col("m.n").as("n_days"),
        col("m.x").as("split_x"), col("m.t").as("n_left"),
        col("m.cost").as("sse"),
        (col("m.sl").cast("double") / col("m.t").cast("double") /
          lit(100.0)).as("mean_left"),
        ((col("m.s") - col("m.sl")).cast("double") /
          (col("m.n") - col("m.t")).cast("double") /
          lit(100.0)).as("mean_right"))
  }

  def theilSen(df: DataFrame, key: String, ts: String,
      value: String): DataFrame = {
    // the daily grid feeds both sides of the pair self-join AND the
    // residual pass — materialize once (days-per-key rows, tiny)
    val daily = df.filter(col(value).isNotNull)
      .groupBy(col(key).as("k"), unix_date(to_date(col(ts))).as("x"))
      .agg(sum((col(value).cast("decimal(18,2)") * 100).cast("long"))
        .as("yc"))
      .materialize()
    val a = daily.select(col("k"), col("x").as("xa"), col("yc").as("ya"))
    val b = daily.select(col("k"), col("x").as("xb"), col("yc").as("yb"))
    val pairs = a.join(b, Seq("k")).filter(col("xa") < col("xb"))
      .withColumn("slope", (col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa")).cast("double"))
    val ws = Window.partitionBy("k").orderBy(col("slope"), col("xa"), col("xb"))
    val wk = Window.partitionBy("k")
    val med = pairs
      .withColumn("rn", row_number().over(ws))
      .withColumn("np", count(lit(1)).over(wk))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("k"), col("np").as("n_pairs"), col("slope").as("__sc"))
    val resid = daily.join(broadcast(med.select("k", "__sc")), Seq("k"))
      .withColumn("ic",
        col("yc").cast("double") - col("__sc") * col("x").cast("double"))
    val wr = Window.partitionBy("k").orderBy(col("ic"), col("x"))
    val inter = resid
      .withColumn("rn", row_number().over(wr))
      .withColumn("nd", count(lit(1)).over(wk))
      .filter(col("rn") === expr("(nd + 1) div 2"))
      .select(col("k"), col("nd").as("n_days"), col("ic"))
    med.join(inter, Seq("k"))
      .select(col("k").as(key), col("n_days"), col("n_pairs"),
        (col("__sc") / 100.0).as("slope_per_day"),
        (col("ic") / 100.0).as("intercept"))
  }
}
