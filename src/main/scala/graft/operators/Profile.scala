package graft.operators
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column row/null/distinct counts, the
  * first thing a pipeline asserts about an unfamiliar extract before
  * trusting it downstream (reference analogue: the ad-hoc sanity
  * queries around `services/etlService.js` extracts).
  */
object Profile {

  /** RFM (recency / frequency / monetary) customer segmentation: per
    * key, the classic three behavioral metrics, each scored 1–4 by
    * which exact quartile of the population the value falls in
    * (higher = better), plus the concatenated segment code
    * ("444" = champion).
    *
    * Scoring is THRESHOLD-based, not `ntile`: quartile cut points
    * come from one exact-percentile aggregate (a 1-row broadcast) and
    * each row scores itself by comparison — map-only after the per-key
    * aggregate. A global `ntile` window would funnel every customer
    * through ONE unpartitioned sort at 100 TB; thresholds scale
    * freely (the semantic difference: ties straddling a cut land in
    * the same bucket rather than being split arbitrarily — the better
    * behavior anyway).
    *
    * Determinism: recency is integer epoch-micros; frequency is an
    * integer count; monetary is summed in DECIMAL(18,2) (order-
    * independent) and cast to double ONCE; quartile interpolation and
    * the >-comparisons are the same IEEE arithmetic in any engine
    * (the `agg_percentiles` parity pattern). Rounding is display-only.
    */
  def rfmSegments(df: DataFrame, key: String, ts: String,
      amount: String): DataFrame = {
    val base = df.groupBy(col(key).as("custkey"))
      .agg(max(col(ts)).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col(amount).cast("decimal(18,2)")).as("__mdec"))
      .select(col("custkey"), col("last_order"), col("frequency"),
        col("__mdec").cast("double").as("__monetary"),
        unix_micros(col("last_order").cast("timestamp")).as("__rec_us"))
    val th = base.agg(
      expr("percentile(__rec_us, array(0.25D, 0.5D, 0.75D))").as("__rq"),
      expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").as("__fq"),
      expr("percentile(__monetary, array(0.25D, 0.5D, 0.75D))").as("__mq"))
    def score(v: Column, q: Column): Column =
      (lit(1) + (v > element_at(q, 1)).cast("int")
        + (v > element_at(q, 2)).cast("int")
        + (v > element_at(q, 3)).cast("int"))
    base.crossJoin(broadcast(th))
      .withColumn("r_score", score(col("__rec_us").cast("double"), col("__rq")))
      .withColumn("f_score", score(col("frequency").cast("double"), col("__fq")))
      .withColumn("m_score", score(col("__monetary"), col("__mq")))
      .select(col("custkey"), col("last_order"), col("frequency"),
        round(col("__monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  /** Equi-width histogram of a 2-decimal money column, in EXACT
    * integer cents: values scale to `round(v·100)` (2-decimal inputs
    * land within 1e-10 of an integer, so the round is exact in any
    * engine), bounds and bin width are integer arithmetic
    * (`width = ceil((hi−lo+1)/bins)`, floor-div binning) — no FP
    * boundary can ever flip a row's bin, which is what makes a
    * histogram reproducible across engines/partitionings at all.
    * Empty bins are absent (no gap-fill).
    *
    * Scale shape: one 1-row min/max aggregate broadcast back, then a
    * map-side-combined count per bin — two passes over the column,
    * zero wide shuffles (≤ `bins` groups).
    */
  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val c = df.filter(value.isNotNull)
      .select(round(value * 100).cast("long").as("__c"))
    val bounds = c.agg(min(col("__c")).as("__lo"), max(col("__c")).as("__hi"))
    c.crossJoin(broadcast(bounds))
      .withColumn("__w", greatest(
        expr(s"(__hi - __lo + $bins) div $bins"), lit(1L)))
      .withColumn("bin", expr("(__c - __lo) div __w"))
      .groupBy(col("bin"),
        (col("__lo") + col("bin") * col("__w")).as("lo_cents"),
        (col("__lo") + (col("bin") + 1) * col("__w") - 1).as("hi_cents"))
      .agg(count(lit(1)).as("n"))
      .select("bin", "lo_cents", "hi_cents", "n")
  }

  /** Welch two-sample t-test between every unordered pair of groups
    * (Welch 1947 — the unequal-variance form; pooled-variance Student
    * is wrong whenever group sizes or spreads differ, which is always
    * in corpus slices). Emits `(group_a, group_b, n_a, n_b, mean_a,
    * mean_b, t_stat, df)` per pair, where df is the
    * Welch–Satterthwaite approximation.
    *
    * Determinism (the [[pairwiseCorr]] discipline): per-group moments
    * are exact DECIMAL sums — order- and partitioning-independent —
    * cast to DOUBLE once; every derived stat is ONE fixed FP tree
    * mirrored in the oracle. Degenerate pairs (either group has n < 2
    * or zero variance) yield NULL t/df via the nullif guard rather
    * than an ANSI division error.
    *
    * Scale shape: one scan, one map-side-combined groupBy; the pair
    * join runs on the aggregated per-group table (|groups| rows,
    * broadcast) — the corpus is never self-joined.
    */
  def welchTTest(df: DataFrame, group: Column, value: Column): DataFrame = {
    val dec = value.cast("decimal(18,2)")
    val g = df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"), sum(dec).as("s"), sum(dec * dec).as("ss"))
    def side(suffix: String) = g.select(
      col("grp").as(s"group_$suffix"), col("n").as(s"n_$suffix"),
      col("s").as(s"s_$suffix"), col("ss").as(s"ss_$suffix"))
    def d(name: String): Column = col(name).cast("double")
    def mean(x: String): Column = d(s"s_$x") / d(s"n_$x")
    // sample variance from exact moments: (SS − S²/n) / (n−1)
    def vr(x: String): Column =
      (d(s"ss_$x") - d(s"s_$x") * d(s"s_$x") / d(s"n_$x")) / (d(s"n_$x") - lit(1.0))
    def vn(x: String): Column = vr(x) / d(s"n_$x")
    val se2 = vn("a") + vn("b")
    side("a").join(side("b"), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        col("n_a"), col("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > lit(0.0),
          (mean("a") - mean("b")) / sqrt(se2)).as("t_stat"),
        when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > lit(0.0),
          (se2 * se2) / (vn("a") * vn("a") / (d("n_a") - lit(1.0))
            + vn("b") * vn("b") / (d("n_b") - lit(1.0)))).as("df"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the categorical face of the drift/significance family
    * (`stat_ttest` covers a numeric measure between two groups; this
    * covers whether two discrete attributes are associated at all,
    * e.g. document language × source before trusting a per-source
    * language mix).
    *
    * Shape at scale: ONE shuffle builds the contingency table
    * (`groupBy(a, b).count`); everything after runs on |A|·|B| cells —
    * row/column marginals are re-aggregations of the cell table, the
    * full A×B grid (zero-observed cells must still contribute their
    * expected mass) is a broadcast cross of the two marginal tables,
    * and the final reduction is a 1-row aggregate. No second pass over
    * the data.
    *
    * Determinism: counts and marginals are exact integers; each cell's
    * term is ONE fixed FP tree `(O·N − R·C)² / (R·C·N)` (the
    * algebraically-expanded `(O−E)²/E` — keeps every operand a cast of
    * an exact integer), and the cross-cell sum is an ORDERED fold over
    * the (row, col)-sorted cell list (FP addition does not commute;
    * the `text_rake` discipline), so the statistic is bit-reproducible
    * and oracle-replayable. Returns ONE row `(n_rows, dof, chi2,
    * cramers_v)`; `cramers_v = √(χ²/(N·(min(|A|,|B|)−1)))`.
    */
  def chiSquare(df: DataFrame, rowCat: Column, colCat: Column): DataFrame = {
    // the contingency table (|A|x|B| rows) feeds FOUR consumers (row/
    // col marginals, totals, the grid join) — materialize once instead
    // of four corpus aggregations (Catalyst shares no subtrees)
    val obs = df.groupBy(rowCat.as("ra"), colCat.as("cb"))
      .agg(count(lit(1)).as("o"))
      .materialize()
    val rTot = obs.groupBy("ra").agg(sum("o").as("rt"))
    val cTot = obs.groupBy("cb").agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("n"),
      countDistinct("ra").as("nr"), countDistinct("cb").as("nc"))
    def d(c: String): Column = col(c).cast("double")
    val diff = d("o") * d("n") - d("rt") * d("ct")
    val grid = rTot.crossJoin(broadcast(cTot))
      .join(obs, Seq("ra", "cb"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .select(col("ra"), col("cb"), col("n"), col("nr"), col("nc"),
        (diff * diff / (d("rt") * d("ct") * d("n"))).as("t"))
    grid.groupBy("n", "nr", "nc")
      .agg(aggregate(
        array_sort(collect_list(struct(col("ra"), col("cb"), col("t")))),
        lit(0.0), (acc, e) => acc + e.getField("t")).as("chi2"))
      .select(col("n").as("n_rows"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("chi2"),
        sqrt(col("chi2") /
          (d("n") * (least(col("nr"), col("nc")) - lit(1)).cast("double")))
          .as("cramers_v"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test between every pair of
    * groups — the rank-based complement of [[welchTTest]]: no
    * normality assumption, so it is the right significance test for
    * the heavy-tailed length/score distributions documents actually
    * have. Normal approximation with the standard tie correction
    * (Mann & Whitney 1947; σ²_U = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))).
    *
    * Exactness: average ranks are kept as DOUBLED integers
    * (`2·rank + ties − 1` — an exact long even when the average is a
    * half), so rank sums and U never touch FP; only the final z is a
    * single fixed FP tree over casts of exact integers — identical in
    * the oracle, bit-reproducible under any partitioning.
    *
    * Shape at scale: each row joins into the (broadcast) pair list it
    * participates in — a ×(|G|−1) duplication, fine for the small
    * group cardinalities significance tests are run over — and the
    * per-pair rank is a range-partitionable window sort (no global
    * single-partition order). Ties Σ(t³−t) come from a second
    * aggregation of the same pair-tagged rows, not a rescan of `df`.
    */
  def mannWhitney(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (g, v) is 2 longs/row and feeds the group list + the pair-tagged
    // table twice (rank pass, tie pass): materialize once — 3 corpus
    // scans otherwise
    val base = df.select(group.as("g"), value.cast("long").as("v"))
      .materialize()
    val groups = base.select("g").distinct()
    val pairs = groups.select(col("g").as("group_a"))
      .join(groups.select(col("g").as("group_b")),
        col("group_a") < col("group_b"))
    val both = base.join(broadcast(pairs),
      col("g") === col("group_a") || col("g") === col("group_b"))
    val w = Window.partitionBy("group_a", "group_b").orderBy("v")
    val peers = Window.partitionBy("group_a", "group_b", "v")
    val ranked = both
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("tie", count(lit(1)).over(peers))
      .withColumn("ar2", lit(2L) * col("rk") + col("tie") - lit(1L))
    val sums = ranked.groupBy("group_a", "group_b")
      .agg(sum(when(col("g") === col("group_a"), col("ar2"))).as("r2a"),
        sum(when(col("g") === col("group_a"), 1L)).as("n_a"),
        sum(when(col("g") === col("group_b"), 1L)).as("n_b"))
    val ties = both.groupBy("group_a", "group_b", "v")
      .agg(count(lit(1)).as("t"))
      .groupBy("group_a", "group_b")
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    def d(c: String): Column = col(c).cast("double")
    val u2a = col("r2a") - col("n_a") * (col("n_a") + lit(1L))
    val dn = d("n_a") + d("n_b")
    val sigma2 = d("n_a") * d("n_b") / lit(12.0) *
      ((dn + lit(1.0)) - d("tie3") / (dn * (dn - lit(1.0))))
    sums.join(ties, Seq("group_a", "group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        (u2a.cast("double") / lit(2.0)).as("u_stat"),
        when(col("n_a") >= 1 && col("n_b") >= 1 && sigma2 > lit(0.0),
          (u2a.cast("double") - d("n_a") * d("n_b")) /
            (lit(2.0) * sqrt(sigma2))).as("z_stat"))
  }

  /** Two-sample Kolmogorov–Smirnov test between every pair of groups:
    * the distribution-shape complement of [[mannWhitney]] (MWU detects
    * location shift; KS detects ANY CDF divergence — variance,
    * bimodality, truncation). Statistic EXACT: `D = max_v |F₁(v) −
    * F₂(v)|` is computed as the integer `max |c₁(v)·n₂ − c₂(v)·n₁|`
    * over cumulative counts, divided ONCE at the end — no FP until
    * the final single division, so the result is bit-reproducible
    * under any partitioning and the oracle replays it exactly.
    *
    * Shape at scale: the same broadcast pair-list duplication as
    * [[mannWhitney]]; per-pair cumulative counts are a window over
    * DISTINCT values (range-partitionable), and the max is a plain
    * aggregate. Returns `(group_a, group_b, n_a, n_b, d_num, d_stat)`
    * with `d_stat = d_num/(n_a·n_b)`.
    */
  def ksTest(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same slim-base materialization rationale as [[mannWhitney]]
    val base = df.select(group.as("g"), value.cast("long").as("v"))
      .materialize()
    val groups = base.select("g").distinct()
    val pairs = groups.select(col("g").as("group_a"))
      .join(groups.select(col("g").as("group_b")),
        col("group_a") < col("group_b"))
    val both = base.join(broadcast(pairs),
      col("g") === col("group_a") || col("g") === col("group_b"))
    val perV = both.groupBy("group_a", "group_b", "v")
      .agg(sum(when(col("g") === col("group_a"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === col("group_b"), 1L).otherwise(0L)).as("c2"))
    val w = Window.partitionBy("group_a", "group_b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perV
      .withColumn("f1", sum("c1").over(w))
      .withColumn("f2", sum("c2").over(w))
    val tot = both.groupBy("group_a", "group_b")
      .agg(sum(when(col("g") === col("group_a"), 1L)).as("n_a"),
        sum(when(col("g") === col("group_b"), 1L)).as("n_b"))
    cum.join(tot, Seq("group_a", "group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        abs(col("f1") * col("n_b") - col("f2") * col("n_a")).as("d"))
      .groupBy("group_a", "group_b", "n_a", "n_b")
      .agg(max("d").as("d_num"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("d_num"),
        (col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("d_stat"))
  }

  /** Per-group simple linear regression (ordinary least squares) of
    * `y` on `x`: the relationship test next to [[pairwiseCorr]]'s
    * association test — slope/intercept give the fitted line, r² how
    * much of y's variance it explains. Built-in `regr_slope` is a
    * running-update aggregate (order-dependent, unusable for parity);
    * this computes the closed form from EXACT integer moments.
    *
    * Determinism: callers pass integer-exact `x`/`y` columns (floor
    * or cents-scale upstream); the five moments Σx Σy Σxy Σx² Σy² are
    * plain BIGINT sums — order-independent under any partitioning —
    * each cast to DOUBLE once (exact while < 2⁵³, which bounds the
    * valid input domain and is the oracle's operating range), and
    * every statistic is ONE fixed IEEE tree identical in the oracle:
    * `slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²ᵗ)`, `intercept =
    * (Σy − slope·Σx)/n`, `r² = num²/(denx·deny)`.
    *
    * Shape at scale: one map-side-combined groupBy, then a per-row
    * projection — no second pass, no join, no window. Degenerate
    * groups (n < 2 or zero x-variance) yield NULL slope/intercept;
    * zero y-variance additionally NULLs r².
    */
  def olsFit(df: DataFrame, group: Seq[Column], x: Column,
      y: Column): DataFrame = {
    val gnames = group.indices.map(i => s"__g$i")
    val base = df.select(
      group.zip(gnames).map { case (c, n) => c.as(n) } :+
        x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
    val m = base.groupBy(gnames.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * d("syy") - d("sy") * d("sy")
    val slope = when(col("n") >= 2 && denx =!= 0.0, num / denx)
    val inter = when(col("n") >= 2 && denx =!= 0.0,
      (d("sy") - (num / denx) * d("sx")) / d("n"))
    val r2 = when(col("n") >= 2 && denx =!= 0.0 && deny =!= 0.0,
      (num * num) / (denx * deny))
    m.select(gnames.map(col) ++ Seq(col("n"), slope.as("slope"),
      inter.as("intercept"), r2.as("r2")): _*)
  }

  /** Pairwise Pearson correlation of `cols` within each `group`, in
    * ONE scan: a single aggregate computes every column's decimal
    * sum/sum-of-squares and every pair's cross-product sum side by
    * side; an inline explode then unpivots to one row per (group,
    * col_a, col_b). Long format because a correlation MATRIX of c
    * columns is c²/2 numbers — rows scale, result schemas shouldn't.
    *
    * Determinism (the `ts_zscore` discipline): every moment is an
    * exact DECIMAL sum of 2-decimal inputs — order-independent, so
    * shuffle/partitioning can't change it — each stat is cast to
    * DOUBLE once, and the correlation is ONE fixed FP expression
    * `(n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))`, identical
    * in the oracle. Built-in `corr()` is a running-update aggregate
    * whose result depends on row order — unusable for parity, and a
    * reproducibility hazard at scale generally.
    *
    * Degenerate groups (zero variance in either column) yield NULL
    * (division by zero under non-ANSI semantics is avoided by
    * nullif).
    */
  def pairwiseCorr(df: DataFrame, group: Column, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val sums = cols.flatMap { c =>
      Seq(sum(dec(c)).as(s"__s_$c"),
        sum(dec(c) * dec(c)).as(s"__ss_$c"))
    }
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val crosses = pairs.map { case (a, b) =>
      sum(dec(a) * dec(b)).as(s"__sx_${a}_$b")
    }
    val agg = df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("__n"), (sums ++ crosses): _*)
    def d(name: String): Column = col(name).cast("double")
    val entries = pairs.map { case (a, b) =>
      val n = col("__n").cast("double")
      val num = n * d(s"__sx_${a}_$b") - d(s"__s_$a") * d(s"__s_$b")
      val den = sqrt(n * d(s"__ss_$a") - d(s"__s_$a") * d(s"__s_$a")) *
        sqrt(n * d(s"__ss_$b") - d(s"__s_$b") * d(s"__s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").as("n_rows"),
        when(den =!= lit(0.0), num / den).as("corr"))
    }
    agg.select(col("grp"), explode(array(entries: _*)).as("e"))
      .select(col("grp"), col("e.col_a"), col("e.col_b"),
        col("e.n_rows"), col("e.corr"))
  }

  /** Profile `cols` of `df` in ONE scan: a single aggregate computes
    * every column's counts side by side, then an inline explode
    * unpivots the 1-row result into one row per column — the table is
    * never read twice, and nothing but the 1-row aggregate ever
    * shuffles.
    *
    * Scale note: exact `countDistinct` over c columns makes Spark
    * expand the scan c+1 ways before the aggregate. Fine for a
    * profiler run on purpose; for a routine 100-TB health check swap
    * in `approx_count_distinct`, which keeps the pass single-expand
    * (the sketch-contract row `a1_approx_distinct` documents the
    * error bound that buys).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        // sum over zero rows is null — an empty extract must profile
        // as zeros, not nulls
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Declarative data-quality expectations (the Great-Expectations /
    * dbt-test shape): every ROW-LOCAL rule — not-null, range, set
    * membership, pattern — is a boolean `Column` evaluated in ONE
    * map-combined scan (one failure counter per rule side by side,
    * 1-row result exploded into one row per rule). A NULL predicate
    * counts as FAIL — the conservative reading: a row you can't prove
    * healthy isn't. Output: (rule, n_rows, n_fail, passed).
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation rule")
    val aggs = rules.map { case (n, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__f_$n")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(rules.map { case (n, _) =>
        struct(lit(n).as("rule"), col("__n").as("n_rows"),
          col(s"__f_$n").as("n_fail"))
      }: _*)).as("r"))
      .select("r.*")
      .withColumn("passed", col("n_fail") === 0L)
  }

  /** Uniqueness expectation: `n_fail` = surplus rows beyond the
    * distinct count of `key` (0 ⟺ key is unique; nulls are not
    * counted as distinct values, so any null key rows surface as
    * failures too). Same output contract as [[expectations]].
    */
  def expectUnique(df: DataFrame, key: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), countDistinct(col(key)).as("__nd"))
      .select(lit(s"unique:$key").as("rule"), col("n_rows"),
        (col("n_rows") - col("__nd")).as("n_fail"))
      .withColumn("passed", col("n_fail") === 0L)

  /** Referential-integrity expectation: rows of `child` whose `key`
    * has no match in `parent.pkey` (NULL keys count as orphans — they
    * reference nothing). The parent key set rides a broadcast for
    * dimension-sized parents; for a huge parent drop the hint and let
    * AQE pick the join side. Same output contract as [[expectations]].
    */
  def expectForeignKey(
      child: DataFrame, key: String,
      parent: DataFrame, pkey: String, parentName: String): DataFrame =
    child.select(col(key))
      .join(
        broadcast(parent.select(col(pkey).as(key)).distinct()
          .withColumn("__hit", lit(1))),
        Seq(key), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_fail"))
      .select(lit(s"fk:$key->$parentName.$pkey").as("rule"),
        col("n_rows"), col("n_fail"))
      .withColumn("passed", col("n_fail") === 0L)

  /** Benford first-digit conformance test (Newcomb 1881, Benford 1938)
    * of a positive numeric column — the forensic DQ screen for
    * fabricated or truncated monetary data: natural multiplicative
    * amounts put digit d first with probability log₁₀(1+1/d); clerical
    * fabrication flattens the curve.
    *
    * Portability: the first digit is extracted via STRING arithmetic
    * on the floored BIGINT (`substr(cast(v), 1, 1)`) — no log10 on
    * data, whose libm rounding differs across engines — and the nine
    * expected probabilities are 9-decimal DECIMAL LITERALS shared
    * verbatim with the oracle (computing log10(1+1/d) at runtime
    * would tie the result to the engine's libm). Each digit's χ²
    * term `(O − N·p)²/(N·p)` is one fixed FP tree.
    *
    * Shape at scale: map-only digit extraction, one 9-row
    * map-side-combined groupBy, then literal-table joins on the
    * driver-sized digit table. Values < 1 (first digit 0) are
    * excluded — Benford is defined on the leading significant digit
    * of ≥ 1 magnitudes; callers rescale sub-unit data upstream.
    */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val ps = Seq(1 -> 0.301029996, 2 -> 0.176091259, 3 -> 0.124938737,
      4 -> 0.096910013, 5 -> 0.079181246, 6 -> 0.06694679,
      7 -> 0.057991947, 8 -> 0.051152522, 9 -> 0.045757491)
    val spark = df.sparkSession
    import spark.implicits._
    val expected = ps.toDF("digit", "p_exp")
    val obs = df.select(
        substring(floor(value).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum("n_obs").as("n_rows"))
    def d(c: String): Column = col(c).cast("double")
    val dev = d("n_obs") - d("n_rows") * col("p_exp")
    broadcast(expected).join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"), col("n_rows"), col("p_exp"),
        (dev * dev / (d("n_rows") * col("p_exp"))).as("chi_term"))
  }

  /** Spearman rank correlation of `x` vs `y` within each `group`: the
    * monotonic-association complement of [[pairwiseCorr]] (Pearson) —
    * rank first, then correlate, so outliers and non-linear-but-
    * monotone relations don't distort the statistic.
    *
    * Exactness (the [[mannWhitney]] doubled-rank discipline): average
    * ranks are kept as DOUBLED integers `2·rank + ties − 1`, then
    * CENTERED by the exact doubled mean rank `n + 1` (Σ of doubled
    * average ranks is n·(n+1) identically, so the centered moments
    * need no n·Σ expansion — `ρ = Σc_xc_y / (√Σc_x² · √Σc_y²)` with
    * every Σ a plain BIGINT sum). |c| ≤ n−1 bounds Σc_xc_y < n³:
    * exact in signed 64-bit to ~2·10⁶ rows per group; larger groups
    * should move the three moments to DECIMAL(38,0). FP appears only
    * in the final one-tree division — bit-reproducible under any
    * partitioning, oracle-replayable.
    *
    * Shape at scale: ranking is two range-partitionable window sorts
    * over the SAME group partitioning (one per variable) plus a
    * peer-count window each; the moments are one map-side-combined
    * groupBy. No joins, no second scan.
    */
  def spearman(df: DataFrame, group: Column, x: Column,
      y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.as("g"),
      x.cast("long").as("x"), y.cast("long").as("y"))
    val wx = Window.partitionBy("g").orderBy("x")
    val wy = Window.partitionBy("g").orderBy("y")
    val wn = Window.partitionBy("g")
    // peer count via a CURRENT ROW range frame — rides the SAME sort
    // as rank(), so each variable costs one window pass, not two
    def peers(w: org.apache.spark.sql.expressions.WindowSpec) =
      count(lit(1)).over(w.rangeBetween(Window.currentRow, Window.currentRow))
    val ranked = base
      .withColumn("dx",
        lit(2L) * rank().over(wx).cast("long") + peers(wx) - lit(1L))
      .withColumn("dy",
        lit(2L) * rank().over(wy).cast("long") + peers(wy) - lit(1L))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("g"),
        (col("dx") - col("n") - lit(1L)).as("cx"),
        (col("dy") - col("n") - lit(1L)).as("cy"))
    def d(c: String): Column = col(c).cast("double")
    ranked.groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("cx") * col("cy")).as("sxy"),
        sum(col("cx") * col("cx")).as("sxx"),
        sum(col("cy") * col("cy")).as("syy"))
      .select(col("g"), col("n"),
        when(col("sxx") > 0L && col("syy") > 0L,
          d("sxy") / (sqrt(d("sxx")) * sqrt(d("syy")))).as("rho"))
  }

  /** One-way ANOVA F-test of `value` across `group` levels: does the
    * group mean differ anywhere — the k-sample generalization of
    * [[welchTTest]] (pooled-variance form).
    *
    * Exactness: per-group `n_g, Σv, Σv²` are plain BIGINT sums (one
    * map-side-combined groupBy — order-independent). The cross-group
    * reduction Σ_g s_g²/n_g does not commute in FP, so it runs as an
    * ORDERED fold over the group-sorted list (the [[chiSquare]]
    * discipline); SSB/SSW/F/η² are then one fixed IEEE tree each —
    * bit-reproducible, oracle-replayable.
    *
    * Shape at scale: one shuffle to k group rows, then a 1-row
    * reduction of the k-row table. Returns one row
    * `(k, n_rows, f_stat, eta_sq)`; degenerate cases (k < 2,
    * N ≤ k, zero within-variance) yield NULL f_stat.
    */
  def anovaF(df: DataFrame, group: Column, value: Column): DataFrame = {
    val g = df.select(group.as("g"), value.cast("long").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"), sum("v").as("sg"),
        sum(col("v") * col("v")).as("qg"))
    def d(c: String): Column = col(c).cast("double")
    // per-group between-term s_g²/n_g — one fixed tree per group,
    // folded in g-order
    val terms = g.select(col("g"), col("ng"), col("sg"), col("qg"),
      (d("sg") * d("sg") / d("ng")).as("t"))
    val agg0 = terms.agg(
      count(lit(1)).as("k"), sum("ng").as("n_rows"),
      sum("sg").as("s"), sum("qg").as("q"),
      aggregate(array_sort(collect_list(struct(col("g"), col("t")))),
        lit(0.0), (acc, e) => acc + e.getField("t")).as("bsum"))
    val ssb = col("bsum") - d("s") * d("s") / d("n_rows")
    val ssw = d("q") - col("bsum")
    val f = when(col("k") >= 2 && col("n_rows") > col("k") && ssw > 0.0,
      (ssb / (d("k") - lit(1.0))) /
        (ssw / (d("n_rows") - d("k"))))
    val eta = when(ssb + ssw > 0.0, ssb / (ssb + ssw))
    agg0.select(col("k"), col("n_rows"), f.as("f_stat"),
      eta.as("eta_sq"))
  }

  /** Kruskal–Wallis H test (1952) — the RANK-based k-group location
    * test, [[anovaF]]'s nonparametric counterpart (valid under
    * non-normal, heavy-tailed or ordinal values where the F test's
    * variance assumptions fail). Midranks handle ties exactly: the
    * whole statistic is computed on 2×rank integers (2·midrank =
    * 2·prefix_count + count + 1 — always integral), so every per-group
    * rank sum is an exact BIGINT and the only floating point is the
    * fixed per-group term tree folded in group order (the [[anovaF]]
    * ordered-fold discipline) plus the final H expression — the oracle
    * replays it bit for bit. Emits one row: `(k, n_rows, h_stat,
    * h_corrected)` with the standard tie correction
    * `H / (1 − Σ(t³−t)/(N³−N))`.
    *
    * Scale shape: the global ranking never runs as an unpartitioned
    * window — distinct-value counts get exact weighted prefix sums via
    * the two-phase range-partition trick ([[graft.operators.Skew
    * .withGlobalIndex]]'s discipline: per-partition cumulative window,
    * per-partition totals collected — bounded by the partition count —
    * and broadcast back). Everything else is map-combined aggregation;
    * the 1-row tie term attaches by broadcast. Exactness bound: rank
    * sums overflow 64-bit past ~2·10⁹ rows per test cell (document the
    * cast ladder before raising).
    */
  def kruskalWallis(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    // (g, v) feeds the distinct-value counts AND the per-(g,v)
    // multiplicities — materialize once
    val base = df.select(group.as("g"), value.cast("long").as("v"))
      .materialize()
    val parts = spark.sessionState.conf.numShufflePartitions
    val vcp = base.groupBy("v").agg(count(lit(1)).as("c"))
      .repartitionByRange(parts, col("v"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cum", sum(col("c")).over(
        Window.partitionBy(col("__pid")).orderBy(col("v"))))
      .materialize()
    val offsets = vcp.groupBy(col("__pid")).agg(sum(col("c")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = offsets.map { case (pid, t) =>
      val off = acc; acc += t; (pid, off) }.toIndexedSeq
    val sp = spark; import sp.implicits._
    val offDf = broadcast(offRows.toDF("__pid", "__off"))
    // 2·midrank of value v = 2·(#values below) + count(v) + 1
    val mr = vcp.join(offDf, "__pid")
      .select(col("v"), col("c"),
        (lit(2L) * (col("__off") + col("__cum") - col("c"))
          + col("c") + lit(1L)).as("m2"))
    val per = base.groupBy("g", "v").agg(count(lit(1)).as("m"))
      .join(mr.select("v", "m2"), Seq("v"))
      .groupBy("g")
      .agg(sum(col("m")).as("ng"), sum(col("m") * col("m2")).as("r2"))
    def d(c: String): Column = col(c).cast("double")
    // term_g = R_g²/n_g with R_g = r2/2 ⇒ r2²/(4·n_g)
    val terms = per.select(col("g"), col("ng"), col("r2"),
      (d("r2") * d("r2") / (lit(4.0) * d("ng"))).as("t"))
    val ties = vcp.agg(
      sum(col("c") * col("c") * col("c") - col("c")).as("tie3"))
    val agg0 = terms.agg(
      count(lit(1)).as("k"), sum("ng").as("n_rows"),
      aggregate(array_sort(collect_list(struct(col("g"), col("t")))),
        lit(0.0), (acc2, e) => acc2 + e.getField("t")).as("rsum"))
    val nd = d("n_rows")
    val h = lit(12.0) * col("rsum") / (nd * (nd + lit(1.0))) -
      lit(3.0) * (nd + lit(1.0))
    val corr = lit(1.0) - d("tie3") / (nd * nd * nd - nd)
    agg0.crossJoin(broadcast(ties))
      .select(col("k"), col("n_rows"),
        when(col("n_rows") >= 2, h).as("h_stat"),
        when(col("n_rows") >= 2 && corr > lit(0.0), h / corr)
          .as("h_corrected"))
  }
}
