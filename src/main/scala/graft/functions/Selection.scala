package graft.functions
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style data selection (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023): pick raw-pool
  * documents whose hashed n-gram feature distribution resembles a
  * small high-quality TARGET corpus. The classic use at 100 TB is
  * curating a web crawl toward a Wikipedia/books target before
  * pretraining — the selection signal a pure quality classifier
  * misses (DSIR matches the target DISTRIBUTION, not a threshold).
  *
  * Method, faithfully simplified: features are hashed bigrams (bucket
  * = md5-derived 64-bit hash mod `buckets` — engine-portable, so the
  * DuckDB oracle rebuilds every bucket exactly); bag-of-features
  * add-one-smoothed multinomials for the target and raw corpora; the
  * per-document log importance weight is
  *
  *   log w(d) = Σ_f [ ln(c_t(f)+1) − ln(c_r(f)+1) ]
  *              + n_d · [ ln(N_r+B) − ln(N_t+B) ]
  *
  * (the second term folds the two normalizers; n_d = feature count of
  * d). Resampling is Gumbel top-k — rank by `logw + g` where the
  * Gumbel noise `g = −ln(−ln(u))` uses a deterministic md5-uniform
  * `u` per doc, so the draw is reproducible, engine-portable, and
  * equivalent to sampling without replacement ∝ softmax(logw)
  * (Vieira 2014, "Gumbel-max trick").
  *
  * Determinism across engines (the `text_lm_score` discipline): all
  * corpus statistics are exact integers; per-feature lp values are
  * summed as an ORDERED fold over the position-sorted list; the
  * normalizer term is ONE fixed expression appended after the fold;
  * rounding happens once at the end.
  *
  * Scale shape: bucket counts for BOTH corpora come from one
  * map-side-combined groupBy over (doc_id, pos, bucket) triples (the
  * target indicator rides along — no second scan); the count
  * join-back is a 1-row-per-bucket build side (≤ `buckets` rows —
  * broadcastable); totals ride in as a broadcast 1-row cross join;
  * the per-doc fold shuffles (doc_id, pos, lp) triples only. The
  * top-k is sort-and-limit (TakeOrdered — no global window over the
  * corpus); ranks are assigned on the k survivors.
  */
object Selection {

  /** Engine-portable feature bucket in [0, buckets): first 8 md5
    * bytes as an unsigned integer, mod the bucket count. Exact
    * DECIMAL(20,0) arithmetic — no ANSI overflow, no sign fold
    * needed (the modulus of the unsigned value is taken directly,
    * matching DuckDB's `UBIGINT % buckets`).
    */
  private def featureBucket(g: Column, buckets: Int): Column =
    (conv(substring(md5(g.cast("binary")), 1, 16), 16, 10)
      .cast(DecimalType(20, 0)) % buckets).cast("long")

  /** Per-document hashed-bigram positions: `(doc_id, __t, pos, b)`.
    * Documents with < 2 tokens carry no features and are excluded
    * (mirrored by the oracle).
    */
  private def features(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame =
    docs
      .select(col("doc_id"), isTarget.cast("boolean").as("__t"),
        split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("__t"),
        posexplode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
          .as(Seq("pos", "g")))
      .select(col("doc_id"), col("__t"), col("pos"),
        featureBucket(col("g"), buckets).as("b"))

  /** Internal: `(doc_id, n_feats, logw_raw)` with the UNROUNDED
    * weight (the sampling key must not rank on display rounding).
    */
  private def weightsRaw(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    // the feature stream feeds the count table AND the scoring join,
    // and the count table feeds totals AND the broadcast join —
    // materialize both (slim 20-byte rows / ≤`buckets` rows; round 8
    // re-tokenized the corpus 3 times here)
    val feats = features(docs, isTarget, buckets).materialize()
    // One pass counts both corpora: cr = raw occurrences (every row),
    // ct = target occurrences (indicator sum). ≤ `buckets` rows out.
    val counts = feats.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"))
      .materialize()
    val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lp = feats
      .join(broadcast(counts), Seq("b"))
      .select(col("doc_id"), col("pos"),
        (log(col("ct").cast("double") + lit(1.0))
          - log(col("cr").cast("double") + lit(1.0))).as("lp"))
    lp.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
            s => s.getField("lp")),
          lit(0.0), (acc, x) => acc + x).as("__s"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"),
        (col("__s") + col("n_feats").cast("double")
          * (log(col("nr").cast("double") + lit(buckets.toDouble))
            - log(col("nt").cast("double") + lit(buckets.toDouble))))
          .as("logw_raw"))
  }

  /** DSIR log importance weights: `(doc_id, n_feats, logw)` for every
    * document with ≥ 1 bigram feature. Higher = more target-like.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 1024): DataFrame =
    weightsRaw(docs, isTarget, buckets)
      .select(col("doc_id"), col("n_feats"),
        round(col("logw_raw"), 4).as("logw"))

  /** DSIR Gumbel top-k resample: the `k` documents selected without
    * replacement with probability ∝ softmax(log w), drawn with
    * deterministic md5-uniform Gumbel noise. Emits
    * `(doc_id, rank, logw, skey)`, rank 1 = first draw.
    */
  def dsirSample(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 1024): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // u = (h + 0.5) / 2^32 with h the first 4 md5 bytes of the salted
    // doc id — u ∈ (0, 1) strictly, so −ln(−ln(u)) is finite.
    val h = conv(substring(
      md5(concat(lit("dsir:"), col("doc_id").cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    val keyed = weightsRaw(docs, isTarget, buckets)
      .withColumn("__u", (h.cast("double") + lit(0.5)) / lit(4294967296.0))
      .withColumn("__key", col("logw_raw") - log(-log(col("__u"))))
    // TakeOrdered top-k; ranks assigned on the k survivors only (a
    // single-partition window over k rows, not the corpus).
    val top = keyed.orderBy(col("__key").desc, col("doc_id")).limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__key").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"), round(col("logw_raw"), 4).as("logw"),
        round(col("__key"), 4).as("skey"))
  }

  /** Per-group EXACT-k uniform sample (the distributed form of
    * reservoir sampling, Vitter 1985): rank rows inside each group by
    * a salted md5 of their id and keep the first k. A random-order
    * hash rank IS a uniform without-replacement draw — but unlike a
    * driver-side reservoir it is deterministic, engine-portable,
    * stable under re-runs, and composable (adding rows can only
    * displace, never reshuffle, survivors). Complements
    * [[TextAnalysis.rateSampleKeep]]: rate-keep gives a BINOMIAL count
    * (map-only, no guarantee); this gives exactly min(k, |group|).
    *
    * Shape at scale: the `rk ≤ k` filter directly above the
    * row_number window triggers Spark's WindowGroupLimit rewrite —
    * each map task pre-prunes to its local top-k per group BEFORE the
    * exchange, so the shuffle carries O(groups·k·tasks) rows, not the
    * corpus, and a skewed group cannot flood one reducer.
    */
  def reservoirSample(df: DataFrame, group: Column, id: Column,
      k: Int, salt: String = "rsv"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hk = md5(concat(lit(s"$salt:"), id.cast("string")).cast("binary"))
    df.select(group.as("g"), id.as("id"), hk.as("__hk"))
      .withColumn("rk",
        row_number().over(
          Window.partitionBy("g").orderBy(col("__hk"), col("id")))
          .cast("long"))
      .filter(col("rk") <= k)
      .select(col("g"), col("id"), col("rk"))
  }

  /** Competence-based curriculum schedule (Platanios et al. 2019,
    * "Competence-based Curriculum Learning for NMT"): order the corpus
    * easiest-first by a difficulty proxy — here document quality, high
    * quality = clean prose = stage 1 — and emit each document's
    * training stage plus a DETERMINISTIC shuffled position within its
    * stage (salted md5 order: uniformly random in distribution, yet
    * stable under re-runs and engine-portable, the property an actual
    * data loader needs to resume mid-epoch).
    *
    * Stages are exact interpolated quantile bands of the score (the
    * paper's c(t) competence thresholds, materialized as quartiles
    * here). At 100 TB the cutoff aggregate is the only global
    * statistic — one map-side-combined pass producing a single
    * broadcast row (swap in `approx_percentile` when exactness is not
    * contractual); stage assignment is map-only against that row, and
    * the within-stage position is the two-phase exact per-group index
    * ([[graft.operators.Skew.withPerGroupIndex]]): range partition on
    * (stage, salted key), per-partition row_number, driver
    * prefix-summed offsets broadcast back. A
    * `Window.partitionBy(stage)` row_number would look partitioned
    * but, with `stages` tiny, IS a global sort split `stages` ways —
    * each reducer sorting corpus/stages rows with no rank filter for
    * WindowGroupLimit to prune on; the two-phase form keeps the sort
    * parallelism at the shuffle-partition count.
    */
  def curriculumSchedule(docs: DataFrame, quality: Column,
      stages: Int = 4, salt: String = "cur"): DataFrame = {
    require(stages >= 2, "a curriculum needs at least 2 stages")
    val q = docs.select(col("doc_id"), quality.as("quality"))
    val ps = (1 until stages).map(i => i.toDouble / stages)
    val cutsRow = q.agg(
      percentile(col("quality"), lit(ps.head)).as("c1"),
      ps.tail.zipWithIndex.map { case (p, i) =>
        percentile(col("quality"), lit(p)).as(s"c${i + 2}") }: _*)
    // stage = 1 + number of cutoffs the score clears, counted from the
    // top band down: quality >= c(stages-1) → stage 1 (easiest)
    val stageCol = (1 until stages).foldLeft(lit(stages): Column) {
      case (acc, i) => acc - when(col(s"c$i") <= col("quality"), 1).otherwise(0)
    }
    // project the spent cutoff columns away BEFORE the index: the
    // range shuffle + checkpoint inside withPerGroupIndex must carry
    // only (doc_id, quality, stage, key), not stages-1 dead doubles
    val staged = q.crossJoin(broadcast(cutsRow))
      .withColumn("stage", stageCol.cast("long"))
      .withColumn("__hk",
        md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))
          .cast("binary")))
      .select(col("doc_id"), col("quality"), col("stage"), col("__hk"))
    graft.operators.Skew
      .withPerGroupIndex(staged, "stage",
        Seq(col("__hk"), col("doc_id")), "pos")
      .select(col("doc_id"), col("stage"), col("pos"), col("quality"))
  }
}
