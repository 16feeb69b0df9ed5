package graft.functions
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (repo north star; beyond the reference's own surface).
  *
  * Everything is built from codegen'd Spark built-ins over the
  * `documents` table — no UDFs in the hot path, so whole-stage codegen
  * spans the full pipeline and the operators scale linearly with input
  * splits (pure narrow transformations: no shuffle at all until an
  * aggregation is requested).
  */
object TextAnalysis {

  /** Whitespace tokenizer (training-pipeline token accounting). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of character n-chunks — ceil of
    * chars/4 is the common "~4 chars per token" estimator.
    */
  def approxBpeTokenCount(text: Column): Column =
    ceil(length(text).cast("double") / 4).cast("long")

  /** Small multilingual stopword lists for the n-gram language-ID
    * heuristic. Deliberately tiny and deterministic: language ID at
    * 100 TB must be a narrow map-only transform.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den"),
  )

  /** Per-language stopword-hit score: how many tokens are in the
    * language's stopword list.
    */
  def langScore(text: Column, lang: String): Column = {
    val words = stopwords(lang)
    size(filter(tokens(lower(text)), t => words.map(lit).foldLeft(lit(false))(
      (acc, w) => acc || t === w)))
  }

  /** Language-ID heuristic: argmax of stopword scores, `und` when all
    * zero. Ties broken by language-code order (deterministic).
    */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => struct(langScore(text, l).as("s"), lit(l).as("l")))
    val best = array_max(array(scores: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Quality signals: length, token stats, punctuation/digit/space
    * ratios, stopword density. Ratios are single IEEE divisions of
    * exact integer counts — deterministic across engines.
    */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val toks = tokenCount(text)
    val chars = length(text)
    val stopHits = langScore(text, "en")
    df.select(
      col("doc_id"),
      chars.cast("long").as("n_chars"),
      toks.cast("long").as("n_tokens"),
      round(chars.cast("double") / toks.cast("double"), 4).as("chars_per_token"),
      round(length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
        / chars.cast("double"), 4).as("punct_ratio"),
      round(length(regexp_replace(text, "[^0-9]", "")).cast("double")
        / chars.cast("double"), 4).as("digit_ratio"),
      round(stopHits.cast("double") / toks.cast("double"), 4).as("stopword_ratio"),
    )
  }

  /** Composite quality score in [0,1]: high when docs are mid-length,
    * low-punctuation, stopword-bearing (i.e., prose-like).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val lengthScore = least(toks / lit(64.0), lit(1.0))
    val stopScore = least(langScore(text, "en").cast("double") * 8 / toks, lit(1.0))
    round((lengthScore + stopScore) / 2, 4)
  }

  /** The Gopher repetition-free quality rules' stopword set (Rae et
    * al. 2021, "Scaling Language Models", table A1): a doc must contain
    * at least 2 distinct words of these 8 to count as prose.
    */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality filter (Rae et al. 2021, appendix
    * A1.1): word-count bounds, mean word length in [3,10], symbol
    * (#/ellipsis) ratio ≤ 0.1, ≥80% words alphabetic, ≥2 distinct
    * common stopwords. Emits the signals and the composite `keep` flag
    * (thresholds applied to UNROUNDED values; rounding is display-only).
    * Narrow map-only plan: one codegen'd pass per document, no UDFs,
    * no shuffle — the right shape for a 100 TB pre-filter.
    */
  def gopherSignals(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(lower(text))
    val n = size(toks).cast("long")
    val nd = n.cast("double")
    val meanLen = aggregate(toks, lit(0L),
      (acc, w) => acc + length(w).cast("long")).cast("double") / nd
    val symRatio = regexp_count(text, lit("#|\\.\\.\\.|…"))
      .cast("double") / nd
    val alphaRatio = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast("double") / nd
    val stopDistinct = gopherStops
      .map(w => array_contains(toks, w).cast("int")).reduce(_ + _)
    df.select(
      col("doc_id"),
      n.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symRatio, 4).as("symbol_ratio"),
      round(alphaRatio, 4).as("alpha_word_ratio"),
      stopDistinct.cast("long").as("stop_distinct"),
      gopherKeep(text).as("keep"))
  }

  /** The Gopher keep decision as a bare Column (the [[gopherSignals]]
    * rule on UNROUNDED ratios) — reusable by composition faces like
    * [[curationFunnel]] without re-deriving the thresholds.
    */
  def gopherKeep(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks).cast("long")
    val nd = n.cast("double")
    val meanLen = aggregate(toks, lit(0L),
      (acc, w) => acc + length(w).cast("long")).cast("double") / nd
    val symRatio = regexp_count(text, lit("#|\\.\\.\\.|…"))
      .cast("double") / nd
    val alphaRatio = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast("double") / nd
    val stopDistinct = gopherStops
      .map(w => array_contains(toks, w).cast("int")).reduce(_ + _)
    n.between(50, 100000) && meanLen.between(3.0, 10.0) &&
      symRatio <= 0.1 && alphaRatio > 0.8 && stopDistinct >= 2
  }

  /** Corpus vocabulary: token frequencies, most common first (ties
    * broken by token for engine-portable determinism). Scale shape:
    * map-side partial aggregation collapses each partition's token
    * stream to per-key rows BEFORE the shuffle — stopword skew never
    * concentrates raw occurrences on one reducer — and the top-K is
    * TakeOrdered, not a global sort.
    */
  def vocabulary(docs: DataFrame, topK: Int = 500): DataFrame =
    docs.select(explode(tokens(lower(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topK)

  /** TF-IDF keyword extraction: the k most characteristic terms per
    * document. Smooth idf = ln((N+1)/(df+1)) + 1 (sklearn's
    * `smooth_idf` convention — never divides by zero, floors at 1 so
    * corpus-universal terms still rank by tf), score = tf · idf.
    *
    * Determinism across engines: the score is ONE fixed expression
    * tree per (doc, term) — integer tf/df/N feed one division, one
    * `ln`, one multiply (the PMI-collocation FP-parity pattern) — and
    * ranking uses the UNROUNDED score with a term tiebreak; rounding
    * is display-only.
    *
    * Scale shape: tf is a map-combined (doc_id, term) count; df is a
    * map-combined recount of tf's keys; the df join-back is
    * 1-row-per-term build side (hot stopwords AQE-split); N arrives
    * via a broadcast 1-row aggregate, not a driver `count()`. The
    * per-doc top-k is a doc-local window — Spark 4 inserts
    * WindowGroupLimit, so each partition pre-filters to k before the
    * shuffle and a million-term document never materializes its full
    * ranked term list on one reducer.
    */
  def tfIdfKeywords(docs: DataFrame, k: Int = 5): DataFrame = {
    // the tf table feeds the df count AND the score join — tokenize
    // once (the doc total stays its own 1-column scan: a null-text
    // doc has no tf rows but still counts)
    val tf = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .materialize()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfc, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") *
        (log((col("n_docs").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))) + lit(1.0)))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("term"),
        col("tf"), col("df"), round(col("score"), 4).as("tfidf"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, A1.1 "repetition
    * removal", count-based variant): per document, the duplicate-token
    * fraction (1 − distinct/total) and the share of the most common
    * bigram in the bigram stream. Highly repetitive machine-generated
    * text scores near 1 on both.
    *
    * Scale shape: the bigram mode is relational — explode → count by
    * (doc_id, bigram) → max per doc — so both shuffles are keyed by
    * doc-local keys (cardinality ∝ corpus tokens, no global hot key;
    * a pathologically repetitive doc collapses to FEW keys, not one
    * giant one). The per-doc signals stay a narrow map.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      tokens(lower(col("text"))).as("toks"))
    val base = tok.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n"),
      size(array_distinct(col("toks"))).cast("long").as("nd"))
    val grams = tok.select(col("doc_id"),
      explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as("g"))
    val gm = grams.groupBy("doc_id", "g").count()
      .groupBy("doc_id")
      .agg(max("count").as("maxc"), sum("count").as("tot"))
    base.join(gm, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        round(lit(1.0) - col("nd").cast("double") / col("n").cast("double"), 4)
          .as("dup_token_frac"),
        round(coalesce(col("maxc").cast("double") / col("tot").cast("double"),
          lit(0.0)), 4).as("top_bigram_frac"))
  }

  /** Deterministic keep-decision for rate-based downsampling: true for
    * ~`rate` of ids, decided by the first 8 md5 hex chars (uniform in
    * hex space) against a precomputed hex threshold. Engine-portable
    * (pure string comparison — same convention as the train/val split),
    * reproducible, and stable under subsets/re-runs, unlike RNG
    * sampling. Map-only: the scalable way to reweight a corpus mix
    * (e.g. cap a dominant language at 50%) — no per-group sort or
    * window, so group skew is irrelevant.
    */
  def rateSampleKeep(id: Column, rate: Double): Column = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    if (rate >= 1.0) lit(true)
    else {
      val threshold = f"${(rate * 4294967296.0).toLong}%08x"
      substring(md5(id.cast("string").cast("binary")), 1, 8) < lit(threshold)
    }
  }

  /** Exact content fingerprint: md5 of the normalized text. Used by
    * exact dedup; portable (identical in any engine).
    */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  /** Token-budget systematic sampling: select documents proportional
    * to their TOKEN COUNT (the weight that matters when filling a
    * training-token budget), deterministically and with EXACT integer
    * arithmetic — the engine-portable alternative to priority
    * sampling, whose `u^(1/w)` keys are floating-point and
    * tie-fragile across engines. Documents are laid on the cumulative
    * token axis in `doc_id` order; a document is selected iff its
    * token interval `(cum_start, cum_end]` contains a multiple of
    * `step`, and `n_hits` (how many multiples — its systematic
    * multiplicity) is exactly `⌊cum_end/step⌋ − ⌊cum_start/step⌋`, so
    * `sum(n_hits) = ⌊total_tokens/step⌋` — the realized sample size
    * is exact, not expected. Emits `(doc_id, n_tokens, n_hits)` for
    * selected documents.
    *
    * Scale shape: the global prefix sum is the same two-phase
    * bucketed form as sequence packing — a per-bucket ROWS-frame
    * cumsum (parallel) plus one window over `buckets` rows of totals
    * (KB-scale, broadcast back). Integer `div` throughout: exact past
    * 2^53 tokens.
    */
  def sampleTokenBudget(docs: DataFrame, step: Long, buckets: Int = 256,
      maxIdHint: Option[Long] = None): DataFrame = {
    require(step > 0, "step must be positive")
    require(buckets > 0, "buckets must be positive")
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"))
    val maxId = maxIdHint.getOrElse(toks.agg(max("doc_id")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    })
    val width = math.max(1L, maxId / buckets + 1)
    val inBucket = toks
      .withColumn("bucket", expr(s"doc_id div ${width}L"))
      .withColumn("cum_in_bucket",
        sum("n_tokens").over(Window.partitionBy("bucket").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bucketStarts = inBucket.groupBy("bucket")
      .agg(max("cum_in_bucket").as("btok"))
      .withColumn("bstart",
        coalesce(sum("btok").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "bstart")
    inBucket.join(broadcast(bucketStarts), "bucket")
      .withColumn("cum_end", col("bstart") + col("cum_in_bucket"))
      .withColumn("n_hits",
        expr(s"cum_end div ${step}L") -
          expr(s"(cum_end - n_tokens) div ${step}L"))
      .filter(col("n_hits") >= 1)
      .select("doc_id", "n_tokens", "n_hits")
  }

  /** Target-mix resampling (the static form of corpus-mixture tuning:
    * "make English 30% of the corpus"): per-`group` keep rates are
    * DERIVED FROM THE DATA — `rate_g = min(1, target_g · total /
    * count_g)` — then applied with the same deterministic salted-md5
    * uniform filter as [[rateSampleKeep]] (salt "mix:", so the
    * decision is independent of the cap/split decisions). Groups
    * absent from `targets` and groups already below their target keep
    * everything — this operator only ever downsamples toward the mix,
    * it never upsamples.
    *
    * Shape: one map-combined count per group + a 1-row total, both
    * broadcast back; the filter itself is a narrow map. Rates are a
    * single fixed double expression over exact integer counts (the
    * [[bm25TopK]] determinism discipline), and the hex threshold is
    * recomputed per row from the broadcast rate — engine-portable, no
    * driver round-trip.
    */
  def resampleToMix(docs: DataFrame, targets: Map[String, Double],
      group: String = "lang"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(v => v > 0 && v <= 1),
      "target shares must be in (0, 1]")
    // one corpus count pass: the group-count table is materialized
    // (|groups| rows) and the total derives from it instead of a
    // second scan
    val counts = docs.groupBy(col(group)).agg(count(lit(1)).as("__cnt"))
      .materialize()
    val total = counts.agg(sum(col("__cnt")).as("__total"))
    val targetShare = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => when(col(group) === k, lit(v)).otherwise(acc)
    } // disjoint conditions: fold order is irrelevant
    val rates = counts.crossJoin(broadcast(total))
      // least() skips the NULL of untargeted groups → rate 1.0
      .withColumn("__rate", least(lit(1.0),
        targetShare * col("__total").cast("double") / col("__cnt").cast("double")))
      .select(col(group), col("__rate"))
    docs.join(broadcast(rates), Seq(group), "left")
      .filter(col("__rate").isNull || col("__rate") >= 1.0 ||
        substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8) <
          lpad(lower(hex(floor(col("__rate") * lit(4294967296.0)).cast("long"))),
            8, "0"))
      .drop("__rate")
  }

  /** Temperature-based mix resampling (the mT5/multilingual-T5 rule:
    * sample groups ∝ share^α, α < 1 flattening the head): per-doc
    * keep rate r_g = (cnt_g / cnt_min)^(α−1), so the SMALLEST group
    * keeps everything and a group 100× larger keeps 100^(α−1) of its
    * docs — expected output shares ∝ p^α without any fixed target
    * list (the difference from [[resampleToMix]], which needs explicit
    * per-group targets).
    *
    * Shape: one map-combined count per group + a 1-row min, broadcast
    * back; the keep decision is the salted-md5 rate rule of
    * [[rateSampleKeep]] — map-only, skew-immune. FP discipline: the
    * rate is one division + one pow, ROUNDED to 6 decimals before the
    * 2³² threshold floor, so a last-ulp libm pow difference cannot
    * flip a keep decision (the `text_lm_score` convention).
    */
  def temperatureResample(docs: DataFrame, alpha: Double,
      group: String = "lang"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    // the group-count table feeds the min aggregate AND the rate
    // derivation — materialize (|groups| rows) so the corpus count
    // runs once
    val counts = docs.groupBy(col(group)).agg(count(lit(1)).as("__cnt"))
      .materialize()
    val minCnt = counts.agg(min(col("__cnt")).as("__minc"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .withColumn("__rate", round(
        pow(col("__cnt").cast("double") / col("__minc").cast("double"),
          alpha - 1.0), 6))
      .select(col(group), col("__rate"))
    docs.join(broadcast(rates), Seq(group), "left")
      .filter(col("__rate") >= 1.0 ||
        substring(md5(concat(lit("temp:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8) <
          lpad(lower(hex(floor(col("__rate") * lit(4294967296.0)).cast("long"))),
            8, "0"))
      .drop("__rate")
  }

  /** Per-source document cap (the per-domain cap of web-corpus
    * pipelines: a handful of boilerplate-heavy domains otherwise
    * dominate the mix): keep at most `cap` documents per `source`,
    * selected deterministically — smallest `md5(doc_id)` first (the
    * same engine-portable uniform order as [[rateSampleKeep]] and the
    * train/val split), so the kept set is reproducible and stable
    * under re-runs and engine changes, unlike RNG top-N.
    *
    * Shape: one rank window per source. Group skew is bounded by the
    * hottest source's row count; a pathologically dominant source can
    * be pre-thinned with [[rateSampleKeep]] at ~2×cap/|source| before
    * the exact window — composition, not a special case.
    *
    * The ordering hash is SALTED ("cap:" prefix): every deterministic
    * decision in a pipeline (cap selection, train/val split, rate
    * sampling) draws from the same uniform md5 space, and two
    * decisions on the UNSALTED id hash are perfectly correlated — the
    * flagship caught exactly that (cap survivors were the low-hash
    * docs, so the later split tagged all of them 'train'). Distinct
    * salts make the decisions independent.
    */
  def capPerSource(cap: Int, source: Column): Column = {
    import org.apache.spark.sql.expressions.Window
    val order = substring(
      md5(concat(lit("cap:"), col("doc_id").cast("string")).cast("binary")), 1, 16)
    row_number().over(Window.partitionBy(source)
      .orderBy(order, col("doc_id"))) <= cap
  }

  /** Skew-proof [[capPerSource]]: the same deterministic smallest-
    * `md5("cap:" + doc_id)` selection, computed as a TWO-PHASE top-N so
    * no single reducer ever sees a dominant source's full row set.
    *
    * Phase 1 pre-caps per (source, input partition): each partition
    * contributes at most `cap` candidates per source
    * (`slice(array_sort(collect_list(ord, doc_id)), 1, cap)` — the
    * global top-cap is always contained in the union of per-partition
    * top-caps). The group key includes `spark_partition_id()`, so a
    * dominant source spreads over as many groups as it has input
    * partitions, and a group's aggregation buffer is bounded by
    * PARTITION size, never source size. Phase 2 runs the exact
    * row_number window over ≤ partitions×cap survivors per source —
    * driver-book-keeping-sized input no matter how skewed the corpus.
    * Phase 3 keeps the winners' full rows with a semi join — BROADCAST
    * by default (winners ≤ sources×cap rows, and broadcasting avoids
    * shuffling the corpus), but a per-DOMAIN cap over a web corpus can
    * have millions of sources: when |sources|×cap outgrows the
    * executor broadcast budget, pass `broadcastWinners = false` and
    * the semi join shuffles by doc_id instead (corpus-sized but
    * key-uniform — never skewed).
    *
    * Returns `docs` filtered to the kept rows — identical selection to
    * filtering on [[capPerSource]], structurally immune to the hot-
    * source skew the Column variant's scaladoc could only document.
    */
  def capBySource(docs: DataFrame, cap: Int, source: String = "source",
      broadcastWinners: Boolean = true): DataFrame =
    topKPerGroup(docs, cap, source,
      substring(md5(concat(lit("cap:"), col("doc_id").cast("string"))
        .cast("binary")), 1, 16),
      col("doc_id"), broadcastWinners)

  /** The two-phase top-N engine behind [[capBySource]], generalized to
    * ANY group column, order expression, and unique row id — "the k
    * best documents per domain by quality score" is
    * `topKPerGroup(docs, k, "source", col("quality"), col("doc_id"))`.
    * Selection: the k smallest `(order, id)` pairs per group (negate /
    * invert `order` for descending). Same scale shape as the cap:
    * per-(group, input-partition) sorted-slice pre-cap bounded by
    * partition size, exact rank window over ≤ partitions×k survivors,
    * semi join back (broadcast by default; see [[capBySource]] on when
    * to disable).
    */
  def topKPerGroup(docs: DataFrame, k: Int, group: String, order: Column,
      id: Column, broadcastWinners: Boolean = true): DataFrame =
    twoPhaseTopPerGroup(docs, k, group, order, id, broadcastWinners,
      ranked => ranked.filter(col("__rn") <= k))

  /** [[topKPerGroup]] with a PER-GROUP cap: `caps` carries one row per
    * group value with its cap in `capCol`; rows of groups absent from
    * `caps` are dropped, and a cap above `maxCap` is CLAMPED to it
    * (the per-partition pre-cap slices to `maxCap`, so a larger cap
    * could not be honored exactly — without the clamp the result
    * would silently depend on the partition layout). The cap table is
    * aggregate-sized (one row per group), so it rides a broadcast
    * join onto the ≤ partitions × maxCap pre-capped survivors — the
    * corpus itself never sees a per-group window. This is the
    * enforcement face of ratio-driven crawl policies: caps computed
    * FROM the data (e.g. a host's dup ratio) applied back per group.
    */
  def capPerGroup(docs: DataFrame, caps: DataFrame, capCol: String,
      maxCap: Int, group: String, order: Column, id: Column,
      broadcastWinners: Boolean = true): DataFrame =
    twoPhaseTopPerGroup(docs, maxCap, group, order, id, broadcastWinners,
      ranked => ranked
        .join(broadcast(caps.select(col(group).as("__grp"),
          least(col(capCol).cast("long"), lit(maxCap.toLong)).as("__cap"))),
          Seq("__grp"))
        .filter(col("__rn") <= col("__cap")))

  /** The shared two-phase skeleton behind [[topKPerGroup]] /
    * [[capPerGroup]]: per-(group, input-partition) sorted pre-cap to
    * `maxK` (bounded by partition size), exact rank window over the
    * ≤ partitions × maxK survivors, then the caller's `keep` filter on
    * the ranked survivors, semi join back. Only the keep rule differs:
    * a static k vs a broadcast-joined per-group cap.
    */
  private def twoPhaseTopPerGroup(docs: DataFrame, maxK: Int,
      group: String, order: Column, id: Column, broadcastWinners: Boolean,
      keep: DataFrame => DataFrame): DataFrame = {
    require(maxK >= 1, s"need a positive per-group bound, got $maxK")
    val perPart = docs
      .select(col(group).as("__grp"),
        struct(order.as("__ord"), id.as("__id")).as("__cand"))
      .groupBy(col("__grp"), spark_partition_id().as("__pid"))
      .agg(slice(array_sort(collect_list(col("__cand"))), 1, maxK).as("__top"))
    val winners = keep(perPart
        .select(col("__grp"), explode(col("__top")).as("__c"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__grp")
            .orderBy(col("__c.__ord"), col("__c.__id")))))
      .select(col("__c.__id").as("__winner_id"))
    docs.join(if (broadcastWinners) broadcast(winners) else winners,
      id === col("__winner_id"), "left_semi")
  }

  /** Corpus-level bigram language-model cross-entropy per document
    * (the CCNet-style quality signal: documents whose token
    * transitions are improbable under the corpus's own statistics are
    * boilerplate/garbled/outlier text). Add-one-smoothed bigram MLE:
    * for each in-document bigram (w1, w2),
    * `lp = ln(c(w1) + V) − ln(c(w1,w2) + 1)`; the document score is
    * the mean lp over its bigrams (natural-log cross-entropy, lower =
    * more typical). Emits `(doc_id, n_bigrams, xent)` for every
    * document with ≥ 1 bigram.
    *
    * Determinism across engines: per-bigram lp values join back to the
    * document and are summed as an ORDERED fold over the position-
    * sorted array (both engines add the same IEEE doubles in the same
    * order), and the mean is rounded once at the end — the DuckDB
    * oracle mirrors the whole chain.
    *
    * Shape: unigram/bigram counts are map-side-combined groupBys of
    * (8-to-16-byte) token keys; the count join-backs are
    * 1-row-per-key build sides (hot stopword bigrams AQE-split); the
    * per-doc fold shuffles (doc_id, pos, lp) triples only.
    */
  def lmCrossEntropy(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    // sequence(0, n-2) would run DESCENDING for single-token docs
    // (start > stop) — filter them out before building bigrams
    val bg = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as(Seq("pos", "b")))
      .select(col("doc_id"), col("pos"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .materialize() // feeds model build AND the scoring join
    val uni = toks.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
      .materialize() // feeds vocab count AND the unigram join
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val lp = bg
      .join(uni, Seq("w1"))
      .join(bi, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("pos"),
        // 9-decimal lp quantization on BOTH sides (the knCrossEntropy
        // / corpus_zipf discipline): JVM log vs DuckDB ln differ by
        // 1 ulp on some inputs, and the summed gate shouldn't ride it
        round(log(col("c1").cast("double") + col("__v").cast("double"))
          - log(col("c2").cast("double") + lit(1.0)), 9).as("lp"))
    lp.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
              s => s.getField("lp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
          4).as("xent"))
  }

  /** Zipf's-law fit: least-squares slope/intercept of ln(freq) vs
    * ln(rank) over the corpus's top-N token frequencies — the
    * classic corpus-health diagnostic (natural language sits near
    * slope −1; a flat slope flags synthetic/templated text, a cliff
    * flags boilerplate domination). Zipf 1949; the regression is the
    * standard log-log fit.
    *
    * Shape at scale: token counts are ONE map-combined aggregate; the
    * top-N cut is a TakeOrdered (count desc, token — deterministic
    * ties), and the regression runs on N rows (a global window over
    * ≤ N rows, not the corpus). FP discipline: each log is QUANTIZED
    * to 9 decimals before the sums (JVM StrictMath.log and libm ln
    * disagree by 1 ulp on some inputs — e.g. ln(936) — so raw logs
    * are not cross-engine reproducible; 9 decimals is far above ulp
    * noise and far below fit precision), then the four regression
    * sums are 0.0-seeded ordered folds in rank order and slope /
    * intercept are ONE fixed tree each — oracle-replayable.
    */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    require(topN >= 3, s"need topN >= 3, got $topN")
    val ranked = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("w"))))
    def foldSum(arr: Column, f: Column => Column): Column =
      aggregate(arr, lit(0.0), (acc, e) => acc + f(e))
    val sums = ranked
      .select(struct(col("rank"),
        round(log(col("rank").cast("double")), 9).as("x"),
        round(log(col("c").cast("double")), 9).as("y")).as("s"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(col("s"))).as("arr"))
      .select(col("n"),
        foldSum(col("arr"), _.getField("x")).as("sx"),
        foldSum(col("arr"), _.getField("y")).as("sy"),
        foldSum(col("arr"), e => e.getField("x") * e.getField("y")).as("sxy"),
        foldSum(col("arr"), e => e.getField("x") * e.getField("x")).as("sxx"))
    def nd: Column = col("n").cast("double")
    sums
      .select(col("n"), col("sx"), col("sy"),
        ((nd * col("sxy") - col("sx") * col("sy")) /
          (nd * col("sxx") - col("sx") * col("sx"))).as("slope"))
      .select(col("n").as("n_top"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / nd).as("intercept"))
  }

  /** Interpolated Kneser–Ney bigram cross-entropy (Kneser & Ney 1995;
    * Chen & Goodman 1998's interpolated form with fixed absolute
    * discount D = 0.75) — the quality-filtering LM the CCNet lineage
    * actually ships, next to [[lmCrossEntropy]]'s add-one baseline.
    * Per seen bigram: `P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·) +
    * (D·N1+(w₁·)/c(w₁·)) · (N1+(·w₂)/B)` — the continuation
    * probability counts CONTEXTS (how many distinct words precede
    * w₂), not tokens: "francisco" is frequent but only ever follows
    * "san", so its continuation mass is tiny. Scoring the training
    * corpus itself (self-perplexity, like `text_lm_score`) keeps
    * every scored bigram seen, so the max(·,0) clamp never binds and
    * no OOV arm is needed.
    *
    * Determinism: all five model statistics are exact integer
    * aggregates; each bigram's probability is ONE fixed FP tree and
    * the per-doc sum is an ordered fold over positions (the
    * `text_lm_score` discipline) — bit-replayable in the oracle.
    *
    * Shape at scale: model statistics are map-side-combined
    * aggregates OF THE BIGRAM TABLE (size |B|, vocabulary-bounded —
    * not the token stream); per-bigram log-probs are computed on that
    * table once and the position stream joins the scored table by
    * (w₁, w₂) — one shuffle of (doc_id, pos, w₁, w₂), never a
    * token-stream×model cross.
    */
  def knCrossEntropy(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    // the position stream feeds the model build AND the final scoring
    // join; the bigram model feeds FOUR consumers (fw, bw, totals,
    // scored) — materialize both once (Catalyst shares no subtrees;
    // round 8's plan re-tokenized the corpus 5 times)
    val bg = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as(Seq("pos", "b")))
      .select(col("doc_id"), col("pos"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .materialize()
    // the bigram-type total B rides the bi checkpoint job as an
    // observe metric (round 15) — it used to be a 1-row aggregate
    // crossJoined back, one extra bi scan + broadcast build in the
    // scoring job; as a literal the value (= bi's row count, exact in
    // double far beyond any vocabulary²) is bit-identical
    val (bi, biM) = graft.plans.Materialize.withMetrics(
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2")),
      count(lit(1)).as("__b"))
    val bTot = Option(biM("__b")).fold(0L)(_.asInstanceOf[Long])
    // context totals + distinct-successor counts in one pass over bi
    val fw = bi.groupBy("w1").agg(sum("c2").as("ctx"),
      count(lit(1)).as("n1fw"))
    val bw = bi.groupBy("w2").agg(count(lit(1)).as("n1bw"))
    def d(c: String): Column = col(c).cast("double")
    val p = (d("c2") - lit(discount)) / d("ctx") +
      (lit(discount) * d("n1fw") / d("ctx")) * (d("n1bw") / lit(bTot.toDouble))
    // per-bigram lp quantized to 9 decimals (the corpus_zipf
    // discipline): JVM log and DuckDB ln differ by 1 ulp on some
    // inputs, and an unquantized sum makes the 4-decimal gate a
    // cross-libm coin flip on unlucky fixtures
    val scored = bi.join(fw, Seq("w1")).join(bw, Seq("w2"))
      .select(col("w1"), col("w2"), round(-log(p), 9).as("lp"))
    bg.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
              s => s.getField("lp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
          4).as("kn_xent"))
  }

  /** Interpolated Kneser–Ney TRIGRAM cross-entropy (Chen & Goodman
    * 1998 §2.7's interpolated form, fixed D = 0.75 at every level) —
    * the order-3 step toward the 5-gram KenLM the CCNet-lineage
    * filters actually ship, extending [[knCrossEntropy]]'s exact
    * integer / fixed-FP-tree discipline one order up:
    *
    * `P(w₃|w₁w₂) = (c(w₁w₂w₃) − D)/c(w₁w₂·)
    *             + D·N1+(w₁w₂·)/c(w₁w₂·) · Pkn(w₃|w₂)`
    * `Pkn(w₃|w₂) = (N1+(·w₂w₃) − D)/N1+(·w₂·)
    *             + D·N1+(w₂·)/N1+(·w₂·) · N1+(·w₃)/B`
    *
    * — the top level uses token counts, both lower levels use
    * CONTINUATION (type) counts: N1+(·w₂w₃) counts distinct
    * predecessors of the bigram, N1+(·w₂·) distinct trigram types
    * with middle w₂, N1+(w₂·)/N1+(·w₃)/B come from the bigram type
    * table exactly as in the order-2 model. Self-perplexity keeps
    * every scored trigram seen, so every count the clamps guard is
    * ≥ 1 > D and no max(·,0)/OOV arm is needed.
    *
    * Determinism: all seven model statistics are exact integer
    * aggregates; each trigram's probability is ONE fixed FP tree
    * (mirrored operation-for-operation in the oracle), lp quantized
    * to 9 decimals, per-doc sum an ordered fold over positions.
    *
    * Shape at scale: statistics are map-side-combined aggregates of
    * the trigram/bigram TYPE tables (vocabulary-bounded, not the
    * token stream); the position stream joins the scored table once
    * by (w₁,w₂,w₃) — never a token-stream×model cross.
    */
  def kn3CrossEntropy(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    // trigram position stream feeds the model build AND the scoring
    // join; the trigram type table feeds FOUR consumers — materialize
    // both once (the knCrossEntropy fan-out discipline)
    val tg = toks
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, size(toks) - 3), i -> " +
            "struct(toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3))"))
          .as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), col("t.w1").as("w1"),
        col("t.w2").as("w2"), col("t.w3").as("w3"))
      .materialize()
    val tri = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .materialize()
    val ctx12 = tri.groupBy("w1", "w2")
      .agg(sum("c3").as("ctx"), count(lit(1)).as("n1fw12"))
    val mid23 = tri.groupBy("w2", "w3").agg(count(lit(1)).as("n1bw23"))
    val mid2 = tri.groupBy("w2").agg(count(lit(1)).as("nmid"))
    // the bigram TYPE set — unlike the order-2 model, no level of the
    // trigram formula reads bigram token counts, only type counts —
    // DERIVED from the trigram type table (prefixes ∪ suffixes ∪ the
    // one bigram of each exactly-2-token doc; the knNCrossEntropy
    // set-equality argument at k = 2), replacing a second corpus
    // tokenize+explode pass with a type-bounded distinct
    // bigram-type total B observed on the bi checkpoint job (round 15
    // — the [[knCrossEntropy]] rationale: one fewer bi scan +
    // broadcast build in the scoring job, bit-identical value)
    val (bi, biM) = graft.plans.Materialize.withMetrics(
      tri.select(col("w1").as("bw1"), col("w2").as("bw2"))
        .unionByName(tri.select(col("w2").as("bw1"), col("w3").as("bw2")))
        .unionByName(toks.filter(size(col("toks")) === 2)
          .select(expr("toks[0]").as("bw1"), expr("toks[1]").as("bw2")))
        .distinct(),
      count(lit(1)).as("__b"))
    val bTot = Option(biM("__b")).fold(0L)(_.asInstanceOf[Long])
    val fw2 = bi.groupBy("bw1").agg(count(lit(1)).as("n1fw2"))
      .withColumnRenamed("bw1", "w2")
    val bw3 = bi.groupBy("bw2").agg(count(lit(1)).as("n1bw3"))
      .withColumnRenamed("bw2", "w3")
    def d(c: String): Column = col(c).cast("double")
    val plow = (d("n1bw23") - lit(discount)) / d("nmid") +
      (lit(discount) * d("n1fw2") / d("nmid")) * (d("n1bw3") / lit(bTot.toDouble))
    val p = (d("c3") - lit(discount)) / d("ctx") +
      (lit(discount) * d("n1fw12") / d("ctx")) * plow
    val scored = tri
      .join(ctx12, Seq("w1", "w2")).join(mid23, Seq("w2", "w3"))
      .join(mid2, Seq("w2")).join(fw2, Seq("w2")).join(bw3, Seq("w3"))
      .select(col("w1"), col("w2"), col("w3"), round(-log(p), 9).as("lp"))
    tg.join(scored, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
              s => s.getField("lp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
          4).as("kn3_xent"))
  }

  /** Interpolated Kneser–Ney cross-entropy at ARBITRARY order n ≥ 3
    * (Chen & Goodman 1998 §2.7, fixed D = 0.75 at every level) — the
    * general ladder [[knCrossEntropy]] (order 2) and
    * [[kn3CrossEntropy]] (order 3) climb, up to the 5-gram model the
    * CCNet-lineage production filters actually ship (KenLM is an
    * order-5 interpolated-KN model). One recursion, shared by every
    * order:
    *
    * `P_n(w_n|w₁..w_{n−1}) = (c(w₁..w_n) − D)/c(w₁..w_{n−1}·)
    *                       + D·N1+(w₁..w_{n−1}·)/c(w₁..w_{n−1}·) · P_{n−1}`
    * `P_k(w_n|ctx_k)       = (N1+(·ctx_k w_n) − D)/N1+(·ctx_k ·)
    *                       + D·N1+(ctx_k ·)/N1+(·ctx_k ·) · P_{k−1}`
    * `P_1(w_n)             = N1+(·w_n)/B`
    *
    * with `ctx_k` the last k−1 words — the top level reads TOKEN
    * counts from the n-gram table, every lower level k reads
    * CONTINUATION (type) counts: numerator and denominator from the
    * corpus (k+1)-gram TYPE table (distinct predecessors of the
    * k-gram / distinct (k+1)-gram types around the context), the
    * backoff-weight numerator from the corpus k-gram type table —
    * exactly [[kn3CrossEntropy]]'s level-2 convention generalized.
    * Self-perplexity keeps every scored n-gram seen, so every count
    * is ≥ 1 > D and no max(·,0)/OOV arm is needed.
    *
    * Determinism: all (3(n−2)+4) model statistics are exact integer
    * aggregates; each n-gram's probability is ONE fixed FP tree built
    * innermost-level-first (mirrored operation-for-operation in the
    * oracle), lp quantized to 9 decimals, per-doc sum an ordered fold
    * over positions.
    *
    * Shape at scale: every statistic is a map-side-combined aggregate
    * of an n-gram/k-gram TYPE table (vocabulary-bounded — not the
    * token stream); the corpus is scanned ONCE (the n-gram position
    * stream): each k-gram type table derives from the (k+1)-gram one
    * — t_k = distinct(prefixes(t_{k+1}) ∪ suffixes(t_{k+1}) ∪ the
    * single k-gram of every exactly-k-token doc). Every k-gram
    * occurrence in a doc of length ≥ k+1 is the prefix or the suffix
    * of a (k+1)-gram occurrence there, and (k+1)-gram types cover all
    * (k+1)-gram occurrences, so the derived set equals the corpus
    * k-gram type set exactly (the only occurrences not covered are in
    * length-k docs, the third arm); round-14's probe pinned set
    * equality against the corpus-pass form at k = 2,3,4. This
    * replaces the previous n−2 corpus tokenize+explode+distinct
    * passes with type-bounded distincts (the round-14 measurement:
    * 2.4 s → 1.6 s at sf0.1 for the three tables, and at corpus
    * scale the dropped passes are full corpus scans). The position
    * stream joins the scored table ONCE by the n words — never a
    * token-stream×model cross.
    */
  def knNCrossEntropy(docs: DataFrame, order: Int,
      discount: Double = 0.75): DataFrame = {
    require(order >= 3 && order <= 6, s"order in [3,6], got $order")
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val n = order
    val ws = (1 to n).map(i => s"w$i")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    def gramStruct(k: Int): String =
      s"transform(sequence(0, size(toks) - $k), i -> struct(" +
        (0 until k).map(j => s"toks[i+$j] AS v${j + 1}").mkString(", ") + "))"
    // n-gram position stream: feeds the model build AND the scoring
    // join (the kn3CrossEntropy fan-out discipline)
    val gN = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(expr(gramStruct(n))).as(Seq("pos", "g")))
      .select(col("doc_id") +: col("pos") +:
        ws.zipWithIndex.map { case (w, j) => col(s"g.v${j + 1}").as(w) }: _*)
      .materialize()
    val tN = gN.groupBy(ws.map(col): _*).agg(count(lit(1)).as("cn"))
      .materialize()
    // k-gram TYPE tables, k = 2..n−1 (columns v1..vk), derived
    // DOWNWARD from the n-gram type table (tN's key set) — prefixes ∪
    // suffixes of the order above ∪ the one k-gram of each
    // exactly-k-token doc (see the scaladoc's set-equality argument);
    // no corpus re-scan per order
    // the bigram-type total B (needed by the unigram backoff level)
    // rides the k = 2 table's checkpoint job as an observe metric
    // (round 15): it used to be a 1-row aggregate crossJoined back —
    // one extra t2 scan + broadcast build in the scoring job; the
    // literal is bit-identical (= t2's row count)
    var bTot = 0L
    val tTypes: Map[Int, DataFrame] = {
      val m = scala.collection.mutable.Map[Int, DataFrame](
        n -> tN.select(
          ws.zipWithIndex.map { case (w, j) => col(w).as(s"v${j + 1}") }: _*))
      for (k <- (n - 1) to 2 by -1) {
        val hi = m(k + 1)
        val pref = hi.select((1 to k).map(j => col(s"v$j")): _*)
        val suf = hi.select(
          (2 to k + 1).map(j => col(s"v$j").as(s"v${j - 1}")): _*)
        val shortDocs = toks.filter(size(col("toks")) === k)
          .select((0 until k).map(j => expr(s"toks[$j]").as(s"v${j + 1}")): _*)
        val u = pref.unionByName(suf).unionByName(shortDocs).distinct()
        m(k) =
          if (k > 2) u.materialize()
          else {
            val (ck, met) = graft.plans.Materialize.withMetrics(u,
              count(lit(1)).as("__b"))
            bTot = Option(met("__b")).fold(0L)(_.asInstanceOf[Long])
            ck
          }
      }
      m.toMap
    }
    def d(c: Column): Column = c.cast("double")
    // level-k statistics keyed on the n-gram's LAST k (or k−1) words:
    // the level-k gram is (w_{n−k+1}..w_n), its context drops w_n
    def lastW(k: Int): Seq[String] = ws.takeRight(k)
    var scored: DataFrame = tN
      .join(tN.groupBy(ws.init.map(col): _*)
        .agg(sum("cn").as("ctx"), count(lit(1)).as("n1fw_top")), ws.init)
    for (k <- (n - 1) to 2 by -1) {
      val tk1 = tTypes(k + 1) // v1..v_{k+1}
      // N1+(· gram_k): distinct predecessors — group the (k+1)-gram
      // types by their last k words
      val cc = tk1.groupBy((2 to k + 1).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"cc$k"))
        .toDF(lastW(k) :+ s"cc$k": _*)
      // N1+(· ctx ·): (k+1)-gram types around the middle k−1 words
      val den = tk1.groupBy((2 to k).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"den$k"))
        .toDF(lastW(k).init :+ s"den$k": _*)
      // N1+(ctx ·): distinct continuations in the k-gram type table
      val lam = tTypes(k).groupBy((1 until k).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"lam$k"))
        .toDF(lastW(k).init :+ s"lam$k": _*)
      scored = scored.join(cc, lastW(k)).join(den, lastW(k).init)
        .join(lam, lastW(k).init)
    }
    val t2 = tTypes(2)
    val bw = t2.groupBy(col("v2")).agg(count(lit(1)).as("n1bw"))
      .toDF(ws.last, "n1bw")
    scored = scored.join(bw, Seq(ws.last))
    // the probability tree, innermost level first — identical nesting
    // to kn3CrossEntropy at n = 3
    var p: Column = d(col("n1bw")) / lit(bTot.toDouble)
    for (k <- 2 until n)
      p = (d(col(s"cc$k")) - lit(discount)) / d(col(s"den$k")) +
        (lit(discount) * d(col(s"lam$k")) / d(col(s"den$k"))) * p
    val pTop = (d(col("cn")) - lit(discount)) / d(col("ctx")) +
      (lit(discount) * d(col("n1fw_top")) / d(col("ctx"))) * p
    val lps = scored.select(ws.map(col) :+ round(-log(pTop), 9).as("lp"): _*)
    gN.join(lps, ws)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as(s"n_${n}grams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
              s => s.getField("lp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
          4).as(s"kn${n}_xent"))
  }

  /** PMI collocation extraction: the corpus's top-k two-word
    * expressions by pointwise mutual information,
    * `pmi = ln(p(w1,w2) / (p(w1)·p(w2)))` with `p(w1,w2)` over the
    * bigram space and unigram probabilities over the token space —
    * all counts exact integers, the log evaluated on one fixed ratio
    * expression (single division), so the DuckDB oracle matches
    * bit-for-bit. Rare-pair noise is cut by `minCount` BEFORE any
    * join (PMI's classic failure mode: a hapax pair of two hapax
    * words scores arbitrarily high — and pre-filtering also keeps
    * the join input small at scale).
    *
    * Scale shape: bigram/unigram counts are map-side-combined
    * groupBys; the surviving (≥ minCount) pairs join two 1-row-per-
    * word count tables; totals ride in as a broadcast 1-row cross
    * join; top-k is TakeOrdered under the deterministic
    * (pmi desc, w1, w2) order — no global sort.
    */
  def collocations(docs: DataFrame, k: Int = 20, minCount: Int = 5): DataFrame = {
    val toks = docs.select(split(lower(col("text")), "\\s+").as("toks"))
    val bg = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // unigram table feeds the totals row AND both count joins; the
    // bigram total comes from the UNFILTERED pair counts (sum of
    // n_pair = bigram occurrences), so the bigram stream is consumed
    // exactly once — round 8's plan re-tokenized the corpus 5 times
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .materialize()
    val pairsAll = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .materialize()
    val pairs = pairsAll.filter(col("n_pair") >= minCount)
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
      .crossJoin(pairsAll.agg(sum(col("n_pair")).as("n_bigrams")))
    val pmi = log(
      col("n_pair").cast("double") * col("n_tokens").cast("double")
        * col("n_tokens").cast("double")
        / (col("n_bigrams").cast("double") * col("c1").cast("double")
          * col("c2").cast("double")))
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("__pmi", pmi)
      .orderBy(col("__pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(col("__pmi"), 4).as("pmi"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal stopword-free token runs, each word scores
    * deg(w)/freq(w) over the candidate set — deg(w) accumulates the
    * length of every candidate containing w (self + co-occurring
    * words), freq(w) its occurrence count — and a phrase scores the
    * sum of its member word scores. The corpus-level top-`k` distinct
    * phrases by score, with occurrence counts. Candidates longer than
    * `maxLen` tokens are discarded (the standard cap: an
    * all-content-word page would otherwise contribute one giant
    * pseudo-phrase — and one skewed shuffle key).
    *
    * Delimiters are the fixture en stopword list ([[stopwords]]) —
    * deliberately the same tiny deterministic set language-ID uses.
    *
    * Determinism: deg/freq are exact integer aggregates; a word score
    * is ONE double division; a phrase score is an ORDERED left fold
    * over its words in phrase position order (the `lmCrossEntropy`
    * FP discipline — an unordered SUM of doubles would be
    * partitioning-dependent), so scores are bit-exact across engines
    * and the (score DESC, phrase) top-k is stable.
    *
    * Scale shape: candidate generation is map-only (delimiter
    * replace + split inside codegen); word stats are one
    * map-side-combined groupBy on the word; phrase scoring shuffles
    * only distinct (≤`maxLen`-token phrase, pos, word) rows; the
    * final top-k is a TakeOrdered, never a global sort.
    */
  def rakeKeyphrases(
      docs: DataFrame, maxLen: Int = 4, k: Int = 50): DataFrame = {
    val stops = stopwords("en")
    val marked = transform(split(lower(col("text")), "\\s+"),
      t => when(stops.map(lit).foldLeft(lit(false))((a, w) => a || t === w),
        lit("\u0001")).otherwise(t))
    val phrases = docs
      .select(explode(split(array_join(marked, " "), "\u0001")).as("praw"))
      .select(trim(col("praw")).as("phrase"))
      .filter(col("phrase") =!= "")
      .withColumn("__plen", size(split(col("phrase"), " ")))
      .filter(col("__plen") <= maxLen)
    val wordScores = phrases
      .select(explode(split(col("phrase"), " ")).as("w"), col("__plen"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("__plen").cast("long")).as("deg"))
      .select(col("w"),
        (col("deg").cast("double") / col("freq").cast("double")).as("wscore"))
    val distinctPhrases = phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"))
    distinctPhrases
      .select(col("phrase"), col("n_occ"),
        posexplode(split(col("phrase"), " ")).as(Seq("pos", "w")))
      .join(wordScores, Seq("w"))
      .groupBy("phrase", "n_occ")
      .agg(aggregate(
        array_sort(collect_list(struct(col("pos"), col("wscore")))),
        lit(0.0), (acc, e) => acc + e.getField("wscore")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
      .select("phrase", "n_occ", "score")
  }

  /** CCNet-style quality banding + per-band sampling over
    * [[lmCrossEntropy]] scores: head/middle/tail by FIXED cross-entropy
    * thresholds (the production CCNet shape — band cutoffs are
    * precomputed constants from a reference distribution; banding by
    * corpus quantiles instead would demand a global exact percentile,
    * i.e. unbounded single-reduce state at 100 TB), then each band
    * downsampled at its own rate via the salted ("qb:") deterministic
    * hash rule, independent of the split/cap/mix decisions. Everything
    * after the score is map-only — zero additional shuffles.
    */
  def qualityBands(
      scored: DataFrame, headMax: Double, middleMax: Double,
      headRate: Double = 1.0, middleRate: Double = 0.5,
      tailRate: Double = 0.1): DataFrame = {
    val bucket = when(col("xent") < headMax, "head")
      .when(col("xent") < middleMax, "middle")
      .otherwise("tail")
    val salted = concat(lit("qb:"), col("doc_id").cast("string"))
    scored.select(col("doc_id"), col("xent"), bucket.as("bucket"),
      when(bucket === "head", rateSampleKeep(salted, headRate))
        .when(bucket === "middle", rateSampleKeep(salted, middleRate))
        .otherwise(rateSampleKeep(salted, tailRate)).as("kept"))
  }

  /** PII redaction patterns, ordered (earlier patterns consume first).
    * Deliberately restricted to syntax valid AND equivalent in both
    * Java regex (Spark codegen'd `regexp_replace`) and RE2 (the DuckDB
    * oracle): character classes, bounded repetition, `\b` on a
    * word-char side only — no lookaround, no backrefs.
    * E.164 phones carry no leading `\b` ("+" is not a word char, so a
    * boundary before it never matches after whitespace).
    */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b" -> "<PHONE>",
    "\\+\\d{7,15}\\b" -> "<PHONE>")

  /** Redact emails, IPv4 addresses, and phone numbers. A fold of
    * codegen'd `regexp_replace`s — narrow, map-only, no UDF; the 100 TB
    * cost is one streaming pass over the text bytes.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Count of PII matches, same patterns in the same order: pattern i
    * is counted on text already redacted by patterns < i, so the count
    * is exactly the number of replacements [[redactPii]] makes (a phone
    * embedded in an email is one email, not two hits).
    */
  def piiHits(text: Column): Column =
    piiPatterns.foldLeft((text, lit(0L))) { case ((c, n), (pat, rep)) =>
      (regexp_replace(c, pat, rep),
        n + regexp_count(c, lit(pat)).cast("long"))
    }._2

  /** Per-TYPE PII counts under the [[redactPii]] sequential-redaction
    * semantics (pattern i counts on text already redacted by patterns
    * < i): one struct `(n_email, n_ip, n_phone)` — both `<PHONE>`
    * patterns fold into one type. The typed complement [[piiHits]]'
    * scalar total collapses; feeds the audit face a redaction
    * pipeline ships next to its output.
    */
  def piiHitsByType(text: Column): Column = {
    val perPattern = piiPatterns.foldLeft((text, Seq.empty[Column])) {
      case ((c, counts), (pat, rep)) =>
        (regexp_replace(c, pat, rep),
          counts :+ regexp_count(c, lit(pat)).cast("long"))
    }._2
    struct(perPattern(0).as("n_email"), perPattern(1).as("n_ip"),
      (perPattern(2) + perPattern(3)).as("n_phone"))
  }

  /** Per-source PII AUDIT (the data card every redaction pipeline
    * publishes): typed hit totals, affected-doc counts and rates —
    * the number that says whether a source is safe to ship and which
    * PII class dominates. One narrow map pass (the [[piiHitsByType]]
    * fold) + one map-combined groupBy; ratios are single divisions.
    */
  def piiAudit(docs: DataFrame): DataFrame = piiRate(piiAuditCounts(docs))

  /** The audit's ADDITIVE per-source counts (no rate): the mergeable
    * state the streaming twin accumulates per micro-batch — counts
    * from two disjoint batches sum to the counts of their union.
    */
  private[graft] def piiAuditCounts(docs: DataFrame): DataFrame = {
    val typed = docs.select(col("source"),
      piiHitsByType(col("text")).as("h"))
    typed.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("h.n_email")).as("n_email"),
      sum(col("h.n_ip")).as("n_ip"),
      sum(col("h.n_phone")).as("n_phone"),
      sum(when(col("h.n_email") + col("h.n_ip") + col("h.n_phone") > 0,
        1L).otherwise(0L)).as("n_docs_with_pii"))
  }

  /** Attach the single-division affected-doc rate to a counts table. */
  private[graft] def piiRate(counts: DataFrame): DataFrame =
    counts.withColumn("pii_doc_rate",
      round(col("n_docs_with_pii").cast("double")
        / col("n_docs").cast("double"), 9))

  /** Rolling polynomial (Karp–Rabin) fingerprint over the text:
    * f = Σ c_i · B^(n-1-i) mod P, B = 31, P a prime < 2^30 (keeps
    * `acc·B + c` < 2^36 — safe under Spark's default ANSI arithmetic,
    * no wraparound). Built from `aggregate` over the char codes — no
    * UDF; the rolling form is what a streaming dedup would
    * incrementally maintain.
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(1073741789L)),
    )

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS algorithm): hash the K-GRAM at every token position,
    * slide a window of `w` consecutive gram hashes per document,
    * select each window's MINIMUM (rightmost on ties), and keep the
    * distinct (hash, position) selections. Guarantees any shared run
    * of ≥ w+k−1 tokens between two documents contributes at least one
    * common fingerprint, while sharing a fingerprint witnesses a
    * shared k-token run (grams, not unigrams — a single shared common
    * word proves nothing); the sketch is ~2/(w+1) of the gram stream.
    *
    * Gram "hashes" are md5 hex strings so ordering — and therefore the
    * selected fingerprint set — is identical across engines (a DuckDB
    * oracle reproduces it exactly); the whole per-doc selection is ONE
    * codegen'd kernel call ([[graft.plans.TextKernels.winnow]],
    * monotonic deque) — no shuffle at all: the gram stream never
    * travels to a window exchange.
    */
  def winnowFingerprints(docs: DataFrame, w: Int = 4, k: Int = 3): DataFrame = {
    graft.plans.GraftFunctions.registerActive()
    docs.select(col("doc_id"),
        explode(call_function("graft_winnow", col("text"), lit(w), lit(k))).as("s"))
      .select(col("doc_id"), col("s.fp").as("fp"), col("s.fp_pos").as("fp_pos"))
  }

  /** The relational window formulation of [[winnowFingerprints]] —
    * kept as the semantic baseline the kernel is unit-tested against
    * (positioned k-grams → per-doc ordered window min → distinct;
    * correct but shuffles the full gram stream by doc_id).
    */
  private[graft] def winnowFingerprintsRelational(
      docs: DataFrame, w: Int = 4, k: Int = 3): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val gramCount = greatest(size(toks) - k, lit(0)) + 1
    val grams = docs.select(
      col("doc_id"),
      gramCount.cast("long").as("n_gr"),
      posexplode(transform(sequence(lit(0), gramCount - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("n_gr"), col("pos").cast("long").as("pos"),
        md5(col("gram").cast("binary")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("sel", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .filter(col("pos") <= col("n_gr") - w) // full windows only
      .select(col("doc_id"), col("sel.h").as("fp"), (-col("sel.np")).as("fp_pos"))
      .distinct()
  }

  /** BM25 top-k retrieval (Robertson/Spärck Jones; the BM25+ idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` that Lucene uses, so scores
    * are never negative for corpus-dominant terms): score every
    * document against a fixed bag of query `terms` and keep the best
    * `k` by `(score desc, doc_id)`.
    *
    * Determinism across engines (same discipline as [[lmCrossEntropy]]):
    * every corpus statistic is an exact integer (N, Σdl, per-term df),
    * the double arithmetic per document is ONE fixed expression tree
    * evaluated identically by Spark and the DuckDB oracle (term
    * contributions added in declared term order, divisions written
    * identically), and the score is rounded once at the end, before
    * the ordering tiebreak.
    *
    * Shape: one pass computes N/Σdl/df as a single map-side-combined
    * aggregate (terms are a tiny fixed set — df per term is a
    * conditional sum, no per-token explode); the 1-row stats broadcast
    * back; scoring is a narrow map over (doc_id, toks, dl); top-k is
    * TakeOrdered — no global sort, no shuffle of the corpus.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val statAggs =
      count(lit(1)).as("n_docs") +: sum(col("dl")).as("total_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
            .as(s"df_$i")
        }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)
    val scored = toks.crossJoin(broadcast(stats))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      val idf = log(
        (col("n_docs").cast("double") - col(s"df_$i").cast("double") + lit(0.5))
          / (col(s"df_$i").cast("double") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
          * col("n_docs").cast("double") / col("total_dl").cast("double")))
    }.reduceLeft(_ + _)
    scored
      .select(col("doc_id"), round(score, 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Capped inverted-index posting lists: for every token with
    * document frequency ≥ `minDf`, the exact df and the `cap` SMALLEST
    * doc_ids containing it (the deterministic head of the posting
    * list), serialized as a comma-joined string. The seed of a
    * distributed retrieval index; the df threshold doubles as the
    * stopword/hapax cut.
    *
    * Skew shape (same two-phase discipline as [[capBySource]]): tokens
    * are first set-aggregated per (token, input partition) — a
    * stopword's buffer is bounded by PARTITION size, and per-partition
    * heads are pre-capped to `cap` before the per-token merge, so the
    * final per-token row merges ≤ partitions×cap ids no matter how hot
    * the token. df stays exact: a document lives in exactly one input
    * partition, so per-partition distinct counts add up.
    */
  def invertedPostings(docs: DataFrame, minDf: Long, cap: Int): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(
        split(lower(col("text")), "\\s+"))).as("token"))
    val perPart = tok
      .groupBy(col("token"), spark_partition_id().as("__pid"))
      .agg(collect_set(col("doc_id")).as("__ids"))
      .select(col("token"),
        size(col("__ids")).cast("long").as("__df"),
        slice(array_sort(col("__ids")), 1, cap).as("__head"))
    perPart.groupBy(col("token"))
      .agg(
        sum(col("__df")).as("df"),
        array_join(transform(
          slice(array_sort(flatten(collect_list(col("__head")))), 1, cap),
          x => x.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Hashed-feature LINEAR QUALITY CLASSIFIER applied at corpus scale
    * — the fastText/CCNet-shaped filter stage (a pretrained linear
    * model over hashed unigram+bigram features, the production
    * quality-filter architecture) with a deterministic md5-derived
    * weight table standing in for trained parameters: feature f hashes
    * to bucket `md5("qf_"+f) % dims`, whose weight is the INTEGER
    * `md5("qw_"+bucket) % 2001 − 1000` (∈ [−1000, 1000]). The score is
    * `Σ w / (1000 · n_feats)` — the sum is exact 64-bit integer
    * arithmetic (order-independent, so any engine reproduces it
    * bit-for-bit regardless of list-summation order) with ONE IEEE
    * division at the end. Map-only: one projection over the corpus,
    * no shuffle, no UDF — every step is codegen'd `aggregate`/`md5`/
    * `conv` expressions.
    */
  def hashedLinearScore(text: Column, dims: Int = 1024): Column = {
    val toks = filter(tokens(lower(text)), t => length(t) > 0)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val feats = concat(toks, bigrams)
    def bucket(f: Column): Column =
      pmod(conv(substring(md5(concat(lit("qf_"), f)), 1, 8), 16, 10)
        .cast("long"), lit(dims.toLong))
    def weightInt(b: Column): Column =
      pmod(conv(substring(md5(concat(lit("qw_"), b.cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(2001L)) - lit(1000L)
    val total = aggregate(feats, lit(0L),
      (acc, f) => acc + weightInt(bucket(f)))
    when(size(feats) === 0, lit(0.0))
      .otherwise(total.cast("double")
        / (lit(1000.0) * size(feats).cast("double")))
  }

  /** C4-style blocklist screen (Raffel et al. 2020 §2.2 — the
    * "badwords" step every web-corpus pipeline runs between langid
    * and quality scoring; reference: the list the C4 cleanup applies
    * to each page). Per-doc OCCURRENCE counts against a word +
    * two-word-phrase blocklist, and the keep flag (zero hits).
    *
    * Scale shape: map-only. The blocklist rides as LITERALS folded
    * into codegen'd higher-order array functions — single words test
    * membership in the token array, phrases membership in the
    * adjacent-bigram array (`zip_with` of the two token slices, the
    * [[hashedLinearScore]] bigram construction) — so there is no
    * join, no shuffle, and the text never leaves its input split.
    * Occurrences, not distinct matches: "slow slow" counts 2; the
    * bigram count is over OVERLAPPING adjacent pairs ("big big big"
    * hits "big big" twice).
    *
    * Entries must be 1 or 2 whitespace-separated lowercase words
    * (asserted) — the C4 list is overwhelmingly unigrams/bigrams;
    * longer phrases would need per-length n-gram arrays.
    */
  def blocklistScreen(docs: DataFrame, blocklist: Seq[String]): DataFrame = {
    val (wordHits, phraseHits) = blocklistHitCols(col("text"), blocklist)
    docs.select(col("doc_id"),
        wordHits.as("word_hits"),
        phraseHits.as("phrase_hits"))
      .withColumn("n_hits", col("word_hits") + col("phrase_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** Code-vs-prose routing screen — the corpus-split step a mixed
    * pretraining pipeline runs before language-specific processing
    * (C4 dropped any page containing '{' outright, Raffel et al. 2020
    * §2.2; StarCoder-era pipelines route instead of drop). Two
    * deterministic map-only signals: density of code punctuation
    * (`{}();=<>` — the characters prose grammar almost never emits)
    * and exact whitespace-token hits against a small case-sensitive
    * keyword list chosen to be rare in prose (`def`, `import`,
    * `printf`, …). Score = mean of the two saturating signals
    * (symbol density saturates at 5%, keywords at 4 hits);
    * `is_code` = score ≥ 0.5, i.e. both signals firing or either
    * alone at saturation.
    *
    * Scale shape: one narrow projection — no tokens, characters, or
    * text ever reach a shuffle (same contract as [[qualityScore]]).
    */
  def codeScreen(docs: DataFrame): DataFrame = {
    val kws = Seq("def", "return", "import", "class", "function",
      "void", "struct", "lambda", "elif", "printf")
    val nSym = (length(col("text")) -
      length(regexp_replace(col("text"), "[{}();=<>]", ""))).cast("long")
    val kw = size(filter(tokens(col("text")),
      t => kws.map(e => t === lit(e)).reduce(_ || _))).cast("long")
    val symRatioRaw = nSym.cast("double") /
      greatest(length(col("text")).cast("double"), lit(1.0))
    val score = round((least(symRatioRaw * 20, lit(1.0))
      + least(kw.cast("double") / lit(4.0), lit(1.0))) / 2, 4)
    docs.select(col("doc_id"),
      nSym.as("n_symbols"),
      round(symRatioRaw, 4).as("symbol_ratio"),
      kw.as("kw_hits"),
      score.as("code_score"),
      (score >= 0.5).as("is_code"))
  }

  /** (word-hit count, phrase-hit count) as bare Columns — the
    * [[blocklistScreen]] semantics, reusable by composition faces
    * like [[curationFunnel]].
    */
  def blocklistHitCols(text: Column,
      blocklist: Seq[String]): (Column, Column) = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val (phrases, words) = blocklist.partition(_.contains(" "))
    require(phrases.forall(_.split(" ").length == 2),
      s"phrases must be exactly 2 words: ${phrases.filter(_.split(" ").length != 2)}")
    require(blocklist.forall(e => e == e.toLowerCase.trim),
      "blocklist entries must be lowercase and trimmed")
    def countIn(arr: Column, entries: Seq[String]): Column =
      if (entries.isEmpty) lit(0L)
      else size(filter(arr,
        t => entries.map(e => t === lit(e)).reduce(_ || _))).cast("long")
    val toks = filter(tokens(lower(text)), t => length(t) > 0)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    (countIn(toks, words), countIn(bigrams, phrases))
  }

  /** Curation funnel report — the per-stage audit every production
    * pipeline ships next to its output (how many documents each
    * screen dropped, in order): conjunctive CUMULATIVE stages, one
    * row per stage with `(stage, name, n_in, n_kept, drop_rate)`
    * where `n_in` of stage k is `n_kept` of stage k−1.
    *
    * `screens` are per-row boolean Columns (reuse the standalone
    * operators' Column faces — [[langId]], [[blocklistHitCols]],
    * [[gopherKeep]], [[hashedLinearScore]], token bands);
    * `dedupStage` optionally appends a keep-first-by-key stage
    * (first `doc_id` per key survives — content digest, URL, or a
    * prefix digest).
    *
    * Scale shape: every screen flag is computed in ONE narrow map
    * pass; the only shuffles are the digest window for the dedup
    * flag (16-byte keys — text never rides a shuffle) and the final
    * map-combined aggregation, whose conditional sums serve EVERY
    * stage at once (the [[classifierPrReport]] one-pass pattern — no
    * per-stage corpus re-scan).
    */
  def curationFunnel(docs: DataFrame, screens: Seq[(String, Column)],
      dedupStage: Option[(String, Column)] = None): DataFrame = {
    require(screens.nonEmpty, "need at least one screen stage")
    val screenCols = screens.zipWithIndex.map { case ((_, c), i) =>
      c.as(s"f$i") }
    val flagged = docs.select(
      (col("doc_id") +: screenCols) ++
        dedupStage.map { case (_, key) => key.as("__key") }.toSeq: _*)
    val withDedup = dedupStage match {
      case Some((name, _)) => (flagged.withColumn(s"f${screens.size}",
          row_number().over(Window.partitionBy(col("__key"))
            .orderBy(col("doc_id"))) === 1),
        screens.map(_._1) :+ name)
      case None => (flagged, screens.map(_._1))
    }
    val (df, names) = withDedup
    funnelRows(funnelAgg(df, names.size), names)
  }

  /** One-row cumulative-conjunction counts `n0..nK` over flag columns
    * `f0..f{K−1}` — the funnel's single map-combined aggregation,
    * shared by [[curationFunnel]] and the streaming twin (whose
    * per-batch counts are ADDITIVE in exactly this form).
    */
  private[graft] def funnelAgg(df: DataFrame, nStages: Int): DataFrame = {
    val cum = (0 until nStages).map { i =>
      (0 to i).map(j => col(s"f$j")).reduce(_ && _) }
    // coalesce: `sum` over ZERO rows is NULL — an empty corpus (or an
    // empty streaming micro-batch, whose getLong would NPE) must report
    // 0 kept at every stage, not NULL rows
    val aggs = count(lit(1)).as("n0") +:
      cum.zipWithIndex.map { case (c, i) =>
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"n${i + 1}") }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivot a one-row `n0..nK` counts frame into the funnel's
    * per-stage rows `(stage, name, n_in, n_kept, drop_rate)`.
    */
  private[graft] def funnelRows(one: DataFrame,
      names: Seq[String]): DataFrame = {
    val rows = explode(array(names.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1L).as("stage"), lit(name).as("name"),
        col(s"n$i").as("n_in"), col(s"n${i + 1}").as("n_kept"))
    }: _*))
    one.select(rows.as("r")).select(col("r.*"))
      .withColumn("drop_rate",
        when(col("n_in") === 0L, lit(0.0))
          .otherwise(round((col("n_in") - col("n_kept")).cast("double")
            / col("n_in").cast("double"), 9)))
  }

  /** Mojibake / encoding-damage signal (the ftfy lineage — UTF-8 text
    * mis-decoded as Latin-1/CP1252 leaves characteristic artifacts:
    * 'Ã'/'Â' lead bytes and U+FFFD replacement chars). Per-doc marker
    * count, character length, damage rate, and the suspect flag.
    *
    * Counting is `length(t) − length(replace(t, marker, ''))` per
    * single-char marker — pure codegen'd string built-ins, engine-
    * portable (both Spark and SQL `length` count CHARACTERS), no
    * regex dialect in play. Map-only: no join, no shuffle.
    */
  def mojibakeSignal(docs: DataFrame, textCol: Column = col("text"),
      markers: Seq[String] = Seq("Ã", "Â", "�")): DataFrame = {
    require(markers.nonEmpty && markers.forall(_.length == 1),
      "markers must be single characters")
    val hits = markers.map(mk =>
        length(textCol) - length(replace(textCol, lit(mk), lit(""))))
      .reduce(_ + _).cast("long")
    docs.select(col("doc_id"), hits.as("mojibake_hits"),
        length(textCol).cast("long").as("n_chars"))
      .withColumn("mojibake_rate",
        // empty doc: 0.0, not the NaN a raw 0/0 would produce (NaN
        // fails every numeric alert threshold — the embDriftStream
        // lesson, and the hashedLinearScore nf=0 convention)
        when(col("n_chars") === 0L, lit(0.0))
          .otherwise(round(col("mojibake_hits").cast("double")
            / col("n_chars").cast("double"), 9)))
      .withColumn("suspect", col("mojibake_hits") > 0L)
  }

  /** Classifier calibration contract (the `sim_recall_report` pattern
    * applied to [[hashedLinearScore]]): EXACT per-threshold confusion
    * counts and precision/recall against a deterministic weak label,
    * one row per threshold. ONE corpus pass serves every threshold —
    * the per-doc (score, label) projection is aggregated with
    * 2·|T|+2 conditional sums (map-side combined, single shuffle of
    * one partial row per task), then unpivoted to |T| rows; no
    * per-threshold corpus scan, no corpus×T explosion.
    *
    * Weak label: `token count ≥ minTokens` over the same token list
    * the features use — deterministic and oracle-replayable (the
    * calibration face needs a label the score does NOT encode
    * directly; length is the standard weak proxy). Precision is NULL
    * when nothing is predicted positive (no false positives to rate);
    * recall is NULL only when the corpus holds no positives. Recall
    * is non-increasing in the threshold by construction (spec-pinned).
    */
  def classifierPrReport(docs: DataFrame, thresholds: Seq[Double],
      minTokens: Int): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds == thresholds.sorted, "thresholds must be ascending")
    val toks = filter(tokens(lower(col("text"))), t => length(t) > 0)
    val scored = docs.select(
      hashedLinearScore(col("text")).as("__score"),
      (size(toks) >= minTokens).as("__label"))
    val aggs =
      sum(when(col("__label"), 1L).otherwise(0L)).as("__pos") +:
      count(lit(1)).as("__n") +:
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__score") > t && col("__label"), 1L).otherwise(0L))
          .as(s"__tp_$i"),
        sum(when(col("__score") > t, 1L).otherwise(0L)).as(s"__pred_$i"))
      }
    val one = scored.agg(aggs.head, aggs.tail: _*)
    val rows = explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        col(s"__tp_$i").as("tp"),
        (col(s"__pred_$i") - col(s"__tp_$i")).as("fp"),
        (col("__pos") - col(s"__tp_$i")).as("fn"),
        (col("__n") - col(s"__pred_$i") - col("__pos") + col(s"__tp_$i"))
          .as("tn"))
    }: _*))
    one.select(rows.as("r")).select(col("r.*"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double")
            / (col("tp") + col("fp")).cast("double"), 9)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double"), 9)))
  }

  /** Stride-scheduled SOURCE INTERLEAVE (curriculum/mixing-order
    * construction — the deterministic counterpart of rate-based
    * sampling): the n-th document of source s is assigned the virtual
    * time `(n − 0.5) / w_s` (stride scheduling, Waldspurger & Weihl
    * OSDI'95), and reading the corpus in virtual-time order yields a
    * stream where every prefix carries each source in proportion to
    * its weight — the property curriculum mixing needs, with no
    * randomness and no drift (a weight-w source is never more than
    * one item off its w·T entitlement at any prefix T).
    *
    * Scale shape: the only sequential ingredient, the per-source
    * ordinal n, comes from the same two-phase prefix-sum discipline
    * as [[Packing.packChunks]] — doc_id-range buckets numbered
    * independently (bounded window partitions), per-(source, bucket)
    * counts (KB-scale) broadcast back as offsets. No global window,
    * no single-partition exchange; the final interleaved prefix is a
    * distributed TakeOrdered.
    */
  def strideInterleave(
      docs: DataFrame, weightOf: Column => Column,
      topN: Int, buckets: Int = 256): DataFrame = {
    require(topN > 0 && buckets > 0)
    val ids = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("source"))
    val maxId = ids.agg(max("doc_id")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val width = math.max(1L, maxId / buckets + 1)
    val bucketed = ids.withColumn("bucket", expr(s"doc_id div ${width}L"))
    val inB = bucketed.withColumn("rk_in",
      row_number().over(
        Window.partitionBy("source", "bucket").orderBy("doc_id")).cast("long"))
    val starts = inB.groupBy("source", "bucket")
      .agg(max("rk_in").as("bn"))
      .withColumn("bstart",
        coalesce(sum("bn").over(Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "bucket", "bstart")
    val keyed = inB.join(broadcast(starts), Seq("source", "bucket"))
      .withColumn("n", col("bstart") + col("rk_in"))
      .withColumn("__key",
        (col("n").cast("double") - lit(0.5)) / weightOf(col("source")))
    val prefix = keyed.orderBy(col("__key"), col("doc_id")).limit(topN)
    prefix.withColumn("pos",
        row_number().over(Window.orderBy(col("__key"), col("doc_id"))).cast("long"))
      .select(col("pos"), col("doc_id"), col("source"), col("n"),
        round(col("__key"), 6).as("stride_key"))
  }

  /** SINGLE-PASS heavy-hitter state: one scan of the token stream
    * emits, per occurrence, `d` count-min rows (row id, md5-portable
    * bucket) AND — for the deterministic 1/`sampleMod` occurrence
    * sample — a candidate row carrying the token string, all folded by
    * ONE map-side-combined aggregation into a bounded table:
    * `d·w` sketch cells + the sampled distinct tokens. That bound is
    * the 100-TB contract — the corpus text never shuffles, the
    * aggregate state is fixed-KB regardless of vocabulary size (the
    * distinct-token table, which `agg_heavy_hitters`'s exact arm
    * shuffles, can be billions of rows on web text), and a true
    * ε-heavy hitter is present in the occurrence sample w.h.p.
    * (a token with εN occurrences misses a 1/64 sample with
    * probability (1−1/64)^(εN) — vanishing for any hitter worth
    * reporting). Output schema: `kind` (0..d−1 = sketch row, d =
    * candidate), `k` (bucket), `ctok` (candidate token or null),
    * `cnt`.
    *
    * All hashes are md5-derived so a SQL oracle replays the sketch,
    * the sample, and the estimates bit-for-bit.
    */
  def cmsHeavyHitterSketch(
      docs: DataFrame, d: Int = 4, w: Int = 4096,
      sampleMod: Int = 64): DataFrame = {
    require(d >= 1 && w >= 1 && sampleMod >= 1)
    val raw = docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), (col("pos") + 1).as("ord"), col("tok"))
    val cmsRows = (0 until d).map { r =>
      struct(lit(r).as("kind"), cmsBucket(col("tok"), r, w).as("k"),
        lit(null).cast("string").as("ctok"))
    }
    val sampled = pmod(conv(substring(md5(concat(lit("smp_"),
      col("doc_id").cast("string"), lit("_"), col("ord").cast("string"),
      lit("_"), col("tok"))), 1, 8), 16, 10).cast("long"),
      lit(sampleMod.toLong)) === 0L
    val candRow = struct(lit(d).as("kind"), lit(0L).as("k"),
      when(sampled, col("tok")).as("ctok"))
    raw.select(explode(array((cmsRows :+ candRow): _*)).as("e"))
      .select(col("e.kind"), col("e.k"), col("e.ctok"))
      .filter(col("kind") < d || col("ctok").isNotNull)
      .groupBy("kind", "k", "ctok")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-min bucket of a token for sketch row `r`: first 8 md5 hex
    * digits of `"cms<r>_<token>"` mod `w` — engine-portable (an
    * external oracle recomputes the same md5 of the same ASCII).
    */
  private[graft] def cmsBucket(tok: Column, r: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms${r}_"), tok)), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))
}
