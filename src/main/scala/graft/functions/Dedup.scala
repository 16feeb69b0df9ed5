package graft.functions
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Deduplication operators for training-data pipelines (north star).
  *
  * Scale design: every variant is candidate-generation + verification.
  * Exact dedup is a hash groupBy (one shuffle on the fingerprint).
  * N-gram Jaccard generates candidates with prefix filtering (only the
  * rarest shingles of each doc join — exact, never all-pairs).
  * MinHash/LSH and SimHash generate candidates by bucketing — only
  * near-identical docs ever meet in a shuffle. Verification always runs
  * per candidate pair against the per-doc shingle arrays.
  *
  * Shingling and MinHash signatures are single codegen'd kernel calls
  * per document ([[graft.plans.TextKernels]]) — the document text is
  * read once, narrowly, and never travels through a shuffle.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest doc_id per identical text. One
    * map-side-combined shuffle on the md5 fingerprint (shuffling the
    * 16-byte digest, not the document body).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Order-insensitive exact dedup: fingerprint the sorted token
    * MULTISET (duplicate tokens retained), so documents that differ
    * only by token order — shuffled list pages, re-serialized JSON
    * fields, bullet reorderings — share a fingerprint that plain
    * [[exact]] would miss. Emits every document with its bag hash,
    * bag-group size, and a dup flag (the per-doc profile face; group
    * sizes are 1 when the corpus has no reordered copies).
    *
    * Scale shape: the fingerprint is one codegen'd map pass
    * (split → sort → concat → md5, all doc-local); only
    * (doc_id, 16-byte digest) pairs reach the group-size window,
    * which shuffles by the digest — uniformly distributed by
    * construction, skew-free.
    */
  def bagFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        md5(concat_ws(" ",
          array_sort(split(lower(col("text")), "\\s+"))).cast("binary"))
          .as("bag_hash"))
      .withColumn("n_same_bag",
        count(lit(1)).over(Window.partitionBy(col("bag_hash"))))
      .withColumn("is_dup", col("n_same_bag") > 1)

  /** Exact-dedup'd corpus: the winner rows themselves. */
  def exactSurvivors(docs: DataFrame): DataFrame =
    docs.join(
      exact(docs).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** CCNet-style KEEP-FIRST unit dedup (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): web corpora are deduplicated at paragraph granularity —
    * the FIRST occurrence of every paragraph survives and later
    * verbatim repeats are dropped. This is the complement of
    * [[removeRepeatedSpans]] (Lee et al.), which removes EVERY
    * occurrence of a repeated span including the first; CCNet's rule
    * preserves exactly one copy of boilerplate so no content is lost,
    * Lee's removes the boilerplate outright.
    *
    * Fixture documents carry no newlines, so the dedup unit is a
    * non-overlapping `w`-token window (the final unit of a doc may be
    * shorter). Unit identity = md5 of the LOWERCASED unit text (case
    * affects only hashing, not the reassembled output, matching the
    * [[repeatedSpans]] discipline); the global keep order is
    * (doc_id, unit_idx).
    *
    * Returns one row per document: `(doc_id, n_units, n_kept,
    * clean_text)` — `clean_text` is the ordered join of the kept
    * units ('' when every unit of the doc appeared earlier).
    *
    * Scale shape: unit hashes are computed map-side by a codegen'd
    * projection; only (16-byte digest, doc_id, unit_idx) triples ride
    * the first-seen shuffle (uniform by construction — digest-keyed,
    * skew-free). Winners fold to a per-doc kept-index ARRAY (8 bytes
    * per kept unit), and the clean text is rebuilt map-side from the
    * original row after ONE doc_id-keyed join — the corpus text
    * crosses exactly one exchange, the same fp-groupBy + join-back
    * discipline as `publish_unigram`.
    */
  def keepFirstUnits(docs: DataFrame, w: Int = 10): DataFrame = {
    require(w >= 1, s"unit width must be >= 1, got $w")
    val toks = split(col("text"), "\\s+")
    val nUnits = ceil(size(toks).cast("double") / w).cast("int")
    def unitAt(i: Column): Column =
      array_join(slice(toks, i * w + 1, lit(w)), " ")
    val units = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nUnits - 1),
        i => md5(lower(unitAt(i))))).as(Seq("unit_idx", "uh")))
    val keptIdx = units
      .withColumn("__rn", row_number().over(
        Window.partitionBy("uh").orderBy("doc_id", "unit_idx")))
      .filter(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("unit_idx"))).as("__kept"),
        count(lit(1)).as("n_kept"))
    docs.join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        nUnits.cast("long").as("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        array_join(transform(
          coalesce(col("__kept"), lit(Array.empty[Int])),
          i => unitAt(i)), " ").as("clean_text"))
  }

  /** C4-style boilerplate removal (Raffel et al. 2020 §2.2 lineage;
    * CCNet's cross-document line dedup generalized to w-token units):
    * any unit occurring at least `maxDf` times ACROSS the corpus is
    * treated as boilerplate — navigation chrome, license banners,
    * cookie notices — and removed from EVERY document (where
    * [[keepFirstUnits]] keeps the first occurrence, a boilerplate
    * unit has no canonical owner: all copies go). Remaining units
    * rejoin in original order.
    *
    * Shape at scale: only 16-byte unit digests shuffle — never text;
    * the hot-unit table is the output of an aggregate filtered to
    * count ≥ maxDf (tiny by construction — corpus-frequent units are
    * few), so the anti join broadcasts; the rebuild is a per-doc
    * collect of int indices. One digest shuffle + one broadcast anti
    * join + one per-doc group — same plan family as the keep-first
    * variant, minus its global first-occurrence window.
    */
  def stripBoilerplate(docs: DataFrame, w: Int = 10,
      maxDf: Long = 3): DataFrame = {
    require(w >= 1, s"unit width must be >= 1, got $w")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val toks = split(col("text"), "\\s+")
    val nUnits = ceil(size(toks).cast("double") / w).cast("int")
    def unitAt(i: Column): Column =
      array_join(slice(toks, i * w + 1, lit(w)), " ")
    // the unit-digest stream feeds the hot-count aggregate AND the
    // anti join — one digest pass, materialized
    val units = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nUnits - 1),
        i => md5(lower(unitAt(i))))).as(Seq("unit_idx", "uh")))
      .materialize()
    val hot = units.groupBy("uh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= maxDf).select("uh")
    val keptIdx = units
      .join(broadcast(hot), Seq("uh"), "left_anti")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("unit_idx"))).as("__kept"),
        count(lit(1)).as("n_kept"))
    docs.join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        nUnits.cast("long").as("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        array_join(transform(
          coalesce(col("__kept"), lit(Array.empty[Int])),
          i => unitAt(i)), " ").as("clean_text"))
  }

  // ------------------------------------------------------------- shingles

  /** Distinct hashed w-token shingles per document — column-level
    * reference form (interpreted higher-order functions; kept as the
    * semantic baseline the native kernel is unit-tested against).
    * Hashing shingles to 64-bit immediately keeps all downstream state
    * fixed-width — the document text never travels through a shuffle
    * again.
    */
  def shingleHashes(text: Column, w: Int): Column = {
    val toks = split(lower(text), "\\s+")
    val n = size(toks)
    array_distinct(
      transform(sequence(lit(0), greatest(n - w, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w))))))
  }

  /** Native (codegen'd) shingle-hash array — the hot-path form; one
    * kernel call per row, same semantics as [[shingleHashes]].
    * Self-registering: resolves on any session.
    */
  def nativeShingles(text: Column, w: Int): Column = {
    GraftFunctions.registerActive()
    call_function("graft_shingles", text, lit(w))
  }

  def withShingles(docs: DataFrame, w: Int = 3): DataFrame =
    docs.select(col("doc_id"), shingleHashes(col("text"), w).as("shingles"))

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard near-dup pairs, scale-safe via **prefix
    * filtering** (set-similarity-join literature: Chaudhuri et al.
    * ICDE'06, Bayardo et al. WWW'07 All-Pairs). For threshold t, two
    * docs with J(A,B) ≥ t share ≥ ⌈t·|A|⌉ shingles, so under any global
    * shingle order each doc's first |S| − ⌈t·|S|⌉ + 1 shingles (its
    * *prefix*) must contain a common element — the candidate join only
    * touches prefixes. Ordering shingles by ascending document
    * frequency puts the rarest shingles in the prefixes, so hot
    * shingles (the quadratic blow-up in a naive self-join: f docs
    * sharing a shingle ⇒ O(f²) join rows) are excluded unless a doc
    * has nothing rarer. A length filter (J ≤ min/max of sizes) prunes
    * further; exact verification on the per-doc shingle arrays keeps
    * the output identical to the naive all-pairs form (DuckDB oracle).
    */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, threshold: Double = 0.5): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // One kernel call builds the distinct-shingle array, materialized
    // ONCE: the array table feeds the df-count branch, the rank/prefix
    // branch, and both verification joins — unmaterialized, Catalyst
    // re-runs the scan+kernel per consumer (the round-9 APSS lesson;
    // this plan held 6 corpus scans). The checkpoint stores
    // (doc_id, 8-byte hashes) ≈ one long per token — far cheaper than
    // re-reading and re-shingling the corpus per consumer. The total
    // shingle count (the crossover's broadcast-budget input) rides the
    // materialization job as an observe metric — zero extra jobs.
    val (arrs, tot) = withShinglesMetered(docs, w)
    ngramJaccardPairsFrom(arrs, threshold, tot)
  }

  /** Materialized `(doc_id, shingles)` + the total shingle count
    * observed ON the checkpoint job (no separate agg job).
    */
  private def withShinglesMetered(docs: DataFrame, w: Int): (DataFrame, Long) =
    meteredCheckpoint(withShinglesNative(docs, w))

  /** Materialize any table carrying a `shingles` array column, with
    * the total shingle count riding the checkpoint job as an observe
    * metric — the verify-order crossover's broadcast-budget input,
    * for free.
    */
  private def meteredCheckpoint(df: DataFrame): (DataFrame, Long) = {
    val (ck, m) = graft.plans.Materialize.withMetrics(df,
      sum(size(col("shingles")).cast("long")).as("__tot"))
    (ck, Option(m("__tot")).fold(0L)(_.asInstanceOf[Long]))
  }

  /** (doc_id, shingles) via the codegen'd kernel — the table every
    * shingle-dedup variant materializes once and shares.
    */
  private def withShinglesNative(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), nativeShingles(col("text"), w).as("shingles"))

  /** Exact-Jaccard near-dup pairs ACROSS two corpora — the incremental
    * ingest face of [[ngramJaccardPairs]]: which NEW documents
    * (`delta`) are near-dups of the accumulated corpus (`history`),
    * without ever comparing history against itself (the quadratic
    * part a daily batch must not re-pay). doc_ids must be globally
    * unique across both inputs. Returns `(delta_id, history_id,
    * inter, jaccard)` for verified J ≥ `threshold`.
    *
    * Same prefix-filter exactness as the self-join face: document
    * frequency — and therefore the rarity order the prefix theorem
    * needs to be CONSISTENT across every document — is computed over
    * the UNION of both sides; the candidate join then pairs only
    * delta prefixes against history prefixes (the side filter replaces
    * `a_id < b_id`; the prefix-intersection theorem is per-pair and
    * does not care which restriction follows it). Candidates and
    * verification are shared with the self-join machinery.
    */
  def crossJaccardPairs(delta: DataFrame, history: DataFrame,
      w: Int = 3, threshold: Double = 0.5): DataFrame = {
    GraftFunctions.register(delta.sparkSession)
    val (arrs, tot) = meteredCheckpoint(
      withShinglesNative(delta, w).withColumn("__delta", lit(true))
        .unionByName(
          withShinglesNative(history, w).withColumn("__delta", lit(false))))
    crossPairsFrom(arrs, threshold, withinDelta = false, tot)._1
      .select(col("a_id").as("delta_id"), col("b_id").as("history_id"),
        col("inter"), col("jaccard"))
  }

  /** The `(doc_id, shingles)` table the incremental screens persist as
    * history state: one codegen'd kernel pass, 8-byte hashes ≈ one
    * long per token — the streaming twin appends each micro-batch's
    * table instead of ever re-shingling history.
    */
  def shingleTable(docs: DataFrame, w: Int = 3): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    withShinglesNative(docs, w)
  }

  /** The per-micro-batch INGEST SCREEN behind
    * [[graft.streaming.Streams.neardupScreenStream]]: exact-Jaccard
    * near-dup pairs of the arriving delta against accumulated history
    * AND against earlier-arriving (lower doc_id) delta rows — so the
    * union over ANY chronological batching of a corpus is exactly the
    * batching-invariant set {(later, earlier) : J ≥ t}, which is
    * [[ngramJaccardPairs]]'s pair set re-keyed by arrival direction
    * (spec-pinned). Inputs are PRE-SHINGLED `(doc_id, shingles)`
    * tables ([[shingleTable]]); doc_ids must be globally unique and
    * arrival-ordered. Returns `(delta_id, prior_id, inter, jaccard)`
    * EAGERLY materialized with every internal checkpoint already
    * freed — a long-lived stream leaks nothing per batch beyond the
    * result it hands the caller (free via
    * [[graft.plans.Materialize.rddIds]] when done).
    */
  def ingestScreenPairs(deltaArrs: DataFrame, historyArrs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val sc = deltaArrs.sparkSession.sparkContext
    val (arrs, tot) = meteredCheckpoint(
      deltaArrs.select(col("doc_id"), col("shingles"))
        .withColumn("__delta", lit(true))
        .unionByName(historyArrs.select(col("doc_id"), col("shingles"))
          .withColumn("__delta", lit(false))))
    val (pairs, freePrefix) = crossPairsFrom(arrs, threshold,
      withinDelta = true, tot)
    val out = pairs
      .select(col("a_id").as("delta_id"), col("b_id").as("prior_id"),
        col("inter"), col("jaccard"))
      .materialize()
    freePrefix()
    graft.plans.Materialize.rddIds(arrs).foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    out
  }

  /** Shared cross-corpus candidate+verify core over a combined
    * `(doc_id, shingles, __delta)` table: document frequency — the
    * rarity order the prefix theorem needs CONSISTENT across every
    * document — is computed over the whole table; candidates pair
    * delta prefixes against history prefixes, plus (when
    * `withinDelta`) earlier delta rows by doc_id — the ingest-screen
    * face, where a batch containing two copies must flag the later
    * one. Returns the verified pairs and a closure freeing the prefix
    * checkpoint (batch callers leave it for the between-query sweep —
    * their result is lazy; the streaming caller materializes its
    * result and frees eagerly).
    */
  private def crossPairsFrom(arrs: DataFrame, threshold: Double,
      withinDelta: Boolean, totalShingles: Long): (DataFrame, () => Unit) = {
    val sc = arrs.sparkSession.sparkContext
    val ex = arrs
      .select(col("doc_id"), col("__delta"),
        size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
    val dfTable = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val ranked = ex.join(dfTable, Seq("sh"))
      .withColumn("rk", row_number().over(byRarity))
    val np = arrs.sparkSession.sparkContext.defaultParallelism
    val (prefix, mRows, pRows) = meteredPrefix(ranked
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("__delta"), col("sh"), col("n_sh")),
      np, guarded = totalShingles <= ShinglesBroadcastBudget)
    val pb = if (withinDelta) prefix else prefix.filter(!col("__delta"))
    val matched = prefix.filter(col("__delta"))
      .select(col("doc_id").as("a_id"), col("sh"), col("n_sh").as("a_n"))
      .join(pb.select(col("doc_id").as("b_id"),
          col("__delta").as("__bd"), col("sh"), col("n_sh").as("b_n")),
        Seq("sh"))
      .filter(!col("__bd") || col("b_id") < col("a_id"))
      .filter(least(col("a_n"), col("b_n")).cast("double")
        >= lit(threshold) * greatest(col("a_n"), col("b_n")).cast("double")
          - lit(1e-9))
      .select("a_id", "b_id")
    // verify-order crossover — the [[ngramJaccardPairsFrom]] rationale
    // (incl. the duplicate-match-factor guard)
    val sh = arrs.select("doc_id", "shingles")
    val verified =
      if (verifyFirstProfitable(totalShingles, mRows, pRows))
        verifyPairs(sh, matched, threshold, broadcast)
          .dropDuplicates("a_id", "b_id")
      else verifyPairs(sh, matched.distinct(), threshold)
    (verified,
      () => graft.plans.Materialize.rddIds(prefix).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
  }

  /** Prefix-filtered exact-Jaccard pairs from a PRE-MATERIALIZED
    * (doc_id, shingles) table (callers checkpoint it — possibly with
    * extra columns they share, e.g. the MinHash signature).
    */
  private def ngramJaccardPairsFrom(arrs: DataFrame,
      threshold: Double, totalShingles: Long): DataFrame = {
    val ex = arrs
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
    // Global rarity order: document frequency asc, shingle hash asc —
    // consistent across docs (required for prefix-filter exactness).
    // DF is a grouped count + join-back, NOT a window: the window form
    // (`count().over(partitionBy("sh"))`) funneled every occurrence of
    // a hot stopword shingle into a single task. The grouped count is
    // two-phase by construction (map-side partial aggregation emits ≤1
    // row per distinct shingle per task — the salted phase of
    // [[Skew.saltedCountSum]] without its extra shuffle), and the join
    // back on `sh` is AQE-skew-splittable (one build row per hot key).
    val dfTable = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val withDf = ex.join(dfTable, Seq("sh"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val ranked = withDf.withColumn("rk", row_number().over(byRarity))
    // Prefix length |S| − ⌈t·|S|⌉ + 1; the tiny epsilon keeps ceil from
    // rounding an exactly-integer t·|S| up on FP noise (which would
    // shorten the prefix and break exactness).
    // repartition before the checkpoint: the prefix table is small
    // post-window, AQE would coalesce its materialization to one
    // partition and the candidate self-join fan-out inherits the
    // stream side's partitioning (the APSS serialization lesson)
    val np = arrs.sparkSession.sparkContext.defaultParallelism
    val (prefix, mRows, pRows) = meteredPrefix(ranked
      .filter(col("rk") <= col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("sh"), col("n_sh")),
      np, guarded = totalShingles <= ShinglesBroadcastBudget)
    val matched = prefix.select(col("doc_id").as("a_id"), col("sh"), col("n_sh").as("a_n"))
      .join(prefix.select(col("doc_id").as("b_id"), col("sh"), col("n_sh").as("b_n")),
        Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      // length filter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)
      .filter(least(col("a_n"), col("b_n")).cast("double")
        >= lit(threshold) * greatest(col("a_n"), col("b_n")).cast("double") - lit(1e-9))
      .select("a_id", "b_id")
    // Verify-order crossover (the round-14 APSS discipline, measured
    // on this path: ~2× — see OPTIMIZATION_r14.md): with a
    // broadcastable shingle table AND a low duplicate-match factor,
    // verify every candidate MATCH row map-side (zero shuffle, no
    // candidate-sized exchange, no partial-aggregate hash tables —
    // the thing host contention multiplies) and dedup the verified
    // output, which is output-sized. Measured ≈1.06× duplication on
    // the document fixture. BOTH guards matter: a degenerate shingle
    // domain (seq_trajectory_sim's 5-symbol alphabet — ≤125 distinct
    // trigram motifs over every trajectory) makes the match stream
    // ~80× the pair count, and paying array_intersect per MATCH row
    // there measured 2.7× SLOWER than dedup-first. Otherwise (corpus
    // scale, or high duplication) dedup candidates FIRST so each pair
    // rides the attach joins once.
    if (verifyFirstProfitable(totalShingles, mRows, pRows))
      verifyPairs(arrs, matched, threshold, broadcast)
        .dropDuplicates("a_id", "b_id")
        .select("a_id", "b_id", "inter", "jaccard")
    else
      verifyPairs(arrs, matched.distinct(), threshold)
        .select("a_id", "b_id", "inter", "jaccard")
  }

  /** Broadcast-verify-first is profitable iff (a) the shingle table
    * fits the broadcast budget — `totalShingles` (observed free on
    * the arrs checkpoint job) ≤ 8M shingles ≈ 64 MB of longs, the
    * [[bagCosinePairs]] broadcastMaxTfRows sizing — and (b) the
    * candidate join's duplicate-match factor is small: estimated
    * `matchRows` ≤ 8× the `prefixRows` count — i.e. per-match
    * verification costs at most a small multiple of one prefix pass.
    * The document fixture sits at 7.43×; the 5-symbol trajectory
    * fixture at ~562×. Deciding from real counts (not Catalyst
    * estimates) keeps the corpus-scale arm deterministic.
    *
    * Both counts ride the prefix table's OWN checkpoint job as
    * observe metrics ([[meteredPrefix]] / the containment inline
    * form) — round 15; the stat used to be a separate two-stage agg
    * job over the checkpoint, one extra driver action per shingle
    * query and per streaming micro-batch (the ADVICE r14 note on
    * ingestScreenPairs).
    */
  /** 8M shingles ≈ 64 MB of longs — the [[bagCosinePairs]]
    * broadcastMaxTfRows sizing applied to the shingle family. The
    * forced broadcast() hints this gate bypass
    * autoBroadcastJoinThreshold, and the BUILT relation carries
    * per-row/array overhead and doc_id on top of the raw longs
    * (≈ 2–3× at the boundary, so ~150–200 MB worst case per side) —
    * the budget assumes a driver/executor with at least a few GB of
    * headroom, far inside Spark's 8 GB broadcast cap (the ADVICE r14
    * sizing note).
    */
  private val ShinglesBroadcastBudget = 8000000L

  private def verifyFirstProfitable(totalShingles: Long, matchRows: Long,
      prefixRows: Long,
      maxShingles: Long = ShinglesBroadcastBudget): Boolean =
    totalShingles <= maxShingles &&
      matchRows <= 8L * math.max(prefixRows, 1L)

  /** Checkpoint a filtered prefix stream carrying an `sh` column with
    * the verify-order guard's inputs riding the materialization job
    * as observe metrics: when `guarded` (the broadcast budget passed,
    * so the stream is small by construction), a window attaches each
    * row's prefix-internal posting count c(sh), and `sum(c)` over the
    * rows equals Σ_sh c(sh)² — the EXACT prefix×prefix match-row
    * count, the same statistic the guard used to compute with its own
    * driver action. The window's hash exchange exists only on this
    * gated small-data arm; the corpus-scale arm checkpoints the plain
    * projection, plan-identical to round 14. Returns (prefix table —
    * column set unchanged, matchRows, prefixRows).
    */
  private def meteredPrefix(filtered: DataFrame, np: Int,
      guarded: Boolean): (DataFrame, Long, Long) =
    if (!guarded) (filtered.repartition(np).materialize(), Long.MaxValue, 1L)
    else {
      val (ck, m) = graft.plans.Materialize.withMetrics(
        filtered
          .withColumn("__c", count(lit(1)).over(Window.partitionBy("sh")))
          .repartition(np),
        sum(col("__c")).as("m"), count(lit(1)).as("p"))
      (ck.drop("__c"),
        Option(m("m")).fold(0L)(_.asInstanceOf[Long]),
        Option(m("p")).fold(0L)(_.asInstanceOf[Long]))
    }

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs against
    * the MATERIALIZED per-doc shingle table (the same one candidate
    * generation used — the arrays are never rebuilt from text): the
    * candidate set (small by construction) joins it on doc_id and
    * `array_intersect` computes |∩| inside codegen. Only candidate
    * pairs ever pay verification cost. `side` wraps the two shingle
    * attaches — callers on the broadcast arm of the verify-order
    * crossover ([[verifyFirstProfitable]]) pass `broadcast` so the
    * whole verification is one map-only stage with zero shuffle.
    */
  private def verifyPairs(
      arrs: DataFrame, cands: DataFrame, threshold: Double,
      side: DataFrame => DataFrame = identity): DataFrame = {
    cands
      .join(side(arrs.select(col("doc_id").as("a_id"), col("shingles").as("a_sh"))), Seq("a_id"))
      .join(side(arrs.select(col("doc_id").as("b_id"), col("shingles").as("b_sh"))), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("long").as("inter"),
        size(col("a_sh")).cast("long").as("a_n"),
        size(col("b_sh")).cast("long").as("b_n"))
      // Threshold on the UNROUNDED jaccard: the prefix/length filters
      // guarantee candidates only for true J ≥ t, so a rounded filter
      // could admit borderline pairs (true J in [t−5e-5, t)) that the
      // candidate stage rightly pruned — the unrounded filter makes
      // filter and candidate bound agree exactly. Rounding is display
      // only (and the DuckDB oracle thresholds unrounded too).
      .withColumn("__j", col("inter").cast("double")
        / (col("a_n") + col("b_n") - col("inter")).cast("double"))
      .filter(col("__j") >= threshold)
      .withColumn("jaccard", round(col("__j"), 4))
      .drop("__j")
  }

  /** All-pairs cosine similarity over TERM-FREQUENCY bags with L2
    * prefix filtering (Bayardo, Ma & Srikant 2007, "Scaling Up All
    * Pairs Similarity Search", WWW §3): the weighted-vector
    * complement of [[ngramJaccardPairs]]'s set-overlap filter — same
    * discipline (global rarity order, index only a provably-
    * sufficient prefix, verify candidates exactly), different bound
    * (L2 mass instead of overlap counts).
    *
    * Candidate rule — PREFIX × PREFIX, proven complete for weighted
    * cosine: terms sort per doc in the GLOBAL (df asc, term) order;
    * a doc INDEXES term position i iff the L2 suffix from i could
    * still carry τ of its mass — `suf(i)·q² ≥ p²·‖d‖²` in exact
    * integers (τ = p/q). Let t* be the rarest (first in the global
    * order) term SHARED by (a, b). Every shared term sits at or
    * after t* in BOTH docs' sorted lists, so by Cauchy–Schwarz
    * `dot² ≤ suf_a(t*)·suf_b(t*)`. If cos ≥ τ then
    * `suf_a(t*)·suf_b(t*) ≥ τ²·‖a‖²·‖b‖²`; since `suf_a ≤ ‖a‖²`
    * this forces `suf_b(t*) ≥ τ²·‖b‖²` — and symmetrically for a.
    * So t* lies in BOTH prefixes and the prefix×prefix join on term
    * misses nothing (the completeness property spec in
    * DedupSimilaritySpec exercises exactly this against the naive
    * all-pairs form). The df-ascending order keeps hot stopword
    * terms out of both prefixes, so the posting-list fan-out the
    * join must pay is on RARE terms only.
    *
    * Every candidate-match row additionally passes the fused t*
    * bound `suf_a(t)·suf_b(t)·q² ≥ p²·‖a‖²·‖b‖²` INSIDE the join:
    * by the same Cauchy–Schwarz argument a qualifying pair's rarest
    * shared term always satisfies it, so completeness is preserved,
    * while duplicate match rows (later shared prefix terms) and most
    * false candidates die in generated code before ever reaching the
    * pair dedup — the surviving row count is a small multiple of the
    * true output, not of the candidate space.
    *
    * Verification attaches each doc's sorted (terms, tfs) array pair
    * (one O(N-docs) row per doc) and computes the exact dot with the
    * codegen'd two-pointer kernel `graft_bag_dot`
    * ([[graft.plans.BagDotExpr]]) — the exact dots never ride a
    * corpus-scale join-back.
    *
    * Verify-order crossover — where the pair dedup runs depends on
    * whether the vector table fits a broadcast (decided from the tf
    * row count, free at plan-build time because tf is eagerly
    * materialized; `broadcastMaxTfRows` ≈ 4M tf rows ≈ 160 MB).
    * On the broadcast arm a FIRST-SHARED-PREFIX-TERM filter
    * additionally collapses the match stream to exactly one row per
    * candidate pair BEFORE verification (see the inline comment at
    * the crossover for the completeness argument and round-15
    * measurements):
    *  - BROADCASTABLE (the common corpus-partition case): verify
    *    every term-match row directly — match rows stream through two
    *    broadcast attaches + the codegen dot + the exact filter in
    *    ONE map-only stage with ZERO shuffle, and the pair dedup
    *    (`dropDuplicates`) runs on the verified output, which is
    *    output-sized, not candidate-sized. The alternative
    *    (`distinct()` first) funnels every match row through a
    *    partial-aggregate hash table and a candidate-sized exchange —
    *    the single largest execution-memory + shuffle-spill footprint
    *    in the whole engine (round-13's graded artifact recorded this
    *    query at 14× its prior on identical code; the map-only order
    *    measured 1.7× FASTER than dedup-first under the same host
    *    contention, because a stage with no hash tables and no
    *    shuffle files has nothing for contention to multiply). The
    *    extra cost is exact dots on duplicate match rows (~2.4× the
    *    distinct pair count on the sf0.1 fixture) — cheap codegen
    *    two-pointer work, a good trade against spill variance.
    *  - NOT broadcastable (corpus-scale vecs): dedup candidate pairs
    *    FIRST — the attach joins shuffle, so each pair must ride them
    *    once, not once per shared prefix term; the dedup exchange
    *    carries 16-byte pair rows only.
    *
    * Everything to the threshold decision is exact integers: tf
    * counts, norms Σtf², dots, and the test `dot²·q² ≥ p²·‖a‖²·‖b‖²`
    * (valid since dot ≥ 0). The threshold products (final AND fused
    * t* bound) are evaluated in DECIMAL(38,0) — the Long-typed
    * inputs (dot, suf, ‖·‖²) are each bounded by (doc tokens)³ so
    * the 38-digit products are exact to multi-million-token
    * documents; beyond that Spark raises a decimal-overflow error
    * instead of silently wrapping the comparison (the ts_changepoint
    * discipline). The emitted cosine is the only FP: one division by
    * one correctly-rounded sqrt.
    *
    * `tf` is `localCheckpoint`ed before the fan-out (df table,
    * ranked/prefix, the per-doc vector table) and `prefix`/`vecs`
    * before their two-consumer joins: Catalyst does not share
    * subtrees across consumers (see [[graft.operators.Graphs]]
    * triangleCount) — round 8's unmaterialized plan held 7 separate
    * scan→tokenize→aggregate pipelines, 6 of them redundant
    * full-corpus passes.
    */
  def bagCosinePairs(docs: DataFrame, tauNum: Int = 4,
      tauDen: Int = 5, broadcastMaxTfRows: Long = 4000000L): DataFrame = {
    require(tauNum > 0 && tauDen > tauNum, "need 0 < tauNum < tauDen")
    GraftFunctions.register(docs.sparkSession)
    val p2 = (tauNum.toLong * tauNum, tauDen.toLong * tauDen)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val tf = docs
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .materialize()
    // grouped-count df + join-back, not a window — the skew rationale
    // at [[ngramJaccardPairs]] applies verbatim
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wAll = Window.partitionBy("doc_id")
    val wSuf = Window.partitionBy("doc_id").orderBy(col("df"), col("term"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ranked = tf.join(dfTable, Seq("term"))
      .withColumn("__t2", col("tf") * col("tf"))
      .withColumn("__nrm", sum(col("__t2")).over(wAll))
      .withColumn("__suf", sum(col("__t2")).over(wSuf))
    // Explicit repartition BEFORE the checkpoint: the prefix table is
    // tiny post-aggregation, so AQE would coalesce its materialization
    // to one partition — and the candidate self-join's 100×+ fan-out
    // (plus the whole verify pipeline) inherits the STREAM side's
    // partitioning, serializing the expensive stage onto one core. A
    // user-specified partition count is exempt from AQE coalescing;
    // the join output then spreads across the full parallelism.
    val np = docs.sparkSession.sparkContext.defaultParallelism
    // Arm decision hoisted: tf is already materialized, so the count
    // is one cheap job over its checkpoint, and the prefix layout
    // depends on the arm (the FST array below exists only where the
    // broadcast arm will read it).
    val bcastArm = tf.count() <= broadcastMaxTfRows
    val prefix = ranked
      .filter(col("__suf") * lit(p2._2) >= lit(p2._1) * col("__nrm"))
      .select(col("doc_id"), col("term"), col("__suf"), col("__nrm"))
      .repartition(np)
      .materialize()
    val vecs = tf.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("tf"))))
        .as("__p"), sum(col("tf") * col("tf")).as("nrm"))
      .select(col("doc_id"),
        transform(col("__p"), e => e.getField("term")).as("terms"),
        transform(col("__p"), e => e.getField("tf")).as("tfs"),
        col("nrm"))
      .materialize()
    val pa = prefix.select(col("doc_id").as("a_id"), col("term"),
      col("__suf").as("__asuf"), col("__nrm").as("__anrm"))
    val pb = prefix.select(col("doc_id").as("b_id"), col("term"),
      col("__suf").as("__bsuf"), col("__nrm").as("__bnrm"))
    // Candidate pruning in DOUBLE with a 1e-9 downward slack on the
    // threshold side: the suffix products reach ~10²⁴ (long² · τ²),
    // but a prefix filter only needs NO FALSE NEGATIVES — double
    // relative error is ≤ ~10⁻¹⁴ over three multiplies, so any pair
    // the exact decimal inequality admits survives the slackened
    // double one, and the survivors are re-decided EXACTLY below.
    // Decimal(38,0) triple-products here ran per term-match row (the
    // widest point of the whole operator, 100×+ the pair count);
    // doubles keep the predicate in cheap codegen arithmetic.
    def dbl(c: Column): Column = c.cast("double")
    val matched = pa.join(pb,
        pa("term") === pb("term") && pa("a_id") < pb("b_id")
          && dbl(col("__asuf")) * dbl(col("__bsuf")) * lit(p2._2.toDouble)
            >= lit(p2._1.toDouble * (1.0 - 1e-9))
              * dbl(col("__anrm")) * dbl(col("__bnrm")))
      .select(Seq(col("a_id"), col("b_id")) ++
        (if (bcastArm) Seq(pa("term").as("__mt")) else Nil): _*)
    val bagDot = GraftFunctions.bagDot(docs.sparkSession,
      col("a_terms"), col("a_tfs"), col("b_terms"), col("b_tfs"))
    def verify(pairs: DataFrame,
        side: DataFrame => DataFrame): DataFrame = pairs
      .join(side(vecs.select(col("doc_id").as("a_id"),
        col("terms").as("a_terms"), col("tfs").as("a_tfs"),
        col("nrm").as("a_nrm"))), Seq("a_id"))
      .join(side(vecs.select(col("doc_id").as("b_id"),
        col("terms").as("b_terms"), col("tfs").as("b_tfs"),
        col("nrm").as("b_nrm"))), Seq("b_id"))
      .withColumn("dot", bagDot)
      .filter(dec(col("dot")) * dec(col("dot")) * lit(p2._2)
        >= lit(p2._1) * dec(col("a_nrm")) * dec(col("b_nrm")))
      .select(col("a_id"), col("b_id"), col("dot"), col("a_nrm"),
        col("b_nrm"), (col("dot").cast("double") /
          sqrt((col("a_nrm") * col("b_nrm")).cast("double"))).as("cosine"))
    // Verify-order crossover (see scaladoc): when the per-doc vector
    // table is broadcastable, verify EVERY match row map-side and
    // dedup the tiny verified output; otherwise dedup candidate pairs
    // first so the (shuffled) attach joins carry each pair once. The
    // tf row count is known for free — tf is already materialized.
    //
    // FIRST-SHARED-PREFIX-TERM (FST) dedup on the broadcast arm
    // (round 15, measured 28.4M → 11.8M match rows = the exact 2.4×
    // duplicate factor, verify arm ~4.7 → ~3.4 s, pair set proven
    // equal — ApssProbe): keep, per (a,b), ONLY the match row whose
    // term is the globally-rarest term shared by the two PREFIXES, so
    // duplicates die BEFORE the bagDot/threshold work instead of in
    // the final dedup. Completeness: for a qualifying pair the rarest
    // shared term t* overall lies in BOTH prefixes (the prefix-filter
    // completeness proof above), so the kept row IS the t* row, which
    // provably passes the fused suffix bound. Each doc's prefix-term
    // array rides in the global rarity order — __suf strictly
    // decreases along that order (every term adds tf² ≥ 1), so it is
    // a sort key for free — and array_intersect preserves the FIRST
    // array's order, making element 1 of the intersect the pair's
    // rarest shared prefix term. Exactly one row per candidate pair
    // survives (the match stream has one row per (a,b, shared prefix
    // term)); the trailing dropDuplicates is kept as a zero-cost
    // (output-sized) safety net. The per-doc prefix-array table is
    // MATERIALIZED (one tiny doc-count-sized checkpoint) and attached
    // to the match stream by two broadcast joins: the probe also
    // measured carrying the arrays through the candidate join itself
    // (zero extra exchange) and that form ran the filter 2× SLOWER —
    // every candidate row materializes two array copies at the join,
    // where the skinny-stream + broadcast-probe form does not; with
    // the checkpoint, the final plan's only shuffle remains the
    // output-sized pair dedup (spec-pinned). Also tried and REJECTED
    // (numbers in ApssProbe): the positional exclusive-suffix bound
    // (1.08× pruning — tf distribution too flat) and a two-tier
    // double/decimal threshold filter (1.8× slower).
    if (bcastArm) {
      val prefArr = prefix.groupBy("doc_id")
        .agg(transform(
          sort_array(collect_list(struct(col("__suf"), col("term"))),
            asc = false), e => e.getField("term")).as("__parr"))
        .materialize()
      val fst = matched
        .join(broadcast(prefArr.select(col("doc_id").as("a_id"),
          col("__parr").as("__pa"))), Seq("a_id"))
        .join(broadcast(prefArr.select(col("doc_id").as("b_id"),
          col("__parr").as("__pb"))), Seq("b_id"))
        .filter(element_at(array_intersect(col("__pa"), col("__pb")), 1)
          === col("__mt"))
        .select("a_id", "b_id")
      verify(fst, broadcast).dropDuplicates("a_id", "b_id")
    } else verify(matched.distinct(), identity)
  }

  // ------------------------------------------------- shingle containment

  /** Asymmetric near-dup detection: shingle **containment**
    * C(inner→outer) = |S_inner ∩ S_outer| / |S_inner| ≥ t flags a
    * document substantially contained in another — quoted bodies,
    * boilerplate-wrapped mirrors, syndicated articles inside portal
    * pages — exactly the reuse symmetric Jaccard misses when the outer
    * document is much larger (there J ≈ |A|/|B| → 0 however complete
    * the copy). Output is directional: one `(inner_id, outer_id,
    * inter, containment)` row per contained→containing pair; mutual
    * containment (near-identical docs) emits both directions.
    *
    * Scale shape: the inner side reuses [[ngramJaccardPairs]]'s
    * rarity-ordered prefix filter — C ≥ t forces ≥ ⌈t·|A|⌉ shared
    * shingles, so under the global document-frequency order A's first
    * |A| − ⌈t·|A|⌉ + 1 rarest shingles must hit the outer index.
    * Containment bounds nothing on the OUTER side's size ratio, so no
    * symmetric prefix exists: the outer side indexes all its shingles
    * and only |B| ≥ ⌈t·|A|⌉ prunes (a bigger candidate join than the
    * Jaccard path by construction, still shingle-keyed — never
    * all-pairs, and AQE-splittable on hot shingles). Exact
    * `array_intersect` verification keeps output identical to the
    * naive form (DuckDB oracle `dedup_containment`).
    */
  def containmentPairs(docs: DataFrame, w: Int = 3, threshold: Double = 0.8): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // shingle kernel once ([[ngramJaccardPairs]] discipline): the
    // array table feeds df-count, prefix, the outer index, and both
    // verification joins; total shingles observed on the checkpoint
    val (arrs, totSh) = withShinglesMetered(docs, w)
    val ex = arrs
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
    // Same grouped-count document frequency as the Jaccard path (two-
    // phase by construction; join-back AQE-skew-splittable).
    val dfTable = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val filtered = ex.join(dfTable, Seq("sh"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
      .select(col("doc_id").as("inner_id"), col("sh"),
        col("n_sh").as("inner_n"), col("df"))
    // This path's match stream is prefix × FULL index, so the exact
    // duplicate-match count is Σ c_pref(sh)·c_index(sh) = Σ df over
    // prefix ROWS (c_index = the document frequency, already a column
    // here) — row-decomposable, so it rides the prefix checkpoint as
    // an observe metric: no separate guard job, and the stat is the
    // RIGHT one (the round-14 Σ c_pref² form underestimated this
    // stream — the ADVICE r14 note; measured 6.59× vs 5.43× on the
    // document fixture, same arm). Corpus-scale arm checkpoints the
    // plain projection.
    val guarded = totSh <= ShinglesBroadcastBudget
    val (prefix, mRows, pRows) =
      if (!guarded)
        (filtered.drop("df").repartition(np).materialize(),
          Long.MaxValue, 1L)
      else {
        val (ck, m) = graft.plans.Materialize.withMetrics(
          filtered.repartition(np),
          sum(col("df")).as("m"), count(lit(1)).as("p"))
        (ck.drop("df"),
          Option(m("m")).fold(0L)(_.asInstanceOf[Long]),
          Option(m("p")).fold(0L)(_.asInstanceOf[Long]))
      }
    val index = ex.select(col("doc_id").as("outer_id"), col("sh"), col("n_sh").as("outer_n"))
    val matched = prefix.join(index, Seq("sh"))
      .filter(col("inner_id") =!= col("outer_id"))
      // |S_inner ∩ S_outer| ≤ |S_outer|, so C ≥ t needs |B| ≥ t·|A|.
      .filter(col("outer_n").cast("double")
        >= lit(threshold) * col("inner_n").cast("double") - lit(1e-9))
      .select("inner_id", "outer_id")
    // verify-order crossover — the [[ngramJaccardPairsFrom]] rationale
    // with this path's EXACT match-row count (observed above):
    // broadcast arm verifies match rows map-side and dedups the
    // verified output; corpus arm dedups candidates before the
    // shuffled attaches
    val bcast = verifyFirstProfitable(totSh, mRows, pRows)
    val cands = if (bcast) matched else matched.distinct()
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val verified = cands
      .join(side(arrs.select(col("doc_id").as("inner_id"), col("shingles").as("in_sh"))),
        Seq("inner_id"))
      .join(side(arrs.select(col("doc_id").as("outer_id"), col("shingles").as("out_sh"))),
        Seq("outer_id"))
      .select(col("inner_id"), col("outer_id"),
        size(array_intersect(col("in_sh"), col("out_sh"))).cast("long").as("inter"),
        size(col("in_sh")).cast("long").as("inner_n"))
      // Unrounded threshold for the same candidate/filter-agreement
      // reason documented at [[verifyPairs]]; rounding is display only.
      .withColumn("__c", col("inter").cast("double") / col("inner_n").cast("double"))
      .filter(col("__c") >= threshold)
      .withColumn("containment", round(col("__c"), 4))
    (if (bcast) verified.dropDuplicates("inner_id", "outer_id") else verified)
      .select("inner_id", "outer_id", "inter", "containment")
  }

  // ------------------------------------------------------------- MinHash

  /** Universal-hash coefficients for the k MinHash permutations,
    * deterministic (no RNG at plan time).
    */
  /** Mersenne prime 2^31−1: universal-hash modulus. Inputs are first
    * folded to [0, P) so `a·h + b` stays < 2^62 — no 64-bit wraparound,
    * safe under Spark's default ANSI arithmetic.
    */
  private val P = 2147483647L

  private def coeffs(k: Int, salt: Long): Array[Long] =
    Array.tabulate(k)(i => {
      // splitmix64 of (salt, i): well-mixed, reproducible
      var z = salt + 0x9e3779b97f4a7c15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z & 0x7fffffffL) | 1L // odd, < 2^31
    })

  /** MinHash signature (k permutations) from the shingle-hash array.
    * Pure narrow transform: signature_i = min over shingles of
    * (a_i·h + b_i) mod P, computed with array built-ins inside codegen —
    * the full signature costs one pass over the shingle array per doc.
    */
  def minHashSignature(shingles: Column, k: Int): Column = {
    val as = coeffs(k, 0x5eedL)
    val bs = coeffs(k, 0xca5cadeL)
    val aArr = array(as.toIndexedSeq.map(lit): _*)
    val bArr = array(bs.toIndexedSeq.map(lit): _*)
    val folded = transform(shingles, h => pmod(h, lit(P)))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(folded,
        h => pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(P)))))
  }

  /** One row per (doc, distinct shingle hash) — the relational form the
    * prefix-filter candidate join runs on. One narrow codegen'd kernel
    * call builds the distinct shingle array per row; explode is the
    * only plan node after the scan. Semantics identical to
    * [[shingleHashes]] (incl. the short-doc whole-text shingle) —
    * unit-tested equivalence.
    */
  def explodedShingles(docs: DataFrame, w: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), explode(nativeShingles(col("text"), w)).as("sh"))
  }

  /** (doc_id, shingles, sig) sketch table: both the distinct-shingle
    * array and the k-permutation MinHash signature are single kernel
    * calls per row — the whole sketch is one narrow pass over the
    * corpus, no shuffle at all until candidates join.
    */
  private def sketchTable(docs: DataFrame, w: Int, k: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), nativeShingles(col("text"), w).as("shingles"))
      .select(col("doc_id"), col("shingles"),
        call_function("graft_minhash", col("shingles"), lit(k)).as("sig"))
  }

  /** (band, band_hash, doc_id) bucket keys from the signature array:
    * `bands` Murmur3 hashes over k/bands signature slots each —
    * identical bucket values to a column-per-slot formulation, computed
    * narrowly from the array.
    */
  private def bandedBuckets(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * r until (b + 1) * r).map(i =>
          element_at(col("sig"), i + 1)): _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
  }

  /** LSH banding: split the signature into `bands` bands of `k/bands`
    * rows, hash each band, emit (band_idx, band_hash) bucket keys.
    * Docs sharing any bucket become candidate pairs. The shuffle moves
    * only (doc_id, band, bh) triples — never text, shingles, or
    * signatures.
    */
  def minHashCandidates(
      docs: DataFrame, w: Int = 3, k: Int = 128, bands: Int = 32): DataFrame = {
    val banded = bandedBuckets(
      sketchTable(docs, w, k).select(col("doc_id"), col("sig")), k, bands)
    val x = banded.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val y = banded.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    x.join(y, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates verified with
    * exact Jaccard on the per-doc shingle arrays. Plan shape: one
    * narrow sketch pass, a bucket self-join over 24-byte rows, and a
    * verification join that only candidate pairs pay for — the 100 TB
    * shape.
    */
  def minHashDuplicates(
      docs: DataFrame, w: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // sketch once: (shingles, sig) feeds both the banding self-join
    // and exact verification ([[ngramJaccardPairs]] discipline)
    val sk = sketchTable(docs, w, k).materialize()
    val banded = bandedBuckets(sk.select(col("doc_id"), col("sig")), k, bands)
    val cands = banded
      .join(banded.select(col("band"), col("bh"), col("doc_id").as("b_id")),
        Seq("band", "bh"))
      .filter(col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id")).distinct()
    verifyPairs(sk.select(col("doc_id"), col("shingles")), cands, threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash estimate-quality CONTRACT (Broder 1997: for a random
    * permutation, P[min(π(A)) = min(π(B))] = J(A,B), so the fraction
    * of agreeing signature slots is an unbiased Jaccard estimator with
    * Hoeffding tail P[|est − J| ≥ t] ≤ 2·exp(−2kt²) — at k = 128 and
    * t = 0.25 that is 2e⁻¹⁶ ≈ 2.3·10⁻⁷ per pair). For every exact
    * near-dup pair ([[ngramJaccardPairs]], the recomputable face) the
    * row carries the EXACT intersection/Jaccard plus the boolean claim
    * that the k-slot signature estimate landed inside the envelope —
    * the same sketch-error-bound pattern as the HLL/CMS/quantile
    * contracts: the oracle recomputes the exact side and pins the
    * boolean at `true`, so a drifting signature kernel or a biased
    * permutation family fails the gate, not a unit test.
    *
    * Scale shape: signatures are one narrow kernel pass (k longs per
    * doc); only verified pairs pay the two doc_id-keyed signature
    * joins, and the slot-agreement fold is a codegen'd zip_with —
    * no new shuffle beyond the pair surface itself.
    */
  def minHashEstimateContract(
      docs: DataFrame, w: Int = 3, threshold: Double = 0.5,
      k: Int = 128, bound: Double = 0.25): DataFrame = {
    // ONE sketch pass: the checkpointed (shingles, sig) table serves
    // the exact-Jaccard path (arrays) AND both signature joins —
    // round 8's plan re-ran the scan+kernels 8 times
    val (sk, totSh) = meteredCheckpoint(sketchTable(docs, w, k))
    val sig = sk.select(col("doc_id"), col("sig"))
    ngramJaccardPairsFrom(sk.select(col("doc_id"), col("shingles")), threshold,
      totSh)
      .join(sig.select(col("doc_id").as("a_id"), col("sig").as("__sa")), Seq("a_id"))
      .join(sig.select(col("doc_id").as("b_id"), col("sig").as("__sb")), Seq("b_id"))
      .withColumn("__est",
        aggregate(
          zip_with(col("__sa"), col("__sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).cast("double") / k)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"),
        (abs(col("__est") - col("jaccard")) <= bound).as("est_in_envelope"))
  }

  // ------------------------------------------------------------- SimHash

  /** Engine-portable 64-bit token hash — column-level reference form of
    * the `graft_tokenhashes` kernel: first 8 bytes of md5 as a signed
    * big-endian long. `conv` yields the unsigned decimal; the fold to
    * signed long subtracts 2^64 above Long.MaxValue (exact DECIMAL
    * arithmetic, no ANSI overflow).
    */
  private[graft] def portableTokenHash(t: Column): Column = {
    val u = conv(substring(md5(t), 1, 16), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(20, 0))
    when(u > lit(new java.math.BigDecimal("9223372036854775807")),
      (u - lit(new java.math.BigDecimal("18446744073709551616"))).cast("long"))
      .otherwise(u.cast("long"))
  }

  /** 64-bit SimHash over token hashes: per bit, vote +1/−1 by token
    * bit, sign of the vote becomes the fingerprint bit. Expressed with
    * nested array built-ins — narrow, codegen'd.
    */
  def simHash(text: Column): Column = {
    val tokHashes = transform(split(lower(text), "\\s+"), portableTokenHash(_))
    // Unrolled at plan-construction time: one popcount-style vote per
    // bit, each a single pass over the token-hash array.
    (0 until 64).foldLeft(lit(0L)) { (acc, bit) =>
      val vote = aggregate(tokHashes, lit(0L),
        (v, h) => v + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      acc.bitwiseOR(when(vote > 0, lit(1L << bit)).otherwise(lit(0L)))
    }
  }

  /** Per-occurrence token hashes (duplicates kept — SimHash votes per
    * occurrence), native codegen'd kernel; same semantics as
    * `transform(split(lower(text), "\\s+"), portableTokenHash)`
    * (unit-tested equivalence; md5-derived so the DuckDB oracle
    * reproduces it). Self-registering.
    */
  def nativeTokenHashes(text: Column): Column = {
    GraftFunctions.registerActive()
    call_function("graft_tokenhashes", text)
  }

  /** SimHash fingerprints as a table: the whole 64-bit fingerprint is
    * TWO codegen'd kernel calls per document (token hashes → vote-sign
    * pack), a purely narrow map over the corpus — no explode, no
    * shuffle at all until the bucket join. (Round 2 shuffled every
    * token row into a 64-vote-sum aggregation; round 1 used interpreted
    * HOF lambdas. Column-expression variant [[simHash]] kept for
    * composability/tests.)
    */
  def simHashTable(docs: DataFrame): DataFrame = {
    GraftFunctions.registerActive()
    docs.select(col("doc_id"),
      call_function("graft_simhash64", nativeTokenHashes(col("text"))).as("fp"))
  }

  /** SimHash near-dup pairs within a Hamming radius. Pigeonhole
    * banding: split 64 bits into 4 16-bit chunks; hamming ≤ 3 ⇒ at
    * least one chunk identical, so bucket-join on chunks and verify
    * with bit_count(xor) — never all-pairs. Pigeonhole candidate
    * generation is COMPLETE for hamming ≤ 3, so the output equals the
    * all-pairs form — which is exactly what the DuckDB oracle computes
    * (md5-portable token hashes make the fingerprints engine-identical).
    */
  def simHashDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simHashTable(docs)
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL)).as("ch"))): _*))
        .as("c"))
      .select(col("doc_id"), col("fp"), col("c.chunk"), col("c.ch"))
    val l = chunked.select(col("chunk"), col("ch"),
      col("doc_id").as("a_id"), col("fp").as("a_fp"))
    val rj = chunked.select(col("chunk"), col("ch"),
      col("doc_id").as("b_id"), col("fp").as("b_fp"))
    l.join(rj, Seq("chunk", "ch"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** COMPLETE Hamming-≤`maxHamming` pair generation over arbitrary
    * 64-bit fingerprints via pigeonhole banding — the generalization
    * of [[simHashDuplicates]]'s 4×16 scheme to any radius: slice the
    * word into `maxHamming + 1` disjoint bands (widths as even as
    * 64 ÷ (r+1) allows); two fingerprints within Hamming r differ in
    * at most r bands, so at least one band matches bit-for-bit —
    * equi-join on (band, bits) finds EVERY true pair, then the exact
    * `bit_count(xor)` verify discards band-collision false positives.
    * Never all-pairs: the candidate join is hash-partitioned on band
    * values, O(Σ bucket²) not O(N²), and AQE splits any hot bucket.
    *
    * Input: `(idCol: long-comparable, fpCol: 64-bit long)`; output
    * `(a_id, b_id, hamming)` with a_id < b_id, hamming ≤ maxHamming.
    */
  def bandedHammingPairs(
      hashes: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    require(maxHamming >= 1 && nBands <= 64,
      s"maxHamming must be in [1, 63], got $maxHamming")
    val base = 64 / nBands
    val extra = 64 % nBands
    val widths = Seq.tabulate(nBands)(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val banded = hashes.select(col(idCol).as("__id"), col(fpCol).as("__fp"),
      explode(array(widths.zip(offsets).zipWithIndex.map {
        case ((w, off), i) =>
          struct(lit(i).as("band"),
            shiftrightunsigned(col(fpCol), off)
              .bitwiseAND(lit((1L << w) - 1)).as("bits"))
      }: _*)).as("c"))
      .select(col("__id"), col("__fp"), col("c.band"), col("c.bits"))
    val l = banded.select(col("band"), col("bits"),
      col("__id").as("a_id"), col("__fp").as("a_fp"))
    val r = banded.select(col("band"), col("bits"),
      col("__id").as("b_id"), col("__fp").as("b_fp"))
    l.join(r, Seq("band", "bits"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- decontamination

  /** Eval-set decontamination (the GPT-3/PaLM rule): a test document
    * is contaminated when it shares any w-gram with the training
    * corpus. Returns each contaminated test doc with its count of
    * distinct shared grams (callers drop or flag them).
    *
    * Scale shape: train collapses to DISTINCT gram hashes (map-side
    * combined — the corpus text never shuffles, only 8-byte hashes),
    * then a gram-keyed inner join + per-doc count. Both per-doc gram
    * sets come from the single-pass shingle kernel.
    */
  def contaminationOverlap(
      train: DataFrame, test: DataFrame, w: Int = 8): DataFrame = {
    val trainGrams = explodedShingles(train, w).select("sh").distinct()
    explodedShingles(test, w)
      .join(trainGrams, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** EXACT-SUBSTRING decontamination (the BigCode/HumanEval-style
    * screen): flag every training document containing ANY eval needle
    * verbatim at any character position — catches sub-token and
    * cross-token-boundary leaks the token-w-gram arm
    * ([[contaminationOverlap]]) cannot see. Returns one row per train
    * doc: `(doc_id, n_matches, contaminated)` where `n_matches`
    * counts how many distinct needles occur.
    *
    * Scale shape: the needle set rides as LITERALS in one codegen'd
    * higher-order `filter(contains)` — map-only, zero shuffle, the
    * corpus text never moves. Per-doc compute is |needles| substring
    * searches, so this is the right plan for the real-world case
    * (benchmark prompt sets — 10²–10⁴ short strings); a needle set
    * too large to broadcast is what the gram-join arm is for.
    * Needles must be non-empty (an empty needle matches everything).
    */
  def substringContamination(train: DataFrame,
      needles: Seq[String]): DataFrame = {
    require(needles.nonEmpty, "needle set must not be empty")
    require(needles.forall(_.nonEmpty), "needles must be non-empty strings")
    val arr = array(needles.distinct.sorted.map(lit): _*)
    train.select(col("doc_id"),
        size(filter(arr, n => col("text").contains(n))).cast("long")
          .as("n_matches"))
      .withColumn("contaminated", col("n_matches") > 0L)
  }

  // ------------------------------------- repeated-substring spans

  /** Ordered per-position gram hashes, native kernel (md5-portable —
    * the DuckDB oracle rebuilds identical values). Self-registering.
    */
  def nativeGramHashes(text: Column, w: Int): Column = {
    GraftFunctions.registerActive()
    call_function("graft_gramhashes", text, lit(w))
  }

  /** Ordered per-character-position k-gram hashes, native kernel
    * (md5-portable, code-point positions). Self-registering.
    */
  def nativeCharGramHashes(text: Column, k: Int): Column = {
    GraftFunctions.registerActive()
    call_function("graft_chargrams", text, lit(k))
  }

  /** EXACT repeated-substring spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better": training corpora are
    * full of verbatim-repeated boilerplate — headers, licenses,
    * templates — that survives document-level dedup because the HOST
    * documents differ; the fix is substring-level).
    *
    * A token position is HOT when its w-gram occurs ≥ `minCount` times
    * across the whole corpus (all occurrences count, including within
    * one document). Overlapping/adjacent hot positions merge into
    * maximal spans per document (gaps-and-islands over the position
    * sequence). Returns `(doc_id, span_start, span_end, n_hot_grams)`
    * with token-index bounds, `span_end` exclusive. NB `span_end` is
    * `last hot gram start + w` and may EXCEED the document's token
    * count for documents shorter than w tokens (the kernel emits one
    * whole-text gram for sub-w docs, so a hot sub-w doc reports
    * `span_end = w > n_tokens`): consumers must treat `span_end` as an
    * exclusive upper BOUND on covered positions, not a length claim —
    * [[removeRepeatedSpans]] and the DuckDB oracle both do.
    *
    * Scale shape: the corpus text is read once, narrowly, by the gram
    * kernel; only (8-byte hash, position) pairs shuffle. The gram
    * count is a map-side-combined groupBy (≤1 row per distinct gram
    * per task — hot grams are exactly the high-DF keys, and the count
    * join-back is a 1-row-per-key build side, AQE-splittable like the
    * ngram DF table). Span merging shuffles by doc_id — doc-local
    * windows, no skew beyond document length.
    */
  def repeatedSpans(docs: DataFrame, w: Int = 8, minCount: Long = 2): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    hotPositionSpans(
      docs.select(col("doc_id"),
        posexplode(nativeGramHashes(col("text"), w)).as(Seq("pos", "gh"))),
      w, minCount)
  }

  /** CHARACTER-level [[repeatedSpans]] (Lee et al. 2021's actual
    * granularity — their suffix-array pass finds verbatim repeats at
    * BYTE offsets): a character position is hot when its k-char gram
    * (raw text, no lowercasing/tokenization — exact-substring
    * identity) occurs ≥ `minCount` times corpus-wide; overlapping hot
    * positions merge into maximal spans. Catches sub-token repeats
    * and repeats crossing token boundaries that the token-w-gram face
    * cannot see (a license header re-wrapped with different
    * whitespace, a URL embedded mid-token). Returns `(doc_id,
    * span_start, span_end, n_hot_grams)` in CODE-POINT indices,
    * `span_end` exclusive and capped by nothing (sub-k docs report
    * `span_end = k` — the [[repeatedSpans]] bound convention).
    *
    * Scale shape: identical to [[repeatedSpans]] with ~w× more
    * positions (one per char, not per token) — still only (8-byte
    * hash, int position) pairs shuffle, never text; the hot-count
    * groupBy map-combines, the count join-back is 1-row-per-key.
    * The k≈20 default mirrors Lee et al.'s 50-BPE-token ≈ few-dozen-
    * char threshold scaled to the fixture's short docs.
    */
  def charRepeatedSpans(docs: DataFrame, k: Int = 20,
      minCount: Long = 2): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // Storage shape differs from the token face on purpose: the char
    // gram stream is ~20 bytes PER CHARACTER (≈ 20× the corpus — the
    // token face's stream is per-token, ~5× smaller), so materializing
    // it as [[repeatedSpans]] does would store corpus-multiples at
    // scale. Instead the HOT GRAM SET (only hashes occurring ≥
    // minCount — the repeats themselves, usually tiny) is what
    // materializes, and the kernel scan runs twice: once feeding the
    // map-combined count, once feeding the join-back, which AQE turns
    // into a BROADCAST of the hot set when it is small — the gram
    // stream then never rides a second shuffle and nothing
    // corpus-scale is ever stored.
    def grams = docs.select(col("doc_id"),
      posexplode(nativeCharGramHashes(col("text"), k)).as(Seq("pos", "gh")))
    val hot = grams.groupBy(col("gh")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount).select(col("gh"))
      .materialize()
    mergeIslands(grams.join(hot, Seq("gh")).select(col("doc_id"), col("pos")), k)
  }

  /** Corpus rewrite dropping every [[charRepeatedSpans]] span:
    * characters whose code-point index falls inside any span are cut
    * and the remainder re-joined. Returns `(doc_id, clean_text,
    * n_removed_chars)` for every document (no-span docs pass through
    * with 0).
    *
    * Unlike the token face ([[removeRepeatedSpans]]'s boundary-event
    * sweep over an exploded token stream), no per-character explode is
    * needed here: islands merge all positions ≤ k apart, so two spans
    * of one doc are STRICTLY disjoint (consecutive hot positions
    * p₁ < p₂ across an island break satisfy p₂ − p₁ > k, hence
    * p₁ + k < p₂), and the rewrite is ONE fold over the doc's sorted
    * span array — `text[cursor, s)` kept per span, tail appended at
    * the end — all inside codegen'd `aggregate`/`substr`. Shape: the
    * span table groups by doc_id (spans per doc ≪ chars), one
    * broadcast-able left join back to the corpus, map-only rewrite;
    * the corpus text is read once and never shuffled.
    *
    * `span_end` can exceed the doc length only on the (sub-k-doc)
    * whole-text gram — `substr` clamps the kept segments and
    * `n_removed_chars` clamps with `least(e, len)`.
    */
  def removeCharSpans(docs: DataFrame, k: Int = 20,
      minCount: Long = 2): DataFrame = {
    val spans = charRepeatedSpans(docs, k, minCount)
    val perDoc = spans.groupBy("doc_id").agg(
      array_sort(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("sp"))
    val text = col("text")
    val rewrite = aggregate(
      col("sp"),
      struct(lit(0L).as("cur"), lit("").as("acc")),
      (st, x) => struct(
        x.getField("e").as("cur"),
        concat(st.getField("acc"),
          text.substr((st.getField("cur") + 1).cast("int"),
            (x.getField("s") - st.getField("cur")).cast("int"))).as("acc")),
      st => concat(st.getField("acc"),
        text.substr((st.getField("cur") + 1).cast("int"),
          greatest(length(text) - st.getField("cur").cast("int"), lit(0)))))
    val removed = aggregate(col("sp"), lit(0L), (acc, x) =>
      acc + (least(x.getField("e"), length(text).cast("long"))
        - x.getField("s")))
    docs.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("sp").isNull, text).otherwise(rewrite).as("clean_text"),
        when(col("sp").isNull, lit(0L)).otherwise(removed)
          .as("n_removed_chars"))
  }

  /** Shared hot-position → maximal-span core of [[repeatedSpans]] and
    * [[charRepeatedSpans]]: corpus-wide gram counts over a
    * `(doc_id, pos, gh)` stream, hot filter, gaps-and-islands merge
    * (positions ≤ w apart chain — their grams overlap or touch).
    */
  private def hotPositionSpans(gramStream: DataFrame, w: Int,
      minCount: Long): DataFrame = {
    // the gram stream feeds the hot-count aggregate AND the join
    // back — one kernel pass, materialized (24-byte rows). Right for
    // the TOKEN face; the char face uses the hot-set shape instead
    // (see [[charRepeatedSpans]]).
    val grams = gramStream.materialize()
    val counts = grams.groupBy(col("gh")).agg(count(lit(1)).as("n"))
    val hot = grams
      .join(counts.filter(col("n") >= minCount), Seq("gh"))
      .select(col("doc_id"), col("pos"))
    mergeIslands(hot, w)
  }

  /** Gaps-and-islands merge of hot positions into maximal spans
    * (positions ≤ w apart chain — their grams overlap or touch);
    * doc-local windows, no skew beyond document length.
    */
  private def mergeIslands(hot: DataFrame, w: Int): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val islands = hot
      .withColumn("__gap",
        when(col("pos") - lag(col("pos"), 1).over(byPos) > w, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__gap")).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("doc_id"), col("__island"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + w).cast("long").as("span_end"),
        count(lit(1)).as("n_hot_grams"))
      .drop("__island")
      .select("doc_id", "span_start", "span_end", "n_hot_grams")
  }

  /** Corpus rewrite dropping every repeated span: tokens whose index
    * falls inside any [[repeatedSpans]] span are removed and the
    * remainder re-joined. Returns `(doc_id, clean_text,
    * n_removed_tokens)` for every document (documents with no hot
    * spans pass through unchanged with 0 removed).
    *
    * Coverage is a BOUNDARY-EVENT SWEEP, not a token×span join: each
    * span contributes a `+1` event at `span_start` and a `−1` event at
    * `span_end` (exclusive); events union with the token positions and
    * ONE per-doc cumulative sum over `(pos, kind)` — events sort before
    * tokens at equal positions, so end-exclusive semantics fall out of
    * the ordering — yields the running span depth at every token. A
    * token is covered iff its depth is > 0. O(tokens + spans) per
    * document: the worst-case doc for this operator (a highly
    * repetitive page whose hot grams split into hundreds of disjoint
    * islands) costs hundreds of extra EVENT ROWS, where a doc-keyed
    * join would materialize tokens×spans rows inside a single
    * un-splittable key.
    *
    * Shape: tokens posexplode per doc, union with boundary events,
    * one doc-partitioned window (the same shuffle the reassembly needs
    * anyway), ordered reassembly via sort_array — no join between the
    * token stream and the span set, no driver-side text handling.
    */
  def removeRepeatedSpans(
      docs: DataFrame, w: Int = 8, minCount: Long = 2): DataFrame = {
    val spans = repeatedSpans(docs, w, minCount)
    // original-case tokens: lowercasing affects only gram HASHING, not
    // tokenization, so positions line up with the span indices
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
    // kind 0 = boundary event (applies before any token at the same
    // pos: a −1 at exclusive span_end uncovers that position; a +1 at
    // span_start covers it); kind 1 = token
    val events = spans.select(col("doc_id"), explode(array(
        struct(col("span_start").cast("int").as("pos"), lit(1L).as("delta")),
        struct(col("span_end").cast("int").as("pos"), lit(-1L).as("delta"))))
        .as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"),
        lit(null).cast("string").as("tok"), col("e.delta").as("delta"),
        lit(0).as("kind"))
    val swept = toks
      .select(col("doc_id"), col("pos"), col("tok"),
        lit(0L).as("delta"), lit(1).as("kind"))
      .unionByName(events)
      .withColumn("__depth", sum(col("delta")).over(
        Window.partitionBy("doc_id").orderBy(col("pos"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    swept.filter(col("kind") === 1)
      .withColumn("__covered", when(col("__depth") > 0, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__covered") === 0,
            struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("clean_text"),
        sum(col("__covered")).as("n_removed_tokens"))
  }

  /** The pre-sweep join formulation of [[removeRepeatedSpans]] — kept
    * as the equivalence-test baseline ONLY (DedupSimilaritySpec checks
    * the sweep against it, including a pathological many-span doc). Do
    * not use at scale: a doc's tokens join to ALL of its spans before
    * re-grouping, quadratic inside one un-splittable doc_id key.
    */
  private[graft] def removeRepeatedSpansViaJoin(
      docs: DataFrame, w: Int = 8, minCount: Long = 2): DataFrame = {
    val spans = repeatedSpans(docs, w, minCount)
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
    val kept = toks
      .join(spans, Seq("doc_id"), "left")
      .withColumn("__in_span",
        col("span_start").isNotNull &&
          col("pos") >= col("span_start") && col("pos") < col("span_end"))
      .groupBy(col("doc_id"), col("pos"), col("tok"))
      .agg(max(when(col("__in_span"), 1L).otherwise(0L)).as("__covered"))
    kept.groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__covered") === 0,
            struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("clean_text"),
        sum(col("__covered")).as("n_removed_tokens"))
  }

  // ------------------------------------------- connected components

  /** Connected components over an undirected near-duplicate pair list:
    * collapses transitive pairs into clusters so curation can keep one
    * survivor per cluster. A raw pair list under-deletes: a~b and b~c
    * must put a, b, c in one group even when a~c was never emitted
    * (sketch dedup misses borderline pairs by design).
    *
    * Alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14),
    * converging to min-labelled stars in O(log² n) rounds — duplicate
    * graphs are near-cliques, so 2–3 rounds in practice. Scale shape:
    * every round is two `min`-aggregate + join shuffles over the EDGE
    * list only; documents never move, no per-node neighbor list is ever
    * collected (a hub's edges stay distributed — the min-neighbor
    * reduction is map-side combined, and the 1-row-per-key build side
    * broadcasts or AQE-splits the join). Lineage is truncated per round
    * via [[graft.plans.Materialize]] — localCheckpoint in local mode;
    * a long-lived cluster job that points `setCheckpointDir` at
    * durable storage gets reliable `checkpoint` automatically.
    *
    * Returns `(doc_id, component)` for every node appearing in `pairs`,
    * where component = smallest doc_id in the connected component.
    * Singleton docs (no pairs) are their own component by definition
    * and are not emitted.
    *
    * Block retention: the returned DataFrame's lineage roots at the
    * FINAL round's localCheckpoint, so that one edge-set copy stays in
    * executor storage while the caller can still recompute the result
    * (every superseded round is freed eagerly inside the loop). Once
    * the caller drops the DataFrame, Spark's ContextCleaner unpersists
    * the blocks on the next driver GC — retention is bounded by the
    * result's reachability, not the SparkContext's lifetime. Callers
    * that materialize the result and want the storage back immediately
    * can `result.rdd.unpersist()`-equivalent by snapshotting
    * (`write`/`collect`) and dropping the reference.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    require(pairs.columns.length >= 2,
      "pairs must have the two id columns first")
    val ids = pairs.columns
    // localCheckpoint blocks are persisted RDDs (not CacheManager
    // entries — Dataset.unpersist can't free them, and waiting on
    // GC-driven ContextCleaner cleanup would let several full edge-set
    // copies pile up over many rounds). Track the RDD ids each round's
    // checkpoint persists and free the superseded round's explicitly.
    // (Assumes no concurrent persists on this SparkContext between
    // snapshots — query construction is single-threaded driver code.)
    val sc = pairs.sparkSession.sparkContext
    var knownIds = sc.getPersistentRDDs.keySet // pre-existing: never touch
    var prevRoundIds = Set.empty[Int]
    def trackRound(): Unit = { // call right after a checkpoint
      val now = sc.getPersistentRDDs.keySet
      prevRoundIds = (now -- knownIds).toSet
      knownIds = now
    }
    def freePrevRound(): Unit =
      prevRoundIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    // Order-independent edge-set signature (count + xor of pair
    // hashes), collected as an `observe` metric DURING the checkpoint
    // materialization — zero extra jobs per round (it used to be a
    // separate agg job). Equality of signatures only TRIGGERS the
    // exact except-based confirmation, so convergence detection stays
    // exact — a signature collision costs one extra job, never a
    // wrong answer.
    def checkpointWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
      val (ck, m) = graft.plans.Materialize.withMetrics(df,
        count(lit(1)).as("n"),
        bit_xor(xxhash64(col("u"), col("v"))).as("x"))
      (ck, (m("n").asInstanceOf[Long],
        Option(m("x")).map(_.asInstanceOf[Long]).getOrElse(0L)))
    }

    // Invariant between steps: edges directed large→small (u > v).
    var (edges, edgeSig) = checkpointWithSig(pairs
      .select(col(ids(0)).cast("long").as("a"), col(ids(1)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct())
    trackRound()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Large-star: every neighbor v > u links to m(u) = min(Γ(u) ∪ {u}).
      //
      // Round structure (restructured in round 14 — measured 1.2–2.6×
      // per CC invocation across the er/doc graphs, outputs
      // set-identical): the min-label reductions are plain
      // map-side-combined groupBy.min — partial aggregation bounds a
      // hub key's final-phase group at ≤ 1 partial row per map task
      // (and under hash-agg spill fallback, one per spill chunk), so
      // the near-clique mega-hub never concentrates its full row set
      // in one reduce group (guide §2.3; the adversarial star-graph
      // spec exercises a 3000-spoke hub). The large-star output is NOT
      // distinct()ed — min over a multiset and the final small-star
      // distinct absorb duplicates, and dropping the intermediate
      // exchange cuts the round from ~9 logical exchanges to 5, all
      // ENSURE_REQUIREMENTS (AQE skew-split stays available for the
      // two joins, unlike pre-partitioned forms), with the sym-by-u
      // and large-by-u subtrees deduped by ReusedExchange at runtime.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(lmins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // m ≤ u < v: stays u > v
        .filter(col("u") =!= col("v"))
      // Small-star: each node re-points its smaller neighbors (and
      // itself) at the minimum of them.
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      // Stars (u→root, root = component min) are fixpoints of both
      // steps, so a same-set check per round detects convergence:
      // |A| = |B| ∧ A∖B = ∅ ⇒ A = B for distinct sets. The signature
      // pre-filter skips the except on rounds that visibly changed.
      val (small, smallSig) = checkpointWithSig(large.join(smins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(smins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
      converged = smallSig == edgeSig && small.except(edges).isEmpty
      // `edges` (the superseded round) was last read by the except
      // above; its blocks are safe to drop now. The new round's ids
      // take its place in the tracker.
      freePrevRound()
      trackRound()
      edges = small
      edgeSig = smallSig
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    edges.select(col("u").as("doc_id"), col("v").as("component"))
      .union(edges.select(col("v"), col("v")).distinct())
  }

  // -------------------------------------------- content-defined chunking

  /** Content-defined chunking (Muthitacharoen et al. 2001, LBFS):
    * every document is cut at positions where the rolling hash of the
    * `w`-char window starting there has its low `maskBits` bits zero —
    * boundaries are a pure function of local CONTENT, so an insertion
    * shifts only the chunk it lands in and identical passages chunk
    * identically in every document that contains them (the property
    * byte-offset chunking lacks). Emits one row per chunk:
    * (doc_id, chunk_start, chunk_len, chunk_hash) with the md5 of the
    * chunk text as its identity.
    *
    * This is the pure form — no min/max chunk clamps, so the boundary
    * set needs no sequential scan: every position is classified
    * independently, which is what makes the operator embarrassingly
    * parallel (and the oracle expressible). Expected chunk length is
    * 2^maskBits characters.
    *
    * Scale shape: ONE corpus scan; the per-position gram hashes are a
    * single codegen'd kernel call per document, boundaries and chunk
    * structs are doc-local array ops (no per-character explode — the
    * explode is per CHUNK, ~len/2^maskBits rows of a 3-column struct),
    * and the document text never rides a shuffle.
    */
  def cdcChunks(docs: DataFrame, w: Int = 8, maskBits: Int = 6): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val mask = (1L << maskBits) - 1
    val hs = nativeCharGramHashes(col("text"), w)
    // gram-start positions (0-based code points) whose window hash
    // lands on the cut pattern; position 0 is always a boundary and is
    // excluded here so the prepended 0 stays unique
    val cuts = filter(
      transform(hs, (h, i) => when(h.bitwiseAND(lit(mask)) === 0 && i > 0, i)),
      x => x.isNotNull)
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        concat(array(lit(0)), cuts, array(length(col("text")))).as("bs"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("bs")) - 1), i =>
          struct(
            element_at(col("bs"), i).as("st"),
            (element_at(col("bs"), i + 1) - element_at(col("bs"), i)).as("ln"),
            md5(col("text").substr(
              element_at(col("bs"), i) + 1,
              element_at(col("bs"), i + 1) - element_at(col("bs"), i))
              .cast("binary")).as("h")))).as("c"))
      .select(col("doc_id"),
        col("c.st").cast("long").as("chunk_start"),
        col("c.ln").cast("long").as("chunk_len"),
        col("c.h").as("chunk_hash"))
  }

  /** Cross-document duplicate chunks under [[cdcChunks]]: chunk hashes
    * seen ≥ 2 times corpus-wide with their copy and document counts —
    * the storage-dedup face (which passages would a chunk store keep
    * once). One map-side-combined shuffle on the 16-byte digest.
    */
  def cdcDuplicateChunks(docs: DataFrame, w: Int = 8,
      maskBits: Int = 6): DataFrame =
    cdcChunks(docs, w, maskBits)
      .groupBy(col("chunk_hash"))
      .agg(min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") >= 2)

  /** Per-unique-chunk store table of [[cdcChunks]]: (chunk_hash, ln,
    * n) — the additive state a chunk store maintains (n sums, ln is a
    * constant per hash, so min merges batches exactly).
    */
  private[graft] def cdcPerHash(docs: DataFrame, w: Int = 8,
      maskBits: Int = 6): DataFrame =
    cdcChunks(docs, w, maskBits)
      .groupBy(col("chunk_hash"))
      .agg(min(col("chunk_len")).as("ln"), count(lit(1)).as("n"))

  /** The store-once roll-up over a [[cdcPerHash]]-shaped table. */
  private[graft] def cdcRatioOf(perHash: DataFrame): DataFrame =
    perHash
      .agg(
        sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        sum(col("ln") * col("n")).as("chars_total"),
        sum(col("ln")).as("chars_unique"))
      .select(col("n_chunks"), col("n_unique"), col("chars_total"),
        col("chars_unique"),
        round(lit(1.0) - col("chars_unique").cast("double")
          / col("chars_total").cast("double"), 6).as("dedup_ratio"))

  /** Corpus-level CDC dedup ratio: how much smaller the corpus would
    * be if every [[cdcChunks]] chunk were stored once (the dedup
    * estimator backup/chunk stores report). Single row —
    * n_chunks / n_unique / chars_total / chars_unique / dedup_ratio.
    * Two cascaded map-side-combined aggregations; nothing corpus-scale
    * is collected.
    */
  def cdcDedupRatio(docs: DataFrame, w: Int = 8,
      maskBits: Int = 6): DataFrame =
    cdcRatioOf(cdcPerHash(docs, w, maskBits))

}
