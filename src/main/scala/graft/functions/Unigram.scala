package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (Kudo 2018, the segmentation model behind
  * SentencePiece) — the third of the three real-world subword
  * families, completing the matrix next to [[Bpe]] (bottom-up merges)
  * and [[WordPiece]] (greedy top-down): segmentation is the VITERBI
  * minimum-total-cost path over a piece inventory, the global optimum
  * greedy longest-match only approximates (a cheap long piece early
  * can force expensive pieces later — the DP sees past that).
  *
  * Costs are EXACT INTEGERS (a fixed md5-derived table standing in
  * for trained −log-probs, the `hashedLinearScore` convention), so
  * the chosen path, its total cost, and every tie-break are
  * reproducible in any engine: ties prefer the longer piece. Encoding
  * is map-only — ONE `graft_unigram` kernel call per row with the
  * inventory folded in at construction, zero exchange.
  */
object Unigram {

  /** Every single character segments at this cost when not in the
    * inventory — the fallback that makes segmentation total.
    */
  val CharCost = 2000

  /** Fixture inventory: common English fragments, multi-char only
    * (singles ride the [[CharCost]] fallback uniformly). Chosen so
    * Viterbi-vs-greedy divergence is LIVE on real corpus words
    * (overlapping pieces like ta/tab/ble/le compete).
    */
  val fixturePieces: Seq[String] = Seq(
    "th", "the", "he", "er", "st", "est", "ta", "tab", "ble", "le",
    "ab", "ion", "ing", "ed", "an", "on", "en", "at", "ll", "ow",
    "low", "re", "ter", "al", "ar", "ro", "li", "ne").distinct

  /** First 4 md5 bytes of the ASCII string, unsigned — the same value
    * as DuckDB's `CAST(concat('0x', substr(md5(s), 1, 8)) AS UBIGINT)`.
    */
  private[graft] def md5Int(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Integer cost of a piece: length discount (longer pieces are
    * cheaper per character — the trained-model shape) plus md5 jitter
    * so near-equal segmentations break ties nontrivially; replayed
    * verbatim by the SQL oracle.
    */
  def pieceCost(p: String): Long =
    2200L - 500L * p.length + md5Int("uc_" + p) % 400L

  /** Viterbi-encode a text column against an inventory: returns
    * `struct(toks array<string>, cost bigint)` — one kernel call per
    * row, map-only.
    */
  def encodeWithCost(text: Column, pieces: Seq[String],
      costs: Seq[Long], charCost: Int = CharCost): Column = {
    require(pieces.length == costs.length)
    graft.plans.GraftFunctions.registerActive()
    val pLit =
      if (pieces.isEmpty) array().cast("array<string>")
      else array(pieces.map(lit): _*)
    val cLit =
      if (costs.isEmpty) array().cast("array<bigint>")
      else array(costs.map(lit): _*)
    call_function("graft_unigram", text, pLit, cLit, lit(charCost))
  }

  /** Fixture-inventory encode (the registered-query face). */
  def encodeFixture(text: Column): Column =
    encodeWithCost(text, fixturePieces, fixturePieces.map(pieceCost))

  /** [[encodeWithCost]] with deterministic SUBWORD SAMPLING (Kudo 2018
    * §4 — training on sampled segmentations instead of the argmax
    * regularizes the downstream model): every candidate piece's cost
    * is perturbed by md5 noise keyed on (word, piece) — a
    * Gumbel-style perturb-and-Viterbi, so "sampling" is a pure
    * function of the inputs that the DuckDB oracle replays and
    * shuffles/retries cannot change (the [[graft.functions.Bpe
    * .encodeDropout]] discipline applied to the Unigram face).
    * `noiseMod = 1` ≡ [[encodeWithCost]] exactly (spec-pinned);
    * noise up to `noiseMod − 1` on a ~200–2100 cost scale shifts
    * near-tied lattice paths, which is where Kudo's n-best mass
    * lives. Map-only, one kernel call per row.
    */
  def encodeSampled(text: Column, pieces: Seq[String], costs: Seq[Long],
      charCost: Int = CharCost, noiseMod: Int = 301): Column = {
    require(pieces.length == costs.length)
    graft.plans.GraftFunctions.registerActive()
    val pLit =
      if (pieces.isEmpty) array().cast("array<string>")
      else array(pieces.map(lit): _*)
    val cLit =
      if (costs.isEmpty) array().cast("array<bigint>")
      else array(costs.map(lit): _*)
    call_function("graft_unigram_sampled", text, pLit, cLit,
      lit(charCost), lit(noiseMod))
  }

  // ------------------------------------------------------- training

  /** One trained inventory row: piece, its round-2 corpus-weighted
    * usage count, and its final cost.
    */
  final case class TrainedPiece(piece: String, plen: Int, cnt: Long, cost: Long)

  /** Initial cost before any usage statistics: length discount only
    * (no jitter — the trainer's statistics, not a hash, should move
    * costs).
    */
  def seedCost(len: Int): Long = 2200L - 500L * len

  /** Usage-updated cost: frequently-chosen pieces get cheaper — the
    * integer-exact stand-in for −log p(piece) that keeps the whole
    * trainer oracle-replayable (no transcendental functions, whose
    * last-bit rounding SQL engines do not guarantee).
    */
  def updatedCost(len: Int, cnt: Long, maxCnt: Long): Long =
    math.max(1L, 2200L - 500L * len - (600L * cnt) / (maxCnt + 1L))

  /** Unigram-LM VITERBI-EM training (the hard-EM variant of Kudo
    * 2018's trainer): seed the inventory with the corpus's top-`m`
    * substrings of length 2–4 (corpus-weighted occurrence counts),
    * then alternate (E) Viterbi-segment the word table under current
    * costs — the `graft_unigram` kernel, one call per distinct word —
    * and (M) recount piece usage and re-price via [[updatedCost]].
    * EVERYTHING is exact integers, so both EM rounds replay in SQL.
    *
    * Scale shape = the [[Bpe.trainBpe]] contract: ONE corpus-scale
    * pass (the capped word count); seeding and every EM round run on
    * the ≤`vocabCap` word table; driver state is the `m`-row
    * inventory per round.
    */
  def trainUnigram(docs: org.apache.spark.sql.DataFrame, rounds: Int = 2,
      m: Int = 48, vocabCap: Int = 65536): Seq[TrainedPiece] = {
    val session = docs.sparkSession
    import session.implicits._
    val wc = Bpe.wordCounts(docs, vocabCap).persist()
    try {
      // every (start, len∈2..4) substring of every word, weighted by
      // word frequency — substring with per-row start/len needs the
      // expr form (the DSL's substring takes literal ints)
      // CASE guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
      // not empty — words shorter than l must take the empty branch
      val subsE = wc.select(col("n"), explode(expr(
        "flatten(transform(array(2, 3, 4), l -> " +
          "CASE WHEN length(word) >= l THEN " +
          "transform(sequence(1, length(word) - l + 1), " +
          "i -> substring(word, i, l)) " +
          "ELSE CAST(array() AS array<string>) END))")).as("piece"))
      val seed = subsE.filter(length(col("piece")) >= 2)
        .groupBy("piece").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("piece")).limit(m)
        .select("piece").as[String].collect().toSeq
      var costs: Map[String, Long] =
        seed.map(p => p -> seedCost(p.length)).toMap
      var lastCnt: Map[String, Long] = Map.empty
      for (_ <- 1 to rounds) {
        val pieces = seed
        val costArr = pieces.map(costs)
        val segged = wc.select(col("n"),
          encodeWithCost(col("word"), pieces, costArr, CharCost)
            .getField("toks").as("toks"))
        val cnts = segged.select(col("n"), explode(col("toks")).as("piece"))
          .filter(length(col("piece")) >= 2)
          .groupBy("piece").agg(sum(col("n")).as("cnt"))
          .as[(String, Long)].collect().toMap
        lastCnt = seed.map(p => p -> cnts.getOrElse(p, 0L)).toMap
        val maxCnt = if (lastCnt.isEmpty) 0L else lastCnt.values.max
        costs = seed.map(p =>
          p -> updatedCost(p.length, lastCnt(p), maxCnt)).toMap
      }
      seed.map(p => TrainedPiece(p, p.length, lastCnt(p), costs(p)))
    } finally { wc.unpersist(); () }
  }
}
