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
}
