package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu+ 2016, the BERT tokenizer family):
  * greedy LONGEST-MATCH-FIRST segmentation of each word against a
  * fixed vocabulary, continuation pieces carrying the `##` prefix, and
  * the classic whole-word `[UNK]` fallback — if any position fails to
  * match, the entire word collapses to one `[UNK]` token (HuggingFace
  * `BertTokenizer` semantics, not partial emission).
  *
  * The complement of [[Bpe]]: BPE learns merges bottom-up and encodes
  * by replaying them; WordPiece encodes top-down against a finished
  * vocabulary. Encoding is map-only — one `graft_wordpiece` kernel
  * call per row with the vocabulary folded into the expression at
  * construction (same discipline as `graft_bpe_encode`), zero
  * exchange, so the corpus pass scales exactly like any narrow
  * projection.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Deterministic fixture vocabulary the registered query and its
    * recursive-CTE oracle both use: ASCII letters/digits MINUS q/x/z
    * as both word-start and `##` continuation pieces (the corpus has
    * hundreds of q/x/z words, so the whole-word [UNK] collapse fires
    * on real data and the oracle must reproduce it), plus multi-char
    * pieces that make longest-match-first observable ("tab"+"##le"
    * beats "t","a","b",…).
    */
  val fixtureVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      .filterNot(Set("q", "x", "z"))
    val multi = Seq("the", "ta", "tab", "##le", "##er", "##st", "##ing",
      "##ed", "##es", "##al", "##ow", "##an", "##on")
    singles ++ singles.map("##" + _) ++ multi
  }

  /** Encode a text column against a WordPiece vocabulary: lowercase,
    * whitespace-split, greedy longest-match per word, `array<string>`
    * of pieces out (words' pieces concatenated left to right, failed
    * words as one [[Unk]]). Map-only kernel call.
    */
  def encode(text: Column, vocab: Seq[String]): Column = {
    graft.plans.GraftFunctions.registerActive()
    val vocabLit =
      if (vocab.isEmpty) array().cast("array<string>")
      else array(vocab.map(lit): _*)
    call_function("graft_wordpiece", text, vocabLit)
  }

  /** Map encoded pieces to integer ids — the 1-based position in the
    * vocabulary, with 0 reserved for [[Unk]] (and anything else off
    * vocabulary): `array_position`'s miss value IS 0, so the [UNK]
    * convention falls out of the lookup. The trainer-facing tail of
    * the tokenizer: text → pieces → ids. Map-only.
    */
  def toIds(pieces: Column, vocab: Seq[String]): Column = {
    val vocabLit =
      if (vocab.isEmpty) array().cast("array<string>")
      else array(vocab.map(lit): _*)
    transform(pieces, p => array_position(vocabLit, p))
  }
}
