package graft

import org.apache.spark.sql.functions._
import graft.functions.WordPiece

/** WordPiece kernel vs an independent in-memory greedy matcher, plus
  * the semantic corners that distinguish WordPiece from BPE: longest-
  * match-first, `##` continuation positions, and the whole-word [UNK]
  * collapse (never partial emission).
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def refEncode(text: String, vocab: Seq[String]): Seq[String] = {
    val set = vocab.toSet
    val maxLen = (1 +: vocab.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length)).max
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
      val toks = scala.collection.mutable.ArrayBuffer[String]()
      var pos = 0
      var dead = false
      while (pos < w.length && !dead) {
        val hit = (math.min(maxLen, w.length - pos) to 1 by -1).iterator
          .map { len =>
            val sub = w.substring(pos, pos + len)
            if (pos == 0) sub else "##" + sub
          }
          .find(set.contains)
        hit match {
          case None => dead = true
          case Some(h) =>
            toks += h
            pos += (if (pos == 0) h.length else h.length - 2)
        }
      }
      if (dead) Seq(WordPiece.Unk) else toks.toSeq
    }
  }

  private def encodeOne(text: String, vocab: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(WordPiece.encode(col("text"), vocab).as("t"))
      .as[Seq[String]].head()

  test("kernel matches the in-memory greedy reference on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val got = docs.select(col("doc_id"),
        WordPiece.encode(col("text"), WordPiece.fixtureVocab).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    var unkSeen = false
    for ((id, text) <- texts) {
      val want = refEncode(text, WordPiece.fixtureVocab)
      assert(got(id) == want, s"doc $id")
      unkSeen ||= want.contains(WordPiece.Unk)
    }
    // the fixture vocab omits q/x/z precisely so this path is LIVE on
    // real data — if no sampled doc hits it, the fixture went stale
    assert(unkSeen, "no [UNK] produced on the sampled docs; fixture vocab too permissive")
  }

  test("longest-match-first, continuation pieces, whole-word UNK on crafted words") {
    val v = WordPiece.fixtureVocab
    // "tab"+"##le" beats character tiling; rank order of probe lengths
    assert(encodeOne("table", v) == Seq("tab", "##le"))
    assert(encodeOne("tables", v) == Seq("tab", "##le", "##s"))
    // start pieces never match mid-word: "the" only at position 0
    assert(encodeOne("the", v) == Seq("the"))
    // q dropped from the vocab: the WHOLE word collapses, even though
    // 'u','e','r','y' would match — no partial emission
    assert(encodeOne("query", v) == Seq(WordPiece.Unk))
    // multiple words: per-word independence
    assert(encodeOne("the query", v) == Seq("the", WordPiece.Unk))
  }

  test("empty vocab collapses every word; empty text yields no tokens") {
    assert(encodeOne("a b c", Seq.empty) ==
      Seq(WordPiece.Unk, WordPiece.Unk, WordPiece.Unk))
    assert(encodeOne("", WordPiece.fixtureVocab) == Seq.empty)
    assert(encodeOne("   ", WordPiece.fixtureVocab) == Seq.empty)
  }

  test("toIds: 1-based vocab positions, 0 reserved for [UNK]") {
    val v = WordPiece.fixtureVocab
    val got = Seq(Tuple1("the query table")).toDF("text")
      .select(WordPiece.toIds(WordPiece.encode(col("text"), v), v).as("ids"))
      .as[Seq[Long]].head()
    val pieces = Seq("the", WordPiece.Unk, "tab", "##le")
    assert(got.length == pieces.length)
    assert(got(1) == 0L, "[UNK] must map to the reserved id 0")
    for ((id, p) <- got.zip(pieces) if id > 0)
      assert(v(id.toInt - 1) == p, s"id $id should name $p")
  }

  test("random vocab subsets: kernel == reference on fuzzed words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdeq"
    for (i <- 1 to 40) {
      val vocab = WordPiece.fixtureVocab.filter(_ => rnd.nextBoolean())
      val words = Seq.fill(6)(
        (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val text = words.mkString(" ")
      assert(encodeOne(text, vocab) == refEncode(text, vocab), s"case $i: '$text' vocab=$vocab")
    }
  }
}
