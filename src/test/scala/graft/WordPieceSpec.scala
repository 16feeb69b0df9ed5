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

  // --------------------------------------------------------- trainer

  /** Independent in-memory WordPiece trainer over a word-frequency
    * map: likelihood score cnt(ab)/(cnt(a)·cnt(b)), ties to (a, b),
    * leftmost-non-overlapping fusion — mirrors the published
    * algorithm, not the engine code.
    */
  private def refTrainWp(freq: Map[String, Long], rounds: Int): Seq[WordPiece.WpMerge] = {
    var vocab: Map[Vector[String], Long] = freq.map { case (w, n) =>
      (w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c
      }, n)
    }
    val out = Seq.newBuilder[WordPiece.WpMerge]
    for (_ <- 1 to rounds) {
      val sym = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val pair = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((sy, n) <- vocab) {
        sy.foreach(s => sym(s) += n)
        sy.sliding(2).filter(_.length == 2).foreach(p => pair((p(0), p(1))) += n)
      }
      if (pair.nonEmpty) {
        val ((a, b), cab) = pair.toSeq.minBy { case ((a, b), c) =>
          (-c.toDouble / (sym(a).toDouble * sym(b).toDouble), a, b)
        }
        val fused = a + b.stripPrefix("##")
        out += WordPiece.WpMerge(a, b, fused, cab, sym(a), sym(b))
        vocab = vocab.map { case (sy, n) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              nb += fused; i += 2
            } else { nb += sy(i); i += 1 }
          }
          (nb.result(), n)
        }
      }
    }
    out.result()
  }

  test("trainer matches the in-memory reference on a seeded corpus (10 rounds)") {
    // seeded corpus with deliberate structure: shared suffixes that
    // frequency would merge first but likelihood re-ranks (rare-symbol
    // pairs score high), plus singleton words
    val freq = Map("tab" -> 9L, "table" -> 6L, "tables" -> 3L,
      "low" -> 5L, "lower" -> 2L, "bab" -> 4L, "ebb" -> 1L)
    val docs = freq.toSeq.sortBy(_._1).flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = WordPiece.trainWordPiece(docs, numMerges = 10)
    val want = refTrainWp(freq, 10)
    assert(got == want, s"engine\n  $got\nvs reference\n  $want")
    // scoring is likelihood, NOT raw frequency: assert the two orders
    // actually differ on this corpus, or the test can't distinguish
    // WordPiece's objective from BPE's
    val bpeOrder = graft.functions.Bpe.trainBpe(
      docs.select(col("doc_id"), col("text")), numMerges = 1)
    assert(got.head.a + "|" + got.head.b.stripPrefix("##")
      != bpeOrder.head._1 + "|" + bpeOrder.head._2.replace("</w>", ""),
      "fixture corpus does not separate likelihood from frequency scoring")
  }

  test("trained induced vocab: encode segments corpus words losslessly, fixture path unchanged") {
    val freq = Map("tab" -> 9L, "table" -> 6L, "tables" -> 3L, "low" -> 5L)
    val docs = freq.toSeq.sortBy(_._1).flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = WordPiece.trainWordPiece(docs, numMerges = 6)
    val vocab = WordPiece.inducedVocab(merges, "abelostw".map(_.toString))
    // every corpus word segments without [UNK] (alphabet fallback) and
    // the pieces reassemble the word exactly
    for (w <- freq.keys) {
      val toks = encodeOne(w, vocab)
      assert(!toks.contains(WordPiece.Unk), s"$w collapsed under trained vocab")
      assert(toks.head + toks.tail.map(_.stripPrefix("##")).mkString == w,
        s"$w pieces $toks don't reassemble")
    }
    // a trained multi-char piece actually fires (not just char tiling)
    assert(encodeOne("table", vocab).length < 5, "no trained piece used for 'table'")
    // and the q-less fixture path still UNKs q words (trained vocab is
    // additive machinery, not a change to the fixture contract)
    assert(encodeOne("query", WordPiece.fixtureVocab) == Seq(WordPiece.Unk))
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

  test("tok_coverage: report matches independent per-doc arithmetic; fertility excludes [UNK]s") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Queries.tokCoverage(spark, sfDir)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)
    var sawUnk = false
    for ((id, text) <- docs) {
      val words = text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      val toks = refEncode(text, WordPiece.fixtureVocab)
      val nOov = toks.count(_ == WordPiece.Unk)
      sawUnk ||= nOov > 0
      val covered = words.length - nOov
      val exp = (id, words.length.toLong, toks.length.toLong, nOov.toLong,
        if (words.nonEmpty) Some(r4(nOov.toDouble / words.length)) else None,
        if (covered > 0) Some(r4((toks.length - nOov).toDouble / covered)) else None)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    }
    // the corpus must actually exercise the [UNK] branch (q/x/z words)
    assert(sawUnk, "fixture corpus produced no [UNK] — coverage test is vacuous")
  }
}
