package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Property-based invariants for the repeated-substring span family
  * (Lee et al. 2021 substring dedup): ∀ random corpora of corpus-wide
  * UNIQUE filler tokens with a hot phrase planted at random slots —
  *
  *  (a) completeness: no w-gram occurring ≥ minCount corpus-wide
  *      survives in any `clean_text` (with unique fillers the hot
  *      grams are exactly the phrase-internal ones, and no splice can
  *      recreate them);
  *  (b) idempotence: removal on the cleaned corpus removes nothing;
  *  (c) conservation: `n_removed_tokens` + surviving tokens = original
  *      token count, per document.
  *
  * Same fixed-seed sampling as MergePropertiesSpec (no scalatestplus
  * bridge in the offline dependency set).
  */
class SpanPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4
  private val phrase = Seq("p0", "p1", "p2", "p3", "p4") // 5 tokens > w

  /** One doc: n unique fillers with k planted phrase copies spliced at
    * random slots (fillers are unique per doc AND per corpus, so every
    * plant is surrounded by tokens that occur exactly once).
    */
  private def docGen(docId: Long): Gen[(Long, String)] =
    for {
      n <- Gen.choose(10, 30)
      k <- Gen.frequency(2 -> Gen.const(0), 3 -> Gen.const(1), 2 -> Gen.const(2))
      slots <- Gen.listOfN(k, Gen.choose(0, n))
    } yield {
      val fillers = (0 until n).map(i => s"f${docId}_$i")
      val withPlants = slots.sorted.reverse
        .foldLeft(fillers.toVector)((acc, s) => acc.patch(s, phrase, 0))
      (docId, withPlants.mkString(" "))
    }

  private def corpusGen: Gen[Seq[(Long, String)]] =
    Gen.sequence[Seq[(Long, String)], (Long, String)]((1L to 8L).map(docGen))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  test("∀ corpora with planted repeats: removal is complete, idempotent, conserving") {
    for (corpus <- samples(corpusGen, 5)) {
      val d = corpus.toDF("doc_id", "text")
      val plants = corpus.map(_._2.split(" ")
        .sliding(phrase.size).count(_.sameElements(phrase))).sum
      val cleaned = Dedup.removeRepeatedSpans(d, w = W, minCount = 2)
      val rows = cleaned.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

      // (a) completeness: if the phrase is hot (≥2 occurrences
      // corpus-wide), no cleaned doc may contain any phrase w-gram
      if (plants >= 2)
        for ((id, (clean, _)) <- rows)
          assert(!s" $clean ".contains(" " + phrase.take(W).mkString(" ") + " "),
            s"hot gram survived in doc $id: $clean")
      else // nothing hot: removal must be the identity
        assert(rows.values.forall(_._2 == 0L))

      // (c) conservation per doc: removed + surviving = original
      for ((id, text) <- corpus) {
        val (clean, removed) = rows(id)
        val surviving = if (clean.isEmpty) 0 else clean.split(" ").length
        assert(removed + surviving == text.split(" ").length,
          s"doc $id: removed=$removed surviving=$surviving")
      }

      // (b) idempotence: a second pass over the cleaned corpus is a
      // no-op (nothing is hot anymore — unique fillers can't splice
      // into a repeated gram)
      val again = Dedup.removeRepeatedSpans(
        cleaned.select($"doc_id", $"clean_text".as("text")),
        w = W, minCount = 2)
      assert(again.agg(sum($"n_removed_tokens")).head().getLong(0) == 0L)
      val reclean = again.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(reclean == rows.map { case (k, v) => k -> v._1 })
    }
  }

  test("∀ corpora: bm25 ranks a doc strictly higher when its tf rises, all else equal") {
    import graft.functions.TextAnalysis
    // pairs of docs with identical length, differing only in how many
    // filler slots the query term occupies — the higher-tf twin must
    // score strictly higher (BM25 tf gain is monotone, saturating)
    val gen = for {
      n <- Gen.choose(12, 24)
      t1 <- Gen.choose(1, 5)
      t2 <- Gen.choose(6, 11)
    } yield (n, t1, t2)
    for (((n, lo, hi), idx) <- samples(gen, 5).zipWithIndex) {
      def doc(id: Long, tf: Int) =
        (id, ((0 until tf).map(_ => "term") ++
          (tf until n).map(j => s"x${idx}_${id}_$j")).mkString(" "))
      val d = Seq(doc(1L, lo), doc(2L, hi), (3L, "term anchor " +
        (0 until n).map(j => s"y$j").mkString(" "))).toDF("doc_id", "text")
      val scores = TextAnalysis.bm25TopK(d, Seq("term"), 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(scores(2L) > scores(1L),
        s"tf=$hi should outscore tf=$lo: $scores")
    }
  }

  /** Char-level corpora: HIGH-ENTROPY filler tokens (9 random lowercase
    * letters each — structured fillers like `d00X_iYYY` provably break
    * char-level idempotence: after a cut, splice windows that end
    * before the distinguishing counter digit collide across cut sites,
    * e.g. "001  i00" from both …i005 and …i006 — random letters make
    * any such collision ~26^-10) with a 38-char hot segment planted at
    * random token slots.
    */
  private val charPlant = "<<<HOT-REPEATED-SEGMENT-0123456789>>>!"
  private def charDocGen(docId: Long): Gen[(Long, String)] =
    for {
      n <- Gen.choose(8, 20)
      k <- Gen.frequency(2 -> Gen.const(0), 3 -> Gen.const(1), 2 -> Gen.const(2))
      slots <- Gen.listOfN(k, Gen.choose(0, n))
      fillers <- Gen.listOfN(n, Gen.listOfN(9, Gen.alphaLowerChar).map(_.mkString))
    } yield {
      val withPlants = slots.sorted.reverse
        .foldLeft(fillers.toVector)((acc, s) => acc.patch(s, Seq(charPlant), 0))
      (docId, withPlants.mkString(" "))
    }
  private def charCorpusGen: Gen[Seq[(Long, String)]] =
    Gen.sequence[Seq[(Long, String)], (Long, String)]((1L to 8L).map(charDocGen))

  test("∀ corpora with planted char repeats: char removal is complete, idempotent, conserving") {
    for (corpus <- samples(charCorpusGen, 5)) {
      val d = corpus.toDF("doc_id", "text")
      val plants = corpus.map(c =>
        c._2.sliding(charPlant.length).count(_ == charPlant)).sum
      val cleaned = Dedup.removeCharSpans(d, k = 10, minCount = 2)
      val rows = cleaned.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

      if (plants >= 2)
        // completeness: no plant-internal 10-gram survives anywhere
        for ((id, (clean, _)) <- rows)
          assert(!clean.contains(charPlant.substring(4, 14)),
            s"hot char gram survived in doc $id: $clean")
      else assert(rows.values.forall(_._2 == 0L))

      // conservation: kept chars + removed chars = original chars
      for ((id, text) <- corpus) {
        val (clean, removed) = rows(id)
        assert(clean.length + removed == text.length,
          s"doc $id: kept=${clean.length} removed=$removed of ${text.length}")
      }

      // idempotence: unique fillers cannot splice into a repeat
      val again = Dedup.removeCharSpans(
        cleaned.select($"doc_id", $"clean_text".as("text")),
        k = 10, minCount = 2)
      assert(again.agg(sum($"n_removed_chars")).head().getLong(0) == 0L)
    }
  }

  test("∀ random corpora: crossJaccardPairs equals an in-memory bipartite brute force") {
    def shingles(text: String, w: Int): Set[String] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Set("")
      else if (toks.length <= w) Set(toks.mkString(" "))
      else toks.sliding(w).map(_.mkString(" ")).toSet
    }
    // planted-phrase docs share only the 3 phrase-internal 3-grams, so
    // true cross J sits around 0.04–0.1 — θ = 0.05 keeps the expected
    // set non-trivial while the prefix filter still prunes
    var signal = 0
    for (corpus <- samples(corpusGen, 4)) {
      val d = corpus.toDF("doc_id", "text")
      val got = Dedup.crossJaccardPairs(
          d.filter($"doc_id" % 2 === 1), d.filter($"doc_id" % 2 === 0),
          w = 3, threshold = 0.05)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (a, ta) <- corpus if a % 2 == 1
        (b, tb) <- corpus if b % 2 == 0
        sa = shingles(ta, 3); sb = shingles(tb, 3)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= 0.05
      } yield (a, b)).toSet
      assert(got == want, s"cross pairs diverged: got $got want $want")
      signal += want.size
    }
    assert(signal > 0, "no sample produced any cross-side near-dup — fuzz untested")
  }

  test("∀ corpora: every reported span is hot and spans never overlap within a doc") {
    for (corpus <- samples(corpusGen, 3)) {
      val d = corpus.toDF("doc_id", "text")
      val spans = Dedup.repeatedSpans(d, w = W, minCount = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // disjoint and ordered per doc, each at least w wide
      for ((_, ss) <- spans.groupBy(_._1)) {
        val sorted = ss.sortBy(_._2)
        assert(sorted.forall { case (_, s, e, n) => e >= s + W && n >= 1 })
        assert(sorted.sliding(2).forall {
          case Array((_, _, e1, _), (_, s2, _, _)) => s2 > e1
          case _ => true
        })
      }
    }
  }
}
