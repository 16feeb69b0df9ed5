package graft

import org.apache.spark.sql.functions._
import graft.functions.Unigram

/** Unigram-LM Viterbi kernel vs an independent in-memory DP, the
  * optimality property greedy matching lacks, and the tie/fallback
  * corners.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference DP (no shared code with the kernel). */
  private def refEncode(text: String, costOf: Map[String, Long],
      charCost: Long): (Seq[String], Long) = {
    val maxLen = (1 +: costOf.keys.map(_.length).toSeq).max
    var total = 0L
    val toks = text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
      val n = w.length
      val best = Array.fill(n + 1)(Long.MaxValue)
      val bp = new Array[Int](n + 1)
      best(0) = 0L
      for (i <- 1 to n; len <- 1 to math.min(i, maxLen)) {
        val sub = w.substring(i - len, i)
        val c0 = costOf.get(sub).orElse(
          if (len == 1) Some(charCost) else None)
        c0.foreach { c =>
          val tot = best(i - len) + c
          if (tot < best(i) || (tot == best(i) && len > bp(i))) {
            best(i) = tot; bp(i) = len
          }
        }
      }
      total += best(n)
      var j = n
      var acc = List.empty[String]
      while (j > 0) { acc = w.substring(j - bp(j), j) :: acc; j -= bp(j) }
      acc
    }
    (toks, total)
  }

  private def encodeOne(text: String, pieces: Seq[String],
      costs: Seq[Long], charCost: Int): (Seq[String], Long) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(Unigram.encodeWithCost(col("text"), pieces, costs, charCost).as("e"))
      .select(col("e.toks"), col("e.cost"))
      .as[(Seq[String], Long)].head()
    r
  }

  test("kernel matches the independent DP on real corpus docs (fixture inventory)") {
    val costMap = Unigram.fixturePieces.map(p => p -> Unigram.pieceCost(p)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Unigram.encodeFixture(col("text")).as("e"))
      .select(col("doc_id"), col("e.toks"), col("e.cost"))
      .as[(Long, Seq[String], Long)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    for ((id, toks, cost) <- got) {
      val (wantToks, wantCost) = refEncode(texts(id), costMap, Unigram.CharCost)
      assert(toks == wantToks, s"doc $id tokens")
      assert(cost == wantCost, s"doc $id cost")
    }
  }

  test("Viterbi beats greedy longest-match where greedy is suboptimal") {
    // crafted costs: greedy takes 'tab' first and is forced into
    // 'tab'+'le' (900); the DP sees 'ta'+'ble' (300). This is the
    // case that separates unigram from WordPiece semantics.
    val pieces = Seq("tab", "ta", "ble", "le")
    val costs = Seq(400L, 150L, 150L, 500L)
    val (toks, cost) = encodeOne("table", pieces, costs, charCost = 10000)
    assert(toks == Seq("ta", "ble"), s"got $toks")
    assert(cost == 300L)
    // greedy reference for contrast: longest-match-first would pay more
    val greedyCost = 400L + 500L // tab + le
    assert(cost < greedyCost)
  }

  test("cost ties prefer the longer piece; unknown chars ride the fallback") {
    // 'ab' costs exactly a+b (two fallback chars): the tie must
    // resolve to the single longer piece
    val (toks, cost) = encodeOne("ab", Seq("ab"), Seq(200L), charCost = 100)
    assert(toks == Seq("ab") && cost == 200L)
    // word with no inventory coverage at all segments to chars
    val (t2, c2) = encodeOne("xyz", Seq("ab"), Seq(200L), charCost = 100)
    assert(t2 == Seq("x", "y", "z") && c2 == 300L)
    // empty text
    val (t3, c3) = encodeOne("  ", Seq("ab"), Seq(200L), charCost = 100)
    assert(t3.isEmpty && c3 == 0L)
  }

  test("encodeSampled: noiseMod=1 ≡ plain encode; diversity appears; chars conserved; replays") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 80).select("doc_id", "text")
    val pieces = Unigram.fixturePieces
    val costs = pieces.map(Unigram.pieceCost)
    def run(noiseMod: Int) = docs.select(col("doc_id"),
        Unigram.encodeSampled(col("text"), pieces, costs,
          noiseMod = noiseMod).as("e"))
      .select(col("doc_id"), col("e.toks"), col("e.cost"))
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val plain = docs.select(col("doc_id"),
        Unigram.encodeFixture(col("text")).as("e"))
      .select(col("doc_id"), col("e.toks"), col("e.cost"))
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // noiseMod = 1: noise ≡ 0, exactly the plain Viterbi
    assert(run(1) == plain)
    // real noise: pure function of the inputs (bit-identical replay)
    val s301 = run(301)
    assert(run(301) == s301)
    // the regularization signal: some docs segment DIFFERENTLY than
    // the argmax path (that's the point of sampling)
    val diverged = s301.count { case (id, (toks, _)) => toks != plain(id)._1 }
    assert(diverged > 0, "noise=301 produced zero segmentation diversity")
    // segmentation never invents or loses characters: per doc, token
    // chars == word chars
    val texts = docs.as[(Long, String)].collect().toMap
    for ((id, (toks, _)) <- s301) {
      val wordChars = texts(id).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(_.length).sum
      assert(toks.map(_.length).sum == wordChars, s"doc $id")
    }
  }

  test("trainer: EM rounds move costs toward usage; reference replay agrees") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val trained = Unigram.trainUnigram(docs, rounds = 2, m = 24)
    assert(trained.size == 24)
    // every cost respects the positive floor and the formula
    val mx = trained.map(_.cnt).max
    for (tp <- trained) {
      assert(tp.cost >= 1L)
      assert(tp.cost == Unigram.updatedCost(tp.plen, tp.cnt, mx),
        s"${tp.piece}: cost not the round-2 update of its own count")
    }
    // EM actually discriminates: used pieces are cheaper than unused
    // peers of the same length
    val used2 = trained.filter(t => t.plen == 2 && t.cnt > 0)
    val unused2 = trained.filter(t => t.plen == 2 && t.cnt == 0)
    if (used2.nonEmpty && unused2.nonEmpty)
      assert(used2.map(_.cost).min < unused2.map(_.cost).min,
        "usage left costs unmoved — the M-step is dead")
    // and the trained inventory segments corpus words more cheaply
    // than the seed-cost inventory (EM round improved the objective)
    val pieces = trained.map(_.piece)
    val seedTotal = docs.select(sum(Unigram.encodeWithCost(col("text"),
        pieces, pieces.map(p => Unigram.seedCost(p.length))).getField("cost")))
      .head().getLong(0)
    val trainedTotal = docs.select(sum(Unigram.encodeWithCost(col("text"),
        pieces, trained.map(_.cost)).getField("cost")))
      .head().getLong(0)
    assert(trainedTotal < seedTotal,
      s"trained inventory did not lower corpus cost: $trainedTotal vs $seedTotal")
  }

  test("optimality: engine cost ≤ any random valid segmentation's cost (fuzzed)") {
    val rnd = new scala.util.Random(19)
    val costMap = Unigram.fixturePieces.map(p => p -> Unigram.pieceCost(p)).toMap
    def segCost(w: String, cuts: Seq[Int]): Option[Long] = {
      val bounds = (0 +: cuts.sorted :+ w.length).distinct
      val parts = bounds.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq
      val cs = parts.map(p => costMap.get(p).orElse(
        if (p.length == 1) Some(Unigram.CharCost.toLong) else None))
      if (cs.forall(_.isDefined)) Some(cs.flatten.sum) else None
    }
    for (_ <- 1 to 30) {
      val w = (1 to 3 + rnd.nextInt(8))
        .map(_ => "abelotshwrn".charAt(rnd.nextInt(11))).mkString
      val (_, engineCost) = encodeOne(w,
        Unigram.fixturePieces, Unigram.fixturePieces.map(Unigram.pieceCost),
        Unigram.CharCost)
      for (_ <- 1 to 10) {
        val cuts = (1 until w.length).filter(_ => rnd.nextBoolean())
        segCost(w, cuts).foreach(c =>
          assert(engineCost <= c, s"'$w': engine $engineCost > random seg $c"))
      }
    }
  }
}
