package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Properties of the web-corpus screening operators added round 10:
  * blocklist hit semantics, mojibake detection on clean vs damaged
  * text, and the classifier calibration contract's invariants
  * (confusion counts sum to N; recall non-increasing, prediction
  * count non-increasing in the threshold).
  */
class TextScreenSpec extends SparkSpec {
  import spark.implicits._

  test("blocklist: occurrence counts, overlapping bigrams, keep flag") {
    val docs = Seq(
      (0L, "clean words only here"),
      (1L, "slow slow day"),                // word 'slow' twice
      (2L, "the big big big table"),        // 'big big' overlaps twice
      (3L, "table table table spark slow"), // 2 bigram + 2 word hits
      (4L, ""),                             // empty text
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .blocklistScreen(docs, Seq("slow", "spark", "table table", "big big"))
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 0L, 0L, 0L, true)))
    assert(out(1) == ((1L, 2L, 0L, 2L, false)))
    assert(out(2) == ((2L, 0L, 2L, 2L, false)))
    assert(out(3) == ((3L, 2L, 2L, 4L, false)))
    assert(out(4) == ((4L, 0L, 0L, 0L, true)))
  }

  test("blocklist: rejects 3-word phrases and non-normalized entries") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(docs, Seq("a b c"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(docs, Seq("Spark"))
    }
  }

  test("mojibake: zero on clean ASCII, exact marker counts on damaged text") {
    // the canonical damage: UTF-8 bytes of "café" re-read as Latin-1
    val damaged = new String("café résumé".getBytes("UTF-8"), "ISO-8859-1")
    assert(damaged == "cafÃ©  rÃ©sumÃ©".replace("  ", " ")) // 3 Ã markers
    val docs = Seq(
      (0L, "perfectly clean ascii text"),
      (1L, damaged),
      (2L, "partial � replacement � chars"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeSignal(docs)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out(0)._2 == 0L && !out(0)._5)
    assert(out(1)._2 == 3L && out(1)._5) // one Ã per damaged accent
    assert(out(2)._2 == 2L && out(2)._5)
    assert(out(0)._4 == 0.0)
  }

  test("substring decontamination: verbatim needle at any position; prefix-only misses") {
    val train = Seq(
      (0L, "totally clean document text"),
      (1L, "leading words then THE SECRET EVAL PROMPT appears inline"),
      (2L, "THE SECRET EVAL PROMPT starts this one"),
      (3L, "the secret eval prompt differs by case"), // exact match only
      (4L, "two hits: THE SECRET EVAL PROMPT and ANOTHER NEEDLE too"),
    ).toDF("doc_id", "text")
    val out = graft.functions.Dedup.substringContamination(train,
        Seq("THE SECRET EVAL PROMPT", "ANOTHER NEEDLE"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 0L, false)))
    assert(out(1) == ((1L, 1L, true)))
    assert(out(2) == ((2L, 1L, true)))
    assert(out(3) == ((3L, 0L, false)))
    assert(out(4) == ((4L, 2L, true)))
    intercept[IllegalArgumentException] {
      graft.functions.Dedup.substringContamination(train, Seq(""))
    }
  }

  test("decon_substring query: positive arm fires at fixture scale") {
    // a screen that never flags anything is untested in its positive
    // arm — the needle length/sample is tuned so the fixture yields
    // BOTH contaminated and clean train docs
    val out = Queries.deconSubstring(spark, sfDir)
      .select("contaminated").as[Boolean].collect()
    assert(out.exists(identity) && out.exists(!_),
      s"degenerate screen: ${out.count(identity)}/${out.length} flagged")
  }

  test("curation funnel: chained counts, monotone kept, every stage active on the fixture") {
    val rows = Queries.curationFunnel(spark, sfDir)
      .orderBy("stage")
      .select("stage", "name", "n_in", "n_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.map(_._2) ==
      Seq("lang_id", "blocklist", "length_band", "classifier", "prefix_dedup"))
    // n_in of stage k is n_kept of stage k-1; kept never exceeds in
    for (Seq(a, b) <- rows.sliding(2)) assert(b._3 == a._4)
    for (r <- rows) assert(r._4 <= r._3 && r._4 >= 0)
    // the fixture instantiation must exercise every stage's DROP arm
    // (a funnel whose tail sees zero rows tests nothing)
    for (r <- rows) assert(r._4 < r._3, s"stage ${r._2} dropped nothing")
    assert(rows.last._4 > 0, "funnel annihilated the corpus")
  }

  test("classifier PR: counts sum to N; recall and predictions monotone in threshold") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val thresholds = Seq(-0.02, -0.01, -0.005, 0.0, 0.005, 0.01, 0.02)
    val n = docs.count()
    val rows = TextAnalysis
      .classifierPrReport(docs, thresholds, minTokens = 30)
      .select("threshold", "tp", "fp", "fn", "tn", "recall")
      .collect().sortBy(_.getDouble(0))
    assert(rows.length == thresholds.size)
    for (r <- rows)
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n)
    // raising the threshold can only shrink the predicted-positive set
    val preds = rows.map(r => r.getLong(1) + r.getLong(2)).toSeq
    assert(preds == preds.sorted.reverse, s"predictions not monotone: $preds")
    val tps = rows.map(_.getLong(1)).toSeq
    assert(tps == tps.sorted.reverse, s"tp not monotone: $tps")
    // non-degenerate grid: at least one threshold splits the corpus
    assert(preds.exists(p => p > 0 && p < n), preds.toString)
  }

  test("code screen: routes code-shaped text, passes prose, and is signal-exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "def f(x): return g(x) + h(x); import os; class A: elif printf"),
      (2L, "the quiet harvest settled over the terraces before dawn"),
      (3L, "for (int i = 0; i < n; i++) { total += values[i]; }"),
      (4L, ""),
      (5L, "she said return the class books before function hall closes"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.codeScreen(d)
      .as[(Long, Long, Double, Long, Double, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    // code docs route as code; prose does not — even prose that happens
    // to reuse keyword WORDS (doc 5) stays below the gate without the
    // punctuation signal
    assert(r(1L)._6 && r(3L)._6, s"code docs not routed: ${r(1L)} ${r(3L)}")
    assert(!r(2L)._6 && !r(5L)._6, s"prose routed as code: ${r(2L)} ${r(5L)}")
    // exact signals: doc 3 symbols { } ( ) ; ; ; = = < [] not counted
    assert(r(3L)._2 == ("for (int i = 0; i < n; i++) { total += values[i]; }"
      .count("{}();=<>".contains(_))), r(3L).toString)
    assert(r(1L)._4 == 6L, s"doc 1 keyword hits: ${r(1L)}") // def return(x2-no: 1) import class elif printf
    // empty text: zero everything, not NaN
    assert(r(4L)._2 == 0L && r(4L)._5 == 0.0 && !r(4L)._6)
    // score law spot checks: doc 5 = (0 + min(3/4, 1)) / 2; doc 1 =
    // both signals saturated
    assert(r(5L)._4 == 3L && r(5L)._5 == 0.375, r(5L).toString)
    assert(r(1L)._5 == 1.0, r(1L).toString)
  }
}
