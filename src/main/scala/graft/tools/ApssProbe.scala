package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis
import graft.plans.GraftFunctions

/** Dev probe: time each stage of the Bayardo APSS cosine plan
  * (mirrors the CURRENT Dedup.bagCosinePairs structure) and compare
  * the two BENCH-SCALE verify orders — (A) dedup-then-attach with
  * BROADCAST attaches (the pre-round-14 plan: candidate pairs
  * distinct() before the attach joins, which AQE broadcast at this
  * scale) vs (B) attach-then-dedup (what the operator now runs when
  * vecs is broadcastable: every match row verified map-side in one
  * zero-shuffle stage, pair dedup on the verified output). NOTE: arm
  * A is NOT the operator's corpus-scale branch — that one attaches
  * via SHUFFLE joins (verify(matched.distinct(), identity)); both
  * arms here broadcast, so the comparison isolates exactly the one
  * plan difference that changed in round 14 (the candidate-sized
  * exchange + partial-agg hash tables). Round-14 readings at sf0.1
  * (τ = 9/10): 28.4M match rows → 11.8M distinct candidates →
  * 1,777 pairs; under an idle host A ≈ 4.5 s / B ≈ 5.7 s post-
  * checkpoint, under host contention A ≈ 14–17 s / B ≈ 8–10 s —
  * B trades +2.4× cheap codegen dots for ZERO shuffle and no
  * partial-aggregate hash tables, which is what contention multiplies.
  */
object ApssProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "apss-probe")
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (tauNum, tauDen) = (9, 10)
    val p2 = (tauNum.toLong * tauNum, tauDen.toLong * tauDen)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def dbl(c: Column): Column = c.cast("double")
    // localCheckpoint is EAGER: timing the call captures the stage cost.
    def ck(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.materialize()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (${out.count()} rows)")
      out
    }
    val tf = ck("tf", docs
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    // round-15 experiment: POSITIONAL (exclusive-suffix) filter — the
    // Bayardo/PPJoin remaining-mass bound with the matched term's own
    // contribution split out: for a match on term t,
    //   dot ≤ tf_a(t)·tf_b(t) + sqrt(sufEx_a(t)·sufEx_b(t))
    // where sufEx = suf − tf² (the L2 mass STRICTLY AFTER t in the
    // global rarity order). Proof of completeness at the rarest
    // shared term t*: every other shared term sits strictly after t*
    // in BOTH docs' orders, so Cauchy–Schwarz over those terms bounds
    // their dot contribution by sqrt(sufEx_a·sufEx_b), and t* itself
    // adds tf_a·tf_b. Uniformly ≥ as tight as the inclusive bound
    // (AM–GM: suf_a·suf_b = (tf_a²+eA)(tf_b²+eB) ≥ (tf_a·tf_b +
    // sqrt(eA·eB))²), strictly tighter when the two suffix masses are
    // asymmetric — equal when tf≡1 and eA=eB.
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wAll = Window.partitionBy("doc_id")
    val wSuf = Window.partitionBy("doc_id").orderBy(col("df"), col("term"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ranked = tf.join(dfTable, Seq("term"))
      .withColumn("__t2", col("tf") * col("tf"))
      .withColumn("__nrm", sum(col("__t2")).over(wAll))
      .withColumn("__suf", sum(col("__t2")).over(wSuf))
      // round-14 experiment: L1 mass and max tf of the suffix — the
      // Bayardo/PPJoin-family dot bound dot ≤ min(L1a·mxb, L1b·mxa)
      // (every shared term sits in BOTH suffixes at the rarest shared
      // term, so Σ tfa·tfb ≤ (Σ tfa)·max tfb), a candidate-predicate
      // tightening candidate measured here before any operator change
      .withColumn("__l1s", sum(col("tf")).over(wSuf))
      .withColumn("__mx", max(col("tf")).over(wSuf))
    val np = spark.sparkContext.defaultParallelism
    val prefix = ck("prefix", ranked
      .filter(col("__suf") * lit(p2._2) >= lit(p2._1) * col("__nrm"))
      .select(col("doc_id"), col("term"), col("tf"), col("__suf"),
        col("__nrm"), col("__l1s"), col("__mx"))
      .repartition(np))
    val vecs = ck("vecs", tf.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("tf"))))
        .as("__p"), sum(col("tf") * col("tf")).as("nrm"))
      .select(col("doc_id"),
        transform(col("__p"), e => e.getField("term")).as("terms"),
        transform(col("__p"), e => e.getField("tf")).as("tfs"),
        col("nrm")))
    val pa = prefix.select(col("doc_id").as("a_id"), col("term"),
      col("tf").as("__atf"),
      col("__suf").as("__asuf"), col("__nrm").as("__anrm"),
      col("__l1s").as("__al1"), col("__mx").as("__amx"))
    val pb = prefix.select(col("doc_id").as("b_id"), col("term"),
      col("tf").as("__btf"),
      col("__suf").as("__bsuf"), col("__nrm").as("__bnrm"),
      col("__l1s").as("__bl1"), col("__mx").as("__bmx"))
    val baseCond = pa("term") === pb("term") && pa("a_id") < pb("b_id") &&
      (dbl(col("__asuf")) * dbl(col("__bsuf")) * lit(p2._2.toDouble)
        >= lit(p2._1.toDouble * (1.0 - 1e-9))
          * dbl(col("__anrm")) * dbl(col("__bnrm")))
    // dot ≤ min(L1a·mxb, L1b·mxa); candidate survives only if that
    // bound squared still clears τ²·nrm·nrm (downward slack as above)
    val l1mx = least(dbl(col("__al1")) * dbl(col("__bmx")),
      dbl(col("__bl1")) * dbl(col("__amx")))
    val tightCond = baseCond &&
      (l1mx * l1mx * lit(p2._2.toDouble)
        >= lit(p2._1.toDouble * (1.0 - 1e-9))
          * dbl(col("__anrm")) * dbl(col("__bnrm")))
    // positional bound (see comment above): the matched term's own
    // product plus the cross-Cauchy–Schwarz mass of the two EXCLUSIVE
    // suffixes must still clear τ·sqrt(nrm·nrm). Doubles + downward
    // slack — same no-false-negative discipline as the base bound.
    val posUb = dbl(col("__atf")) * dbl(col("__btf")) +
      sqrt((dbl(col("__asuf")) - dbl(col("__atf")) * dbl(col("__atf"))) *
        (dbl(col("__bsuf")) - dbl(col("__btf")) * dbl(col("__btf"))))
    val posCond = pa("term") === pb("term") && pa("a_id") < pb("b_id") &&
      (posUb * posUb * lit(p2._2.toDouble)
        >= lit(p2._1.toDouble * (1.0 - 1e-9))
          * dbl(col("__anrm")) * dbl(col("__bnrm")))
    val matched = pa.join(pb, baseCond).select("a_id", "b_id")
    val matchedTight = pa.join(pb, tightCond).select("a_id", "b_id")
    val matchedPos = pa.join(pb, posCond).select("a_id", "b_id")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("matched-raw")(matched.count())
    time("matched-tight")(matchedTight.count())
    time("matched-pos")(matchedPos.count())
    time("tight-distinct")(matchedTight.distinct().count())
    time("pos-distinct")(matchedPos.distinct().count())
    val bagDot = GraftFunctions.bagDot(spark,
      col("a_terms"), col("a_tfs"), col("b_terms"), col("b_tfs"))
    def verify(cands: DataFrame): DataFrame = cands
      .join(broadcast(vecs.select(col("doc_id").as("a_id"),
        col("terms").as("a_terms"), col("tfs").as("a_tfs"),
        col("nrm").as("a_nrm"))), Seq("a_id"))
      .join(broadcast(vecs.select(col("doc_id").as("b_id"),
        col("terms").as("b_terms"), col("tfs").as("b_tfs"),
        col("nrm").as("b_nrm"))), Seq("b_id"))
      .withColumn("dot", bagDot)
      .filter(dec(col("dot")) * dec(col("dot")) * lit(p2._2)
        >= lit(p2._1) * dec(col("a_nrm")) * dec(col("b_nrm")))
      .select(col("a_id"), col("b_id"), col("dot"), col("a_nrm"),
        col("b_nrm"), (col("dot").cast("double") /
          sqrt((col("a_nrm") * col("b_nrm")).cast("double"))).as("cosine"))
    for (i <- 1 to 3)
      time(s"A dedup-then-attach $i")(verify(matched.distinct()).count())
    for (i <- 1 to 3)
      time(s"B attach-then-dedup $i")(
        verify(matched).dropDuplicates("a_id", "b_id").count())
    for (i <- 1 to 3)
      time(s"B-tight attach-then-dedup $i")(
        verify(matchedTight).dropDuplicates("a_id", "b_id").count())
    for (i <- 1 to 3)
      time(s"B-pos attach-then-dedup $i")(
        verify(matchedPos).dropDuplicates("a_id", "b_id").count())
    // round-15 verify-stage decomposition: where do the ~4 s over the
    // 28M match rows go — the two broadcast attaches, the bagDot
    // kernel, or the DECIMAL(38,0) threshold arithmetic?
    def attach(cands: DataFrame): DataFrame = cands
      .join(broadcast(vecs.select(col("doc_id").as("a_id"),
        col("terms").as("a_terms"), col("tfs").as("a_tfs"),
        col("nrm").as("a_nrm"))), Seq("a_id"))
      .join(broadcast(vecs.select(col("doc_id").as("b_id"),
        col("terms").as("b_terms"), col("tfs").as("b_tfs"),
        col("nrm").as("b_nrm"))), Seq("b_id"))
    for (i <- 1 to 2)
      time(s"decomp attach-only $i")(attach(matched).count())
    for (i <- 1 to 2)
      time(s"decomp attach+dot $i")(
        attach(matched).withColumn("dot", bagDot)
          .filter(col("dot") >= 0L).count())
    for (i <- 1 to 2)
      time(s"decomp attach+dot+dblfilter $i")(
        attach(matched).withColumn("dot", bagDot)
          .filter(dbl(col("dot")) * dbl(col("dot")) * lit(p2._2.toDouble)
            >= lit(p2._1.toDouble) * dbl(col("a_nrm")) * dbl(col("b_nrm")))
          .count())
    // two-tier EXACT filter: double compare with a ±1e-9 relative
    // guard band (rel FP error of the 3-multiply products is ≤ ~1e-15,
    // so outside the band the double decision provably agrees with the
    // decimal one); only band rows — measure how many — pay decimal
    val dlhs = dbl(col("dot")) * dbl(col("dot")) * lit(p2._2.toDouble)
    val drhs = lit(p2._1.toDouble) * dbl(col("a_nrm")) * dbl(col("b_nrm"))
    val exactCond = dec(col("dot")) * dec(col("dot")) * lit(p2._2) >=
      lit(p2._1) * dec(col("a_nrm")) * dec(col("b_nrm"))
    val twoTier = (dlhs >= drhs * lit(1.0 + 1e-9)) ||
      (dlhs >= drhs * lit(1.0 - 1e-9) && exactCond)
    for (i <- 1 to 2)
      time(s"decomp attach+dot+twotier $i")(
        attach(matched).withColumn("dot", bagDot).filter(twoTier).count())
    // round-15 experiment: FIRST-SHARED-PREFIX-TERM (FST) dedup of the
    // match stream — keep, per (a,b), ONLY the row whose term is the
    // globally-rarest term shared by the two PREFIXES. Exactly one row
    // per candidate pair survives (the match stream has one row per
    // (a,b, shared prefix term)), so the 2.4× duplicate factor dies
    // BEFORE the dot/threshold work. Completeness: for a qualifying
    // pair the rarest shared term t* overall lies in BOTH prefixes
    // (the prefix-filter completeness proof), so the kept row IS the
    // t* row, which provably passes the fused suffix bound. The
    // per-doc prefix-term array rides in rarity order (__suf strictly
    // decreases along the rarity order — sort key for free), and
    // array_intersect preserves the FIRST array's order, so the first
    // intersect element is the pair's rarest shared prefix term.
    val prefArr = prefix.groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("__suf"), col("term"))),
        asc = false), e => e.getField("term")).as("parr"))
      .materialize()
    def fstFilter(cands: DataFrame): DataFrame = cands
      .join(broadcast(prefArr.select(col("doc_id").as("a_id"),
        col("parr").as("a_parr"))), Seq("a_id"))
      .join(broadcast(prefArr.select(col("doc_id").as("b_id"),
        col("parr").as("b_parr"))), Seq("b_id"))
      .filter(element_at(array_intersect(col("a_parr"), col("b_parr")), 1)
        === col("term"))
      .select("a_id", "b_id")
    val matchedT = pa.join(pb, baseCond)
      .select(col("a_id"), col("b_id"), pa("term"))
    for (i <- 1 to 2)
      time(s"decomp fst-filter $i")(fstFilter(matchedT).count())
    for (i <- 1 to 3)
      time(s"B-fst attach-then-dedup $i")(
        verify(fstFilter(matchedT)).dropDuplicates("a_id", "b_id").count())
    // round-15 shipped form: the prefix-term array rides the prefix
    // CHECKPOINT (window over the existing doc_id partitioning) and
    // flows through the candidate join — zero extra exchanges; this
    // arm measures that form against the broadcast-attach one above
    val prefixW = ck("prefixW", ranked
      .filter(col("__suf") * lit(p2._2) >= lit(p2._1) * col("__nrm"))
      .select(col("doc_id"), col("term"), col("__suf"), col("__nrm"))
      .withColumn("__parr",
        transform(
          sort_array(collect_list(struct(col("__suf"), col("term")))
            .over(Window.partitionBy("doc_id")), asc = false),
          e => e.getField("term")))
      .repartition(np))
    val paw = prefixW.select(col("doc_id").as("a_id"), col("term"),
      col("__suf").as("__asuf"), col("__nrm").as("__anrm"),
      col("__parr").as("__pa"))
    val pbw = prefixW.select(col("doc_id").as("b_id"), col("term"),
      col("__suf").as("__bsuf"), col("__nrm").as("__bnrm"),
      col("__parr").as("__pb"))
    val baseCondW = paw("term") === pbw("term") && paw("a_id") < pbw("b_id") &&
      (dbl(col("__asuf")) * dbl(col("__bsuf")) * lit(p2._2.toDouble)
        >= lit(p2._1.toDouble * (1.0 - 1e-9))
          * dbl(col("__anrm")) * dbl(col("__bnrm")))
    val matchedW = paw.join(pbw, baseCondW)
      .select(col("a_id"), col("b_id"), paw("term").as("__mt"),
        col("__pa"), col("__pb"))
    val fstW = matchedW
      .filter(element_at(array_intersect(col("__pa"), col("__pb")), 1)
        === col("__mt"))
      .select("a_id", "b_id")
    for (i <- 1 to 2)
      time(s"decomp fstw-filter $i")(fstW.count())
    for (i <- 1 to 3)
      time(s"B-fstw in-join $i")(
        verify(fstW).dropDuplicates("a_id", "b_id").count())
    // completeness: each tightened candidate set must verify to the
    // SAME pair set
    val pBase = verify(matched).dropDuplicates("a_id", "b_id").select("a_id", "b_id")
    val pTight = verify(matchedTight).dropDuplicates("a_id", "b_id").select("a_id", "b_id")
    val pPos = verify(matchedPos).dropDuplicates("a_id", "b_id").select("a_id", "b_id")
    println(s"tight == base pairs: ${pBase.exceptAll(pTight).isEmpty &&
      pTight.exceptAll(pBase).isEmpty}")
    println(s"pos == base pairs: ${pBase.exceptAll(pPos).isEmpty &&
      pPos.exceptAll(pBase).isEmpty}")
    val pTwo = attach(matched).withColumn("dot", bagDot).filter(twoTier)
      .dropDuplicates("a_id", "b_id").select("a_id", "b_id")
    println(s"twotier == base pairs: ${pBase.exceptAll(pTwo).isEmpty &&
      pTwo.exceptAll(pBase).isEmpty}")
    val pFst = verify(fstFilter(matchedT)).dropDuplicates("a_id", "b_id")
      .select("a_id", "b_id")
    println(s"fst == base pairs: ${pBase.exceptAll(pFst).isEmpty &&
      pFst.exceptAll(pBase).isEmpty}")
    spark.stop()
  }
}
