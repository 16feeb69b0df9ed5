package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev probe (round 15): A/B the knNCrossEntropy FINAL-STAGE join
  * shape at order 5, over identical shared inputs (gN, tN, derived
  * type tables — all materialized once).
  *
  * A (current): the scored stream (tN-sized) takes TWELVE attaches —
  * ctx + (cc, den, lam) per level k = 4,3,2 + bw + the btot crossJoin.
  *
  * B (merged): per level, den and lam (both keyed on the level's
  * context = lastW(k).init, a PREFIX of cc's key lastW(k)) are joined
  * onto cc FIRST — small⋈small, off the stream — and bw (keyed w5)
  * onto level 2's combine; the stream then takes FIVE attaches (ctx +
  * one combined table per level + nothing for bw) with btot attached
  * as a LITERAL observed on the t2 materialization job (bit-identical
  * value — it IS count(t2)). All merges are many-to-one inner joins
  * proven total over the scored keys (suffix/prefix membership in the
  * derived type tables), so the output rows and every lp are
  * bit-identical.
  */
object Kn2Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "kn2-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 5
    val discount = 0.75
    val ws = (1 to n).map(i => s"w$i")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    def gramStruct(k: Int): String =
      s"transform(sequence(0, size(toks) - $k), i -> struct(" +
        (0 until k).map(j => s"toks[i+$j] AS v${j + 1}").mkString(", ") + "))"
    def ck(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.materialize()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (${out.count()} rows)")
      out
    }
    val gN = ck("gN", toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(expr(gramStruct(n))).as(Seq("pos", "g")))
      .select(col("doc_id") +: col("pos") +:
        ws.zipWithIndex.map { case (w, j) => col(s"g.v${j + 1}").as(w) }: _*))
    val tN = ck("tN", gN.groupBy(ws.map(col): _*).agg(count(lit(1)).as("cn")))
    val tTypes: Map[Int, DataFrame] = {
      val m = scala.collection.mutable.Map[Int, DataFrame](
        n -> tN.select(
          ws.zipWithIndex.map { case (w, j) => col(w).as(s"v${j + 1}") }: _*))
      for (k <- (n - 1) to 2 by -1) {
        val hi = m(k + 1)
        val pref = hi.select((1 to k).map(j => col(s"v$j")): _*)
        val suf = hi.select(
          (2 to k + 1).map(j => col(s"v$j").as(s"v${j - 1}")): _*)
        val shortDocs = toks.filter(size(col("toks")) === k)
          .select((0 until k).map(j => expr(s"toks[$j]").as(s"v${j + 1}")): _*)
        m(k) = ck(s"t$k", pref.unionByName(suf).unionByName(shortDocs).distinct())
      }
      m.toMap
    }
    def d(c: Column): Column = c.cast("double")
    def lastW(k: Int): Seq[String] = ws.takeRight(k)
    def levelStats(k: Int): (DataFrame, DataFrame, DataFrame) = {
      val tk1 = tTypes(k + 1)
      val cc = tk1.groupBy((2 to k + 1).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"cc$k"))
        .toDF(lastW(k) :+ s"cc$k": _*)
      val den = tk1.groupBy((2 to k).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"den$k"))
        .toDF(lastW(k).init :+ s"den$k": _*)
      val lam = tTypes(k).groupBy((1 until k).map(j => col(s"v$j")): _*)
        .agg(count(lit(1)).as(s"lam$k"))
        .toDF(lastW(k).init :+ s"lam$k": _*)
      (cc, den, lam)
    }
    val t2 = tTypes(2)
    val bw = t2.groupBy(col("v2")).agg(count(lit(1)).as("n1bw"))
      .toDF(ws.last, "n1bw")
    val btotDf = t2.agg(count(lit(1)).as("__b"))
    val btotLit = t2.count() // stands in for the observe-metric literal

    def pExpr(withB: Column): Column = {
      var p: Column = d(col("n1bw")) / d(withB)
      for (k <- 2 until n)
        p = (d(col(s"cc$k")) - lit(discount)) / d(col(s"den$k")) +
          (lit(discount) * d(col(s"lam$k")) / d(col(s"den$k"))) * p
      (d(col("cn")) - lit(discount)) / d(col("ctx")) +
        (lit(discount) * d(col("n1fw_top")) / d(col("ctx"))) * p
    }
    val ctxDf = tN.groupBy(ws.init.map(col): _*)
      .agg(sum("cn").as("ctx"), count(lit(1)).as("n1fw_top"))

    // A: current shape — 12 attaches on the stream
    def scoredA(): DataFrame = {
      var scored: DataFrame = tN.join(ctxDf, ws.init)
      for (k <- (n - 1) to 2 by -1) {
        val (cc, den, lam) = levelStats(k)
        scored = scored.join(cc, lastW(k)).join(den, lastW(k).init)
          .join(lam, lastW(k).init)
      }
      scored = scored.join(bw, Seq(ws.last)).crossJoin(broadcast(btotDf))
      scored.select(ws.map(col) :+ round(-log(pExpr(col("__b"))), 9).as("lp"): _*)
    }
    // B: merged shape — 5 attaches on the stream, btot as a literal
    def scoredB(): DataFrame = {
      var scored: DataFrame = tN.join(ctxDf, ws.init)
      for (k <- (n - 1) to 2 by -1) {
        val (cc, den, lam) = levelStats(k)
        var combined = cc.join(den, lastW(k).init).join(lam, lastW(k).init)
        if (k == 2) combined = combined.join(bw, Seq(ws.last))
        scored = scored.join(combined, lastW(k))
      }
      scored.select(ws.map(col) :+
        round(-log(pExpr(lit(btotLit))), 9).as("lp"): _*)
    }
    def finalQ(lps: DataFrame): DataFrame = gN.join(lps, ws)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as(s"n_${n}grams"),
        round(
          aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
              s => s.getField("lp")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
          4).as(s"kn${n}_xent"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }
    for (i <- 1 to 3) time(s"A final $i")(finalQ(scoredA()).count())
    for (i <- 1 to 3) time(s"B final $i")(finalQ(scoredB()).count())
    val a = finalQ(scoredA())
    val b = finalQ(scoredB())
    println(s"A == B: ${a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty}")
    spark.stop()
  }
}
