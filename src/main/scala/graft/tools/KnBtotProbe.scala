package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev probe (round 15): end-to-end A/B of the ONE knNCrossEntropy
  * change this round — btot as an observed literal (NEW, the shipped
  * operator) vs the round-14 form (btot as a 1-row aggregate
  * crossJoined back, t2 materialized without metrics). Interleaved
  * runs in one JVM so host drift cannot masquerade as a delta, plus
  * an output-equality check.
  */
object KnBtotProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "kn-btot-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 5
    val discount = 0.75

    // the round-14 form, replicated verbatim (crossJoin btot)
    def knOld(): DataFrame = {
      val ws = (1 to n).map(i => s"w$i")
      val toks = docs.select(col("doc_id"),
        split(lower(col("text")), "\\s+").as("toks"))
      def gramStruct(k: Int): String =
        s"transform(sequence(0, size(toks) - $k), i -> struct(" +
          (0 until k).map(j => s"toks[i+$j] AS v${j + 1}").mkString(", ") + "))"
      val gN = toks.filter(size(col("toks")) >= n)
        .select(col("doc_id"), posexplode(expr(gramStruct(n))).as(Seq("pos", "g")))
        .select(col("doc_id") +: col("pos") +:
          ws.zipWithIndex.map { case (w, j) => col(s"g.v${j + 1}").as(w) }: _*)
        .materialize()
      val tN = gN.groupBy(ws.map(col): _*).agg(count(lit(1)).as("cn"))
        .materialize()
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
          m(k) = pref.unionByName(suf).unionByName(shortDocs)
            .distinct().materialize()
        }
        m.toMap
      }
      def d(c: Column): Column = c.cast("double")
      def lastW(k: Int): Seq[String] = ws.takeRight(k)
      var scored: DataFrame = tN
        .join(tN.groupBy(ws.init.map(col): _*)
          .agg(sum("cn").as("ctx"), count(lit(1)).as("n1fw_top")), ws.init)
      for (k <- (n - 1) to 2 by -1) {
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
        scored = scored.join(cc, lastW(k)).join(den, lastW(k).init)
          .join(lam, lastW(k).init)
      }
      val t2 = tTypes(2)
      val bw = t2.groupBy(col("v2")).agg(count(lit(1)).as("n1bw"))
        .toDF(ws.last, "n1bw")
      val btot = t2.agg(count(lit(1)).as("__b"))
      scored = scored.join(bw, Seq(ws.last)).crossJoin(broadcast(btot))
      var p: Column = d(col("n1bw")) / d(col("__b"))
      for (k <- 2 until n)
        p = (d(col(s"cc$k")) - lit(discount)) / d(col(s"den$k")) +
          (lit(discount) * d(col(s"lam$k")) / d(col(s"den$k"))) * p
      val pTop = (d(col("cn")) - lit(discount)) / d(col("ctx")) +
        (lit(discount) * d(col("n1fw_top")) / d(col("ctx"))) * p
      val lps = scored.select(ws.map(col) :+ round(-log(pTop), 9).as("lp"): _*)
      gN.join(lps, ws)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as(s"n_${n}grams"),
          round(
            aggregate(
              transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
                s => s.getField("lp")),
              lit(0.0), (acc, x) => acc + x) / count(lit(1)).cast("double"),
            4).as(s"kn${n}_xent"))
    }
    def knNew(): DataFrame =
      graft.functions.TextAnalysis.knNCrossEntropy(docs, order = n)

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }
    // warm-up both (codegen/JIT), then interleave
    knOld().count(); sweep(); knNew().count(); sweep()
    for (i <- 1 to 3) {
      time(s"OLD crossJoin-btot $i")(knOld().count()); sweep()
      time(s"NEW observed-btot $i")(knNew().count()); sweep()
    }
    val a = knOld(); val b = knNew()
    println(s"OLD == NEW: ${a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty}")
    spark.stop()
  }
}
