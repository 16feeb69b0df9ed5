package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: per-stage attribution for knNCrossEntropy (order 5) —
  * times each materialization (the n-gram position stream, the n-gram
  * count table, each corpus k-gram TYPE pass) and the final scoring
  * query, then compares the CORPUS-PASS type-table build (one
  * tokenize+explode+distinct per k) against the DERIVED build
  * (t_k from t_{k+1}: distinct prefixes ∪ suffixes ∪ the k-grams of
  * exactly-k-token docs — type-bounded input, no corpus scan).
  * Round-14 motivation: text_kn5_score is the suite's most expensive
  * query (6.3 s at sf0.1) and its plan holds n−1 = 4 full corpus
  * tokenize passes where 1 suffices.
  */
object KnProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "kn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 5
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
    for (round <- 1 to 2) {
      println(s"--- round $round")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val ws = (1 to n).map(i => s"w$i")
      val gN = ck("gN", toks.filter(size(col("toks")) >= n)
        .select(col("doc_id"), posexplode(expr(gramStruct(n))).as(Seq("pos", "g")))
        .select(col("doc_id") +: col("pos") +:
          ws.zipWithIndex.map { case (w, j) => col(s"g.v${j + 1}").as(w) }: _*))
      val tN = ck("tN", gN.groupBy(ws.map(col): _*).agg(count(lit(1)).as("cn")))
      // corpus-pass type tables (current form)
      val corpusTypes = (2 until n).map { k =>
        k -> ck(s"t$k corpus", toks.filter(size(col("toks")) >= k)
          .select(explode(expr(gramStruct(k))).as("g"))
          .select((1 to k).map(j => col(s"g.v$j").as(s"v$j")): _*)
          .distinct())
      }.toMap
      // derived type tables: t_k from t_{k+1}
      var higher = tN.select(
        ws.zipWithIndex.map { case (w, j) => col(w).as(s"v${j + 1}") }: _*)
      for (k <- (n - 1) to 2 by -1) {
        val pref = higher.select((1 to k).map(j => col(s"v$j")): _*)
        val suf = higher.select((2 to k + 1).map(j => col(s"v$j").as(s"v${j - 1}")): _*)
        val shortDocs = toks.filter(size(col("toks")) === k)
          .select((0 until k).map(j => expr(s"toks[$j]").as(s"v${j + 1}")): _*)
        val derived = ck(s"t$k derived",
          pref.unionByName(suf).unionByName(shortDocs).distinct())
        val c = corpusTypes(k)
        val same = derived.count() == c.count() &&
          derived.except(c).isEmpty && c.except(derived).isEmpty
        println(s"  t$k derived == corpus: $same")
        higher = derived
      }
    }
    spark.stop()
  }
}
