package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe (round 15): compare the two duplicate-match-factor guard
  * statistics for the shingle verify-order crossover, per fixture —
  *
  *  - Σ c_pref(sh)²  over the prefix table (the shipped guard: exact
  *    for the prefix×prefix match stream, needs its own driver action
  *    because a two-level aggregate cannot ride `observe`), and
  *  - Σ df(sh) over prefix ROWS (= Σ c_pref(sh)·c_full(sh) — EXACT
  *    for containment's prefix×full-index stream, an upper bound on
  *    Σ c_pref² for the prefix×prefix paths, and row-decomposable, so
  *    it rides the prefix checkpoint as an observe metric: zero extra
  *    jobs).
  *
  * The decision threshold is ≤ 8× prefix rows; this probe prints both
  * ratios for every corpus the shingle family actually runs on, so
  * the swap's arm-flip risk is measured, not guessed.
  */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "guard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def stats(name: String, arrs: DataFrame, threshold: Double): Unit = {
      val ex = arrs.select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
      val dfT = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
      val prefix = ex.join(dfT, Seq("sh"))
        .withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <=
          col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
        .select(col("sh"), col("df"))
      val r = prefix.groupBy("sh")
        .agg(count(lit(1)).as("c"), first(col("df")).as("df"))
        .agg(sum(col("c") * col("c")).as("sumc2"),
          sum(col("c")).as("p"),
          sum(col("c") * col("df")).as("sumdf"))
        .first()
      val (c2, p, sdf) = (r.getLong(0), r.getLong(1), r.getLong(2))
      println(f"$name: p=$p sumC2=$c2 (${c2.toDouble / p}%.2f x) " +
        f"sumDf=$sdf (${sdf.toDouble / p}%.2f x) " +
        s"decision c2<=8p: ${c2 <= 8 * p}, df<=8p: ${sdf <= 8 * p}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def sh(d: DataFrame, w: Int): DataFrame =
      d.select(col("doc_id"),
        call_function("graft_shingles", col("text"), lit(w)).as("shingles"))
    stats("documents w3 t0.5 (jaccard/minhash_est)", sh(docs, 3), 0.5)
    stats("documents w3 t0.8 (containment)", sh(docs, 3), 0.8)
    // curate_corpus: ngramJaccardPairs over the exact-surviving docs
    val survivors = graft.functions.Dedup.exactSurvivors(docs)
    stats("exact-survivors w3 t0.5 (curate_corpus)", sh(survivors, 3), 0.5)
    // incremental near-dup: delta = doc_id >= 250, history = < 250
    val delta = docs.filter(col("doc_id") >= 250)
    val hist = docs.filter(col("doc_id") < 250)
    stats("delta+history w3 t0.5 (incremental)",
      sh(delta, 3).unionByName(sh(hist, 3)), 0.5)
    // seq_trajectory_sim: table-symbol trajectories over the change
    // log (degenerate ~5-symbol alphabet — the guard's raison d'être);
    // exactly the query's trajectory construction, threshold 0.4
    val traj = graft.sources.Readers.validChangeLog(spark, dir)
      .groupBy(col("rsbsa_no"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("log_id"), col("table")))).as("__ev"))
      .select(col("rsbsa_no").as("doc_id"),
        concat_ws(" ", expr("transform(__ev, e -> e.table)")).as("text"))
    stats("trajectories w3 t0.4 (seq_trajectory_sim)", sh(traj, 3), 0.4)
    spark.stop()
  }
}
