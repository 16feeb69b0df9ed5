package graft.tools
import graft.plans.Materialize.MaterializeOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: stage attribution for the prefix-filtered Jaccard pair
  * machinery (Dedup.ngramJaccardPairsFrom) and an A/B of the two
  * verify orders at bench scale — (A) candidate distinct() then
  * verify (the current plan: one candidate-sized exchange +
  * partial-agg hash tables, then per-PAIR array_intersect) vs (B)
  * verify every match row map-side against broadcast shingle tables
  * and dropDuplicates on the verified output (the round-14 APSS
  * crossover). The trade differs from APSS: here verification is
  * array_intersect over ~hundreds-of-longs arrays (not a cheap
  * two-pointer dot), so B pays the duplicate-match-row factor in
  * EXPENSIVE work — this probe measures whether the factor is small
  * enough to win.
  */
object JaccProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "jacc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val threshold = 0.5
    def ck(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.materialize()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (${out.count()} rows)")
      out
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val arrs = ck("arrs", docs.select(col("doc_id"),
        graft.functions.Dedup.nativeShingles(col("text"), 3).as("shingles")))
      val ex = arrs.select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
      val dfTable = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
      val np = spark.sparkContext.defaultParallelism
      val prefix = ck("prefix", ex.join(dfTable, Seq("sh"))
        .withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <=
          col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
        .select(col("doc_id"), col("sh"), col("n_sh"))
        .repartition(np))
      val matched = prefix
        .select(col("doc_id").as("a_id"), col("sh"), col("n_sh").as("a_n"))
        .join(prefix.select(col("doc_id").as("b_id"), col("sh"),
          col("n_sh").as("b_n")), Seq("sh"))
        .filter(col("a_id") < col("b_id"))
        .filter(least(col("a_n"), col("b_n")).cast("double")
          >= lit(threshold) * greatest(col("a_n"), col("b_n")).cast("double")
            - lit(1e-9))
        .select("a_id", "b_id")
      time("match rows")(matched.count())
      time("distinct candidates")(matched.distinct().count())
      def verify(cands: DataFrame,
          side: DataFrame => DataFrame): DataFrame = cands
        .join(side(arrs.select(col("doc_id").as("a_id"),
          col("shingles").as("a_sh"))), Seq("a_id"))
        .join(side(arrs.select(col("doc_id").as("b_id"),
          col("shingles").as("b_sh"))), Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("long")
            .as("inter"),
          size(col("a_sh")).cast("long").as("a_n"),
          size(col("b_sh")).cast("long").as("b_n"))
        .withColumn("__j", col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter")).cast("double"))
        .filter(col("__j") >= threshold)
      for (i <- 1 to 3)
        time(s"A dedup-then-verify $i")(verify(matched.distinct(), identity).count())
      for (i <- 1 to 3)
        time(s"B bcast-verify-then-dedup $i")(
          verify(matched, broadcast).dropDuplicates("a_id", "b_id").count())
    }
    spark.stop()
  }
}
