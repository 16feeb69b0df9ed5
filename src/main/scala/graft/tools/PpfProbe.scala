package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextAnalysis}
import graft.plans.Materialize.MaterializeOps

/** Dev probe: per-stage wall breakdown of prepare_pretraining_full
  * (cap → exact dedup → span sweep → materialize → LM join), to
  * attribute the round-10 → round-14 ~3× drift (1.87 s → ~6.4 s warm
  * min) to a stage before touching any code.
  */
object PpfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val capped = TextAnalysis.capBySource(docs, 15).select("doc_id", "text")
      time("  cap count")(println("    " + capped.count()))
      val deduped = Dedup.exactSurvivors(capped)
      time("  cap+dedup count")(println("    " + deduped.count()))
      val cleaned = time("  +spans+materialize")(
        Dedup.removeRepeatedSpans(deduped, w = 8, minCount = 2).materialize())
      val lm = TextAnalysis.lmCrossEntropy(
        cleaned.select(col("doc_id"), col("clean_text").as("text")))
      time("  lm count")(println("    " + lm.count()))
      val floor = lm.agg(min(col("xent")).as("__floor"))
      val out = cleaned.join(lm, Seq("doc_id"))
        .crossJoin(broadcast(floor))
        .withColumn("n_tokens",
          size(split(col("clean_text"), "\\s+")).cast("long"))
        .filter(col("n_tokens") >= 10 && col("xent") <= col("__floor") + 0.3)
      time("  final count")(println("    " + out.count()))
      time("  full query fresh")(println("    " +
        graft.SparkEntry.queries("prepare_pretraining_full")(spark, sfDir).count()))
    }
    spark.stop()
  }
}
