package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump formatted plans for flagship queries and grep-able
  * plan-quality markers (pushdown, broadcast, codegen spans).
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s4_keyed_extract", "s6_two_hop", "q1_pricing_summary",
        "join_revenue_by_nation", "refresh_merge", "upsert_merge",
        "w3_top100", "sim_cosine_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"==================== $n")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(plan)
    }
    spark.stop()
  }
}
