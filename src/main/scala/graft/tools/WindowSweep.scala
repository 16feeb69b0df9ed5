package graft.tools

/** Dev probe: flag every registered query whose OPTIMIZED logical plan
  * contains an unpartitioned Window (the single-task global-sort trap)
  * — feeds the PlanQualitySpec unpartitioned-window whitelist. Prints
  * the window expressions so bounded-by-construction cases (per-bucket
  * subtotal rows, limit(k) survivors) can be audited by eye.
  */
object WindowSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val wins = fn(spark, dir).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ").take(120)
        }
        if (wins.nonEmpty) println(s"$name: ${wins.mkString(" | ")}")
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
