package graft.tools

/** Dev probe: for every registered query, count how many times the
  * final physical plan scans EACH parquet table — the
  * subtree-recompute defect class (Catalyst shares no subtrees across
  * consumers, so a table feeding k consumers unmaterialized scans k
  * times; round 8's dedup_apss_cosine held 7). Flags ≥3 scans of one
  * table; 2 is often a legitimate self-join.
  */
object ScanSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = if (args.length > 1) args(1).toInt else 3
    val table = "([a-z_]+)\\.parquet".r
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val counts = p.linesIterator.filter(_.contains("FileScan parquet"))
          .flatMap(l => table.findFirstMatchIn(l).map(_.group(1))).toSeq
          .groupBy(identity).view.mapValues(_.size)
          .filter(_._2 >= threshold)
        if (counts.nonEmpty)
          println(s"$name: " + counts.toSeq.sortBy(-_._2)
            .map { case (t, n) => s"$t x$n" }.mkString(", "))
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
