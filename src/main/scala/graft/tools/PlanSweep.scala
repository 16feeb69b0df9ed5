package graft.tools

/** Dev probe: compile every registered query's physical plan and flag
  * cartesian/nested-loop joins (feeds the PlanQualitySpec whitelist).
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          if (p.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (p.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None).flatten
        if (flags.nonEmpty) println(s"$name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$name: ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
