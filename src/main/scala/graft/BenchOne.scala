package graft
/** Dev probe: time named queries in sequence in one JVM (Bench's
  * isolation sweep between queries) — for bisecting suite-order
  * effects that do not reproduce standalone.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, appName = "graft-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 3) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
