package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Dev probe: per-JOB wall-time breakdown of named queries (the
  * [[BenchOne]] sibling for adjudicating WHERE a multi-action query
  * spends its time — each `materialize()` / count in an operator is
  * its own Spark job, so the job list IS the stage-boundary
  * breakdown without instrumenting the operator). Prints every job of
  * the BEST of 3 runs with its duration and the first user-code frame
  * of its call site.
  */
object BenchJobs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, appName = "graft-bench-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, site) =>
          jobs.synchronized {
            jobs += ((j.jobId, (System.nanoTime() - t0) / 1e9, site)); ()
          }
        }
      }
    })
    for (name <- args) {
      var best: (Double, Seq[(Int, Double, String)]) = (Double.MaxValue, Nil)
      for (i <- 1 to 3) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val total = (System.nanoTime() - t0) / 1e9
        // listener events are async (listenerBus is private[spark]) —
        // a short settle keeps the final job's end event in the snap
        Thread.sleep(200)
        val snap = jobs.synchronized(jobs.toSeq)
        println(f"$name run $i: $total%.2f s (${snap.size} jobs)")
        if (total < best._1) best = (total, snap)
      }
      println(f"$name best run job breakdown (${best._1}%.2f s total):")
      for ((id, sec, site) <- best._2.sortBy(_._1))
        println(f"  job $id%3d  $sec%7.3f s  $site")
    }
    spark.stop()
  }
}
