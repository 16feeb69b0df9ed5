package graft.tools

/** Dev probe: print the bench's CPU and IO canaries once — a host
  * contention spot-check for adjudicating probe readings mid-round.
  */
object CanaryCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "canary-check")
    spark.sparkContext.setLogLevel("ERROR")
    println(f"cpu canary: ${graft.Bench.canary(spark)}%.3f s")
    println(f"io canary: ${graft.Bench.canaryIo(spark)}%.3f s")
    spark.stop()
  }
}
