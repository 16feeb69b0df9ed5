package graft.tools

/** Dev probe: does Materialize.rddIds see the checkpoint's backing RDD? */
object RddIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, appName = "rddid-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100).toDF("id")
    val ck = graft.plans.Materialize(df)
    println("logical: " + ck.queryExecution.logical.getClass.getName)
    println("ids: " + graft.plans.Materialize.rddIds(ck))
    println("persistent: " + spark.sparkContext.getPersistentRDDs.keySet)
    spark.stop()
  }
}
