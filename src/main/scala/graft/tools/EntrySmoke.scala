package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: exercise the driver's entry() smoke contract. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    require(n > 0)
    spark.stop()
  }
}
