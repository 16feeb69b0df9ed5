package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: times the stages of the MinHash pipeline at a given SF
  * (diagnosing where wall-clock goes). Not part of the library surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val ex = graft.functions.Dedup.explodedShingles(docs, 3)
    time("exploded count (cold)")(println(ex.count()))
    time("exploded count (warm)")(println(ex.count()))

    val P = 2147483647L
    val exm = ex.withColumn("hm", pmod(col("sh"), lit(P)))
    for (k <- Seq(8, 32, 128)) {
      val aggs = (0 until k).map(i =>
        min(pmod(lit(1000003L + i) * col("hm") + lit(7919L * i + 13), lit(P)))
          .as(s"m$i"))
      time(s"$k min-aggs")(
        exm.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count())
    }
    time("full dup pipeline") {
      println("dups=" +
        graft.functions.Dedup.minHashDuplicates(docs, 3, 128, 32, 0.5).count())
    }
    spark.stop()
  }
}
private object DevSession {
  /** One shared builder for the dev tools so their config can't drift
    * from Verify/Bench (same nanosAsLong/UTC/UI settings).
    */
  def local(cores: Int): org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
}

/** Dev dump: write one named query's result to parquet for a local
  * DuckDB-oracle comparison (the per-round driver runs all of Verify;
  * this is the per-query dev loop).
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_dump"
    val spark = DevSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"dumped $outDir/$name")
    spark.stop()
  }
}

/** Repeat-run a single query for timing variance. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = DevSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}

/** Dev explain: print one named query's formatted physical plan (the
  * plan-iteration loop the scale review runs on every operator).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = DevSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
