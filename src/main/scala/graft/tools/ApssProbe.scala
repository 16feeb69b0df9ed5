package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis

/** Dev probe: time each stage of the Bayardo APSS cosine plan to find
  * the hot stage (round-9 bisect of dedup_apss_cosine).
  */
object ApssProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (tauNum, tauDen) = (9, 10)
    val p2 = (tauNum.toLong * tauNum, tauDen.toLong * tauDen)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // localCheckpoint is EAGER: timing the call captures the stage cost.
    def ck(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (${out.count()} rows, ${out.rdd.getNumPartitions} parts)")
      out
    }
    val np = spark.sparkContext.defaultParallelism
    val tf = ck("tf", docs
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wAll = Window.partitionBy("doc_id")
    val wSuf = Window.partitionBy("doc_id").orderBy(col("df"), col("term"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ranked = tf.join(dfTable, Seq("term"))
      .withColumn("__t2", col("tf") * col("tf"))
      .withColumn("__nrm", sum(col("__t2")).over(wAll))
      .withColumn("__suf", sum(col("__t2")).over(wSuf))
    val prefix = ck("prefix", ranked
      .filter(col("__suf") * lit(p2._2) >= lit(p2._1) * col("__nrm"))
      .select(col("doc_id"), col("term")).repartition(np))
    val vecs = ck("vecs", tf.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("tf"))))
        .as("vec"), sum(col("tf") * col("tf")).as("nrm")))
    val cands = ck("cands", prefix.select(col("doc_id").as("a_id"), col("term"))
      .join(prefix.select(col("doc_id").as("b_id"), col("term")), Seq("term"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id"))
    val attached = ck("attach", cands
      .join(vecs.select(col("doc_id").as("a_id"), col("vec").as("a_vec"),
        col("nrm").as("a_nrm")), Seq("a_id"))
      .join(vecs.select(col("doc_id").as("b_id"), col("vec").as("b_vec"),
        col("nrm").as("b_nrm")), Seq("b_id")))
    val dotted = ck("dot+filter", attached
      .withColumn("dot", aggregate(
        map_values(map_zip_with(col("a_vec"), col("b_vec"),
          (_, x, y) => coalesce(x, lit(0L)) * coalesce(y, lit(0L)))),
        lit(0L), (acc, v) => acc + v))
      .filter(dec(col("dot")) * dec(col("dot")) * lit(p2._2)
        >= lit(p2._1) * dec(col("a_nrm")) * dec(col("b_nrm")))
      .select(col("a_id"), col("b_id"), col("dot"), col("a_nrm"),
        col("b_nrm"), (col("dot").cast("double") /
          sqrt((col("a_nrm") * col("b_nrm")).cast("double"))).as("cosine")))
    val fin = ck("distinct", dotted.distinct())
    println(s"pairs: ${fin.count()}")
    spark.stop()
  }
}
