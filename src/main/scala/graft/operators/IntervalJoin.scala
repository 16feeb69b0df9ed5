package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap joins via time-bucket binning. Spark's native plan
  * for an overlap predicate with no equi-key is a broadcast
  * nested-loop — O(n·m) comparisons, a scale-killer past broadcast
  * size. Binning turns it into an equi-join: every interval registers
  * in each fixed-width bucket it covers, candidates meet only inside a
  * bucket, the exact predicate verifies, and a distinct collapses
  * multi-bucket matches. Cost O(n·k) bin rows + bucket-local
  * candidates, k = avg buckets per interval — pick the bucket width
  * near the typical interval length (the same candidate-generation +
  * verification discipline as the dedup family).
  */
object IntervalJoin {

  /** Per-interval concurrency: for each interval row, the number of
    * OTHER intervals overlapping it under half-open `[start, end)`
    * semantics. `idCols` must uniquely identify an interval row; the
    * result carries `idCols` plus `n_concurrent` (0 for loners).
    */
  def overlapCount(
      intervals: DataFrame, idCols: Seq[String],
      start: String, end: String): DataFrame = {
    val base = intervals.select(
      struct(idCols.map(col): _*).as("__id"),
      col(start).as("__s"), col(end).as("__e"))
    val binned = base.select(col("__id"), col("__s"), col("__e"),
      explode(sequence(date_trunc("hour", col("__s")), col("__e"),
        expr("INTERVAL 1 HOUR"))).as("__bk"))
    val a = binned.toDF("a_id", "a_s", "a_e", "__bk")
    val b = binned.toDF("b_id", "b_s", "b_e", "__bk")
    val pairs = a.join(b, Seq("__bk"))
      .filter(col("a_id") =!= col("b_id"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").distinct()
    base.select(col("__id").as("a_id"))
      .join(pairs.groupBy("a_id").agg(count(lit(1)).as("n_concurrent")),
        Seq("a_id"), "left")
      .select(col("a_id.*") +: Seq(
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent")): _*)
  }
}
