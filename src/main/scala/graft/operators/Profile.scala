package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column row/null/distinct counts, the
  * first thing a pipeline asserts about an unfamiliar extract before
  * trusting it downstream (reference analogue: the ad-hoc sanity
  * queries around `services/etlService.js` extracts).
  */
object Profile {

  /** Profile `cols` of `df` in ONE scan: a single aggregate computes
    * every column's counts side by side, then an inline explode
    * unpivots the 1-row result into one row per column — the table is
    * never read twice, and nothing but the 1-row aggregate ever
    * shuffles.
    *
    * Scale note: exact `countDistinct` over c columns makes Spark
    * expand the scan c+1 ways before the aggregate. Fine for a
    * profiler run on purpose; for a routine 100-TB health check swap
    * in `approx_count_distinct`, which keeps the pass single-expand
    * (the sketch-contract row `a1_approx_distinct` documents the
    * error bound that buys).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        // sum over zero rows is null — an empty extract must profile
        // as zeros, not nulls
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }
}
