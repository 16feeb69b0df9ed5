package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key time grid and forward-fill the gaps — the standard
  * feature-pipeline step between raw logs and anything windowed
  * (a model that reads "activity per key per hour" needs the quiet
  * hours to EXIST, carrying the last observation, not to be absent).
  *
  * The reference has no regular-grid operator (its logs are queried
  * ad hoc, `services/logService.js`), but its hourly-activity shape is
  * the batch face of the same semantics as the streaming windows
  * (`graft.streaming.Streams`) — this operator closes the gap between
  * the two.
  */
object TimeSeries {

  /** Hourly grid per `key` over `[min(bucket), max(bucket)]` of that
    * key, `valueAgg` aggregated per occupied bucket, empty buckets
    * marked `is_gap` and forward-filled from the most recent occupied
    * bucket. First grid row per key is never a gap (the grid starts at
    * an occupied bucket), so `v_filled` is total.
    *
    * Scale shape: the raw stream collapses FIRST (map-side-combined
    * groupBy to |keys|×|hours| rows — the only pass over the events);
    * grid synthesis explodes a bounded `sequence` per key; the
    * grid⋈hourly join and the forward-fill window both shuffle only
    * grid-sized data by key. Keys are time-bucket-bounded, so no
    * per-key partition exceeds |hours| rows — skew-free by
    * construction.
    */
  def gapFillHourly(
      events: DataFrame, key: String, ts: String, valueAgg: Column): DataFrame = {
    val hourly = events
      .groupBy(col(key), date_trunc("hour", col(ts)).as("bucket"))
      .agg(valueAgg.as("v"))
    val grid = hourly.groupBy(col(key))
      .agg(min(col("bucket")).as("__h0"), max(col("bucket")).as("__h1"))
      .select(col(key),
        explode(sequence(col("__h0"), col("__h1"), expr("INTERVAL 1 HOUR")))
          .as("bucket"))
    grid.join(hourly, Seq(key, "bucket"), "left")
      .withColumn("is_gap", col("v").isNull)
      .withColumn("v_filled",
        last(col("v"), ignoreNulls = true).over(
          Window.partitionBy(key).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("v")
  }
}
