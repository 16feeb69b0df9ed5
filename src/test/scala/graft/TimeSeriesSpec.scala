package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Gap-fill semantics on a stream with a known hole. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  test("gapFillHourly synthesizes missing hours, flags them, forward-fills values") {
    // key A: hours 1, 2, 5 occupied (3-4 are a hole); key B: hour 2 only
    val e = Seq(
      ("A", ts(1), 10.0), ("A", ts(2), 5.0), ("A", ts(2), 5.0), ("A", ts(5), 7.0),
      ("B", ts(2), 1.0),
    ).toDF("k", "t", "value")
    val out = TimeSeries.gapFillHourly(e, "k", "t",
        sum(col("value").cast("decimal(18,2)")).cast("double"))
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "01", false, 10.0),
      ("A", "02", false, 10.0), // two rows in hour 2 aggregate first
      ("A", "03", true, 10.0),  // hole: flagged + carries hour-2 total
      ("A", "04", true, 10.0),
      ("A", "05", false, 7.0),
      ("B", "02", false, 1.0))) // single-bucket key: 1-row grid, no gaps
  }

  test("gapFillHourly grid is per-key bounded (no cross-key hour bleed)") {
    val e = Seq(("A", ts(1), 1.0), ("B", ts(20), 2.0)).toDF("k", "t", "value")
    val out = TimeSeries.gapFillHourly(e, "k", "t", sum(col("value")))
    assert(out.count() == 2) // neither key inherits the other's span
    assert(out.filter(col("is_gap")).count() == 0)
  }
}
