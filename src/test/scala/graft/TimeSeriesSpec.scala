package graft

import graft.operators.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("gapFillDaily: gaps become zero rows, LOCF carries day sums, " +
    "spans are per-key") {
    import spark.implicits._
    val events = Seq(
      // key a: days 1, 2, 5 (gap 3-4); two events on day 2
      ("a", ts(1, 9), 10.0), ("a", ts(2, 8), 1.5), ("a", ts(2, 20), 2.5),
      ("a", ts(5, 3), 7.0),
      // key b: single day — no gaps, one-row series
      ("b", ts(4, 12), 99.0)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.gapFillDaily(events, "k", "ts", "v")
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", "2024-03-01", 1L, Some(10.0), 10.0),
      ("a", "2024-03-02", 2L, Some(4.0), 4.0),
      ("a", "2024-03-03", 0L, None, 4.0), // LOCF over the gap
      ("a", "2024-03-04", 0L, None, 4.0),
      ("a", "2024-03-05", 1L, Some(7.0), 7.0),
      ("b", "2024-03-04", 1L, Some(99.0), 99.0)))
  }

  test("gapFillDaily: the LOCF window sorts the aggregated grid, " +
    "never raw events") {
    import spark.implicits._
    val events = (0 until 1000).map(i =>
      ("k" + i % 3, ts(1 + i % 9, i % 24), i * 0.5)).toDF("k", "ts", "v")
    val plan = TimeSeries.gapFillDaily(events, "k", "ts", "v")
      .queryExecution.optimizedPlan.toString
    // the Window must consume the (key, day) aggregate: a Window
    // directly over the raw scan would sort corpus rows
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected Window above Aggregate in:\n$plan")
  }
}
