package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill resamples, carries the in-bucket latest, forward-fills gaps") {
    val events = Seq(
      // key a: two obs in hour 00 (latest wins), gap 01-02, obs in 03
      ("a", ts("2024-01-01 00:10:00"), 1.0, 1L),
      ("a", ts("2024-01-01 00:50:00"), 2.0, 2L),
      ("a", ts("2024-01-01 03:20:00"), 3.0, 3L),
      // key b: a single observation → single-row grid
      ("b", ts("2024-01-01 05:00:00"), 9.0, 4L)
    ).toDF("k", "t", "v", "id")
    val out = TimeSeries.gapFill(events, "k", "t", "v", "id", "hour")
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 2.0, false),
      ("a", "2024-01-01 01:00:00.0", 2.0, true),
      ("a", "2024-01-01 02:00:00.0", 2.0, true),
      ("a", "2024-01-01 03:00:00.0", 3.0, false),
      ("b", "2024-01-01 05:00:00.0", 9.0, false)))
  }

  test("rateAnomalies flags a planted spike, nulls short history, ignores steady state") {
    val base = ts("2024-01-01 00:00:00").toInstant
    val events = (for {
      hour <- 0 until 30
      n = if (hour == 20) 100 else 10
      i <- 0 until n
    } yield ("a", java.sql.Timestamp.from(
      base.plusSeconds(hour * 3600L + i)))).toDF("k", "t")
    val out = graft.operators.TimeSeries
      .rateAnomalies(events, "k", "t", "hour", lookback = 24, minHistory = 8)
      .orderBy("bucket").collect()
    assert(out.length == 30)
    out.zipWithIndex.foreach { case (r, i) =>
      val flag = if (r.isNullAt(3)) None else Some(r.getBoolean(3))
      if (i < 8) assert(flag.isEmpty, s"hour $i: short history must be NULL")
      else if (i == 20) assert(flag.contains(true), s"hour $i: spike must flag")
      else assert(flag.contains(false), s"hour $i: steady state must not flag")
    }
  }

  test("in-bucket tie on ts breaks by the tie column") {
    val events = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0, 1L),
      ("a", ts("2024-01-01 00:00:00"), 2.0, 2L)
    ).toDF("k", "t", "v", "id")
    val out = TimeSeries.gapFill(events, "k", "t", "v", "id", "hour").collect()
    assert(out.length == 1 && out(0).getDouble(2) == 2.0)
  }
}
