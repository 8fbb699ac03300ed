package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillDaily synthesizes missing days and forward-fills the last observation") {
    val df = Seq(
      ("a", tsLit("2024-01-01 10:00:00"), 1.0),
      ("a", tsLit("2024-01-01 11:00:00"), 3.0), // same day: daily x = max = 3.0
      ("a", tsLit("2024-01-04 09:00:00"), 7.0), // 2 gap days before this
      ("b", tsLit("2024-02-10 00:00:00"), 5.0)  // single-day key: no gaps
    ).toDF("k", "ts", "v")
    val out = rows(Resample.gapFillDaily(df, "ts", Seq("k"), "v").orderBy("k", "d"))
    out.map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
      Option(r.get(2)), r.getDouble(3), r.getBoolean(4))) shouldBe Seq(
      ("a", "2024-01-01", Some(3.0), 3.0, false),
      ("a", "2024-01-02", None, 3.0, true),
      ("a", "2024-01-03", None, 3.0, true),
      ("a", "2024-01-04", Some(7.0), 7.0, false),
      ("b", "2024-02-10", Some(5.0), 5.0, false))
  }

  test("calendarDailyCandles emits empty bins with pandas empty-group aggregates") {
    val ticks = Seq(
      (tsLit("2024-01-01 09:00:00"), 1.0),
      (tsLit("2024-01-01 10:00:00"), 4.0), // day 1: open=1, high=4, low=1, close=4, vol=5
      (tsLit("2024-01-03 09:00:00"), 2.0)  // day 2 is a gap bin
    ).toDF("timestamp", "v")
      .select(col("timestamp"), col("v").as("open"), col("v").as("high"),
        col("v").as("low"), col("v").as("close"), col("v").as("volume"))
    val out = rows(Resample.calendarDailyCandles(ticks).orderBy("timestamp"))
    out.map(r => (r.getTimestamp(0).toString.take(10), Option(r.get(1)),
      r.getDouble(5), r.getBoolean(6))) shouldBe Seq(
      ("2024-01-01", Some(1.0), 5.0, false),
      ("2024-01-02", None, 0.0, true), // empty bin: OHLC null, sum-of-empty = 0
      ("2024-01-03", Some(2.0), 2.0, false))
  }

  test("interpolateDaily: interior gaps get the bracketing-line value, observed days pass through") {
    val df = Seq(
      ("a", tsLit("2024-01-01 10:00:00"), 1.0),
      ("a", tsLit("2024-01-04 09:00:00"), 7.0),  // days 2,3 interior gaps
      ("a", tsLit("2024-01-06 09:00:00"), 8.0)
    ).toDF("k", "ts", "v")
    val out = rows(Resample.interpolateDaily(df, "ts", Seq("k"), "v").orderBy("d"))
      .map(r => (r.getTimestamp(1).toString.take(10), Option(r.get(2)),
        r.getDouble(3), r.getBoolean(4)))
    out shouldBe Seq(
      ("2024-01-01", Some(1.0), 1.0, false),
      ("2024-01-02", None, 3.0, true),          // 1 + (7-1)·(1/3)
      ("2024-01-03", None, 5.0, true),          // 1 + (7-1)·(2/3)
      ("2024-01-04", Some(7.0), 7.0, false),
      ("2024-01-05", None, 7.5, true),          // 7 + (8-7)·(1/2)
      ("2024-01-06", Some(8.0), 8.0, false))
  }

  test("interpolateDaily leaves unbracketed gaps null (per-key spine bounds are observation days)") {
    // bounds are min/max OBSERVED days, so leading/trailing spine gaps cannot
    // exist by construction — but an all-null bracketing side can when a key
    // has a single observation; the single day passes through untouched
    val df = Seq(("s", tsLit("2024-03-05"), 2.5)).toDF("k", "ts", "v")
    val out = rows(Resample.interpolateDaily(df, "ts", Seq("k"), "v"))
    out.map(r => (Option(r.get(2)), r.getDouble(3))) shouldBe Seq((Some(2.5), 2.5))
  }

  test("gapFillDaily spine is per-key: keys do not extend to the global range") {
    val df = Seq(
      ("a", tsLit("2024-01-01"), 1.0), ("a", tsLit("2024-01-03"), 2.0),
      ("b", tsLit("2024-01-10"), 9.0), ("b", tsLit("2024-01-11"), 8.0)
    ).toDF("k", "ts", "v")
    val out = Resample.gapFillDaily(df, "ts", Seq("k"), "v")
    out.count() shouldBe 5 // a: 3 days, b: 2 days — not 11 global days × 2 keys
    out.filter(col("was_gap")).count() shouldBe 1
  }

  test("gapFillDaily spine stays on local midnight across a DST transition") {
    // America/New_York springs forward on 2025-03-09: a fixed-24h timestamp
    // spine would land post-transition rows at 01:00 local and silently stop
    // joining observed days (reporting them as gaps); the date spine cannot
    // drift
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    import s2.implicits._
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2025-03-08 09:00:00"), 1.0),
      ("a", java.sql.Timestamp.valueOf("2025-03-09 09:00:00"), 2.0),
      ("a", java.sql.Timestamp.valueOf("2025-03-10 09:00:00"), 3.0),
      ("a", java.sql.Timestamp.valueOf("2025-03-11 09:00:00"), 4.0)
    ).toDF("k", "ts", "v")
    val out = rows(Resample.gapFillDaily(df, "ts", Seq("k"), "v").orderBy("d"))
    out.length shouldBe 4
    // every day has its observation: nothing misjoined into a phantom gap
    out.count(_.getBoolean(4)) shouldBe 0
    out.map(r => Option(r.get(2)).map(_.asInstanceOf[Double])) shouldBe
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0))
  }
}
