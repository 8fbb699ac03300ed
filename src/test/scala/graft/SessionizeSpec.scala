package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("u1", "2024-01-01 10:00:00", 1.0),
    ("u1", "2024-01-01 10:30:00", 2.0), // 30m gap -> same session
    ("u1", "2024-01-01 12:00:00", 3.0), // 90m gap -> new session
    ("u1", "2024-01-01 12:59:59", 4.0), // <1h -> same session
    ("u2", "2024-01-01 10:00:00", 5.0)
  ).toDF("user_id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  test("assign numbers sessions 1-based per key on >gap boundaries") {
    val out = rows(Sessionize.assign(events, Seq("user_id"), "ts", "INTERVAL 1 HOUR")
      .orderBy("user_id", "ts").select("user_id", "session_id"))
      .map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u1", 2L), ("u2", 1L))
  }

  test("gap exactly equal to the threshold stays in the same session") {
    val df = Seq(("u", "2024-01-01 10:00:00"), ("u", "2024-01-01 11:00:00"))
      .toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    rows(Sessionize.assign(df, Seq("user_id"), "ts", "INTERVAL 1 HOUR")
      .select("session_id")).map(_.getLong(0)).distinct shouldBe Seq(1L)
  }

  test("sessions summarizes start/end/count/value per session") {
    val out = rows(Sessionize.sessions(events, Seq("user_id"), "ts", "INTERVAL 1 HOUR",
      valueCol = Some("v")).orderBy("user_id", "session_id"))
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getDouble(5))) shouldBe Seq(
      ("u1", 1L, 2L, 3.0), ("u1", 2L, 2L, 7.0), ("u2", 1L, 1L, 5.0))
    out.head.getTimestamp(2) shouldBe tsLit("2024-01-01 10:00:00")
    out.head.getTimestamp(3) shouldBe tsLit("2024-01-01 10:30:00")
  }
}
