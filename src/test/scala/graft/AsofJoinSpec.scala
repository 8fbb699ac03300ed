package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", "2024-01-01 10:00:00", 1L, 100.0),
    ("A", "2024-01-01 10:05:00", 2L, 101.0),
    ("A", "2024-01-01 09:00:00", 3L, 99.0), // before any quote
    ("B", "2024-01-01 10:00:00", 4L, 50.0)
  ).toDF("sym", "ts", "trade_id", "px")
    .withColumn("ts", to_timestamp(col("ts")))

  private def quotes = Seq(
    ("A", "2024-01-01 09:30:00", 10.0),
    ("A", "2024-01-01 10:00:00", 11.0), // simultaneous with trade 1 — must match (<=)
    ("A", "2024-01-01 10:04:00", 12.0),
    ("B", "2024-01-01 08:00:00", 20.0)
  ).toDF("sym", "ts", "quote")
    .withColumn("ts", to_timestamp(col("ts")))

  test("asof attaches most recent right row at or before left time, per key") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", "ts", Seq("quote"))
      .orderBy("trade_id")
    val got = rows(out).map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Double]("quote"))))
    got shouldBe Seq(
      (1L, Some(11.0)), // simultaneous quote wins (<= semantics)
      (2L, Some(12.0)),
      (3L, None),       // no quote yet
      (4L, Some(20.0)))
  }

  test("asof tolerance nulls out stale matches") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", "ts", Seq("quote"),
      tolerance = Some("INTERVAL 30 MINUTES")).orderBy("trade_id")
    val got = rows(out).map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Double]("quote"))))
    got shouldBe Seq(
      (1L, Some(11.0)),
      (2L, Some(12.0)),
      (3L, None),
      (4L, None)) // B's only quote is 2h stale
  }

  test("asof keeps one output row per left row and carries null payload values faithfully") {
    val qWithNull = Seq(("A", "2024-01-01 09:59:00", Option.empty[Double]))
      .toDF("sym", "ts", "quote").withColumn("ts", to_timestamp(col("ts")))
    val out = AsofJoin.asof(
      trades.filter(col("trade_id") === 1L), qWithNull, Seq("sym"), "ts", "ts", Seq("quote"))
    out.count() shouldBe 1L
    // the matched row's quote IS null — it must not fall through to an older row
    rows(out).head.isNullAt(rows(out).head.fieldIndex("quote")) shouldBe true
  }

  test("asof forward attaches the earliest right row at or after left time; " +
       "simultaneous still matches; nothing later -> null") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", "ts", Seq("quote"),
      direction = "forward").orderBy("trade_id")
    val got = rows(out).map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Double]("quote"))))
    got shouldBe Seq(
      (1L, Some(11.0)), // simultaneous quote matches in both directions
      (2L, None),       // no quote after 10:05 for A
      (3L, Some(10.0)), // next quote at 09:30
      (4L, None))       // B's only quote is earlier
  }

  test("asof forward tolerance nulls matches beyond leftTime + tolerance") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", "ts", Seq("quote"),
      tolerance = Some("INTERVAL 10 MINUTES"), direction = "forward")
      .orderBy("trade_id")
    val got = rows(out).map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Double]("quote"))))
    // trade 3's next quote is 30 min away -> nulled under a 10-min bound
    got shouldBe Seq((1L, Some(11.0)), (2L, None), (3L, None), (4L, None))
  }
}
