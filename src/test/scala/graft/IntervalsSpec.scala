package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def iv(pairs: (String, String)*) = pairs.toSeq
    .toDF("s", "e")
    .select(col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))

  test("concurrency: inclusive bounds, single-instant intervals, hand example") {
    val df = iv(
      ("2024-01-01 00:00:01", "2024-01-01 00:00:05"),
      ("2024-01-01 00:00:03", "2024-01-01 00:00:07"),
      ("2024-01-01 00:00:06", "2024-01-01 00:00:06"))
    val out = rows(Intervals.concurrency(df, "s", "e").orderBy("t"))
      .map(r => (r.getTimestamp(0).toString.substring(17, 19), r.getLong(1)))
    // t=01: [1,5] open; t=03: both; t=05: [1,5] still open (inclusive end);
    // t=06: [3,7] + the instant interval; t=07: [3,7] only
    out shouldBe Seq(("01", 1L), ("03", 2L), ("05", 2L), ("06", 2L), ("07", 1L))
  }

  test("concurrency: two-level prefix sum is bit-equal to one global window at any bucket") {
    val rnd = new scala.util.Random(7)
    val base = 1700000000L
    val df = (1 to 500).map { _ =>
      val s = base + rnd.nextInt(100000)
      (s, s + rnd.nextInt(5000))
    }.toDF("su", "eu")
      .select(timestamp_seconds(col("su")).as("s"), timestamp_seconds(col("eu")).as("e"))
    // tiny bucket (1 s) forces thousands of carry groups; huge bucket forces one
    for (bucket <- Seq(1000000L, 3600000000L * 1000)) {
      val twoLevel = rows(Intervals.concurrency(df, "s", "e", bucket).orderBy("t"))
        .map(r => (r.getTimestamp(0), r.getLong(1)))
      val naive = {
        val b = df.select(col("s").as("t"), lit(1L).as("d"), lit(0L).as("et"))
          .unionAll(df.select(col("e").as("t"), lit(-1L).as("d"), lit(1L).as("et")))
          .groupBy("t").agg(sum("d").as("d"), sum("et").as("et"))
        rows(b.withColumn("active",
            sum(col("d")).over(Window.orderBy(col("t"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)) + col("et"))
          .select("t", "active").orderBy("t"))
          .map(r => (r.getTimestamp(0), r.getLong(1)))
      }
      twoLevel shouldBe naive
    }
  }

  test("concurrency never drops below 1 at a boundary and peaks where expected") {
    val df = iv(
      ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      ("2024-01-01 00:30:00", "2024-01-01 01:30:00"),
      ("2024-01-01 00:45:00", "2024-01-01 00:50:00"))
    val out = rows(Intervals.concurrency(df, "s", "e").orderBy("t")).map(_.getLong(1))
    assert(out.forall(_ >= 1L))
    out.max shouldBe 3L
  }
}
