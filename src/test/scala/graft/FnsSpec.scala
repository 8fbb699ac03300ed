package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("coerceDouble: numeric strings parse, garbage -> null, independent of ANSI mode") {
    val out = Seq("1.5", "2", "abc", "", "1e3").toDF("x")
      .select(Fns.coerceDouble(col("x")).as("d"))
    rows(out).map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))) shouldBe
      Seq(Some(1.5), Some(2.0), None, None, Some(1000.0))
  }

  test("coerceLong parses decimal strings like pandas to_numeric (82488700.0 -> 82488700)") {
    val out = Seq("82488700.0", "7", "x").toDF("x").select(Fns.coerceLong(col("x")).as("l"))
    rows(out).map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))) shouldBe
      Seq(Some(82488700L), Some(7L), None)
  }

  test("bucketLabel week handles Sunday timestamps (labels same day)") {
    val out = Seq("2024-03-03 15:30:00").toDF("t")
      .select(Fns.bucketLabel("W")(col("t").cast(TimestampType)).as("b"))
    rows(out).head.getTimestamp(0) shouldBe tsLit("2024-03-03")
  }

  test("bucketLabel quarter-end across all four quarters") {
    val out = Seq("2024-01-15", "2024-05-01", "2024-08-31", "2024-10-01").toDF("t")
      .select(Fns.bucketLabel("Q")(col("t").cast(TimestampType)).as("b"))
    rows(out).map(_.getTimestamp(0)) shouldBe Seq(
      tsLit("2024-03-31"), tsLit("2024-06-30"), tsLit("2024-09-30"), tsLit("2024-12-31"))
  }

  test("bucketLabel month-end on leap February") {
    val out = Seq("2024-02-01", "2023-02-15").toDF("t")
      .select(Fns.bucketLabel("M")(col("t").cast(TimestampType)).as("b"))
    rows(out).map(_.getTimestamp(0)) shouldBe Seq(tsLit("2024-02-29"), tsLit("2023-02-28"))
  }

  test("bucketLabel rejects unknown frequency") {
    an[IllegalArgumentException] should be thrownBy Fns.bucketLabel("X")(col("t"))
  }

  test("nullNormalize maps NaN and ±inf to null, keeps values (routes.py:194)") {
    val out = Seq(1.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x").select(Fns.nullNormalize(col("x")).as("n"))
    rows(out).map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))) shouldBe
      Seq(Some(1.0), None, None, None)
  }

  test("nullNormalizeAll only touches floating-point columns") {
    val df = Seq((Double.NaN, 5L, "s")).toDF("d", "l", "s")
    val out = rows(Fns.nullNormalizeAll(df)).head
    out.isNullAt(0) shouldBe true
    out.getLong(1) shouldBe 5L
    out.getString(2) shouldBe "s"
  }

  test("isoMicros renders µs-precision Z-suffixed ISO strings (routes.py:205)") {
    val out = Seq("2024-01-02 03:04:05.123456").toDF("t")
      .select(Fns.isoMicros(col("t").cast(TimestampType)).as("s"))
    rows(out).head.getString(0) shouldBe "2024-01-02T03:04:05.123456Z"
  }

  test("exactSum equals plain sum on clean doubles but is order-independent") {
    val df = Seq(0.1, 0.2, 0.3).toDF("x")
    val exact = rows(df.agg(Fns.exactSum(col("x")))).head.getDouble(0)
    exact shouldBe 0.6 // decimal path: no 0.6000000000000001 artifacts
  }

  test("midRate and baseSymbol") {
    rows(Seq((2.0, 4.0)).toDF("o", "c").select(Fns.midRate(col("o"), col("c"))))
      .head.getDouble(0) shouldBe 3.0
    rows(Seq("BTC-USD").toDF("s").select(Fns.baseSymbol(col("s"))))
      .head.getString(0) shouldBe "BTC"
  }
}
