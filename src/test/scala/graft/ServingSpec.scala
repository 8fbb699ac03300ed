package graft

import org.apache.spark.sql.functions._
import graft.sources.{CsvAutoLoader, Ingest, Lake, Serving}

/** Serving-path sinks and remaining orchestration surface
  * (reference routes.py:174-259, yahoo_finance.py:224-250, csv_loader.py:180-222).
  */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private def candleDf = Seq(
    ("2024-01-01 00:00:00", 10.0, Double.NaN),
    ("2024-01-02 00:00:00", Double.PositiveInfinity, 11.5)
  ).toDF("timestamp", "open", "close")
    .withColumn("timestamp", col("timestamp").cast("timestamp"))

  test("jsonRecordsView: ±inf/NaN -> null, timestamps ISO-µs-Z (routes.py:192-208)") {
    val out = rows(Serving.jsonRecordsView(candleDf).orderBy("timestamp"))
    out.head.getString(0) shouldBe "2024-01-01T00:00:00.000000Z"
    out.head.isNullAt(2) shouldBe true  // NaN -> null
    out(1).isNullAt(1) shouldBe true    // +inf -> null
  }

  test("preview caps rows at the reference's 100 (index.html:945)") {
    val big = (1 to 300).map(i => (i, s"r$i")).toDF("id", "v")
    Serving.preview(big).length shouldBe 100
    Serving.preview(big, 7).length shouldBe 7
    Serving.preview(big, 7).head should startWith("{")
  }

  test("csvDownload writes a header CSV readable back with the same rows (routes.py:238-259)") {
    val dir = java.nio.file.Files.createTempDirectory("csvdl").toString + "/out"
    Serving.csvDownload(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    back.columns.toSeq shouldBe Seq("id", "v")
    back.count() shouldBe 2
  }

  test("formatFixed renders 4-decimal display strings (index.html:960 toFixed)") {
    rows(Seq(3.14159265).toDF("x").select(Serving.formatFixed(col("x"))))
      .head.getString(0) shouldBe "3.1416"
    // no thousands separators — JS toFixed renders "1234.5679", never "1,234.5679"
    rows(Seq(1234.56789).toDF("x").select(Serving.formatFixed(col("x"))))
      .head.getString(0) shouldBe "1234.5679"
  }

  test("generateRequestId yields unique uuids (helpers.py:18-20)") {
    val ids = (1 to 100).map(_ => Serving.generateRequestId()).toSet
    ids.size shouldBe 100
    ids.head should fullyMatch regex "[0-9a-f-]{36}"
  }

  test("writePartitioned lands hive-style source/data_type partitions (scale sink)") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    val lake = Lake(spark, root)
    val df = Seq(("alphavantage", "stock", 1.0), ("yahoo_finance", "crypto", 2.0))
      .toDF("source", "data_type", "v")
    val path = lake.writePartitioned(df, "bronze", "multi")
    new java.io.File(s"$path/source=alphavantage/data_type=stock").isDirectory shouldBe true
    spark.read.parquet(path).where(col("source") === "yahoo_finance").count() shouldBe 1
  }

  test("batchFetchSymbols: per-symbol status map, failures isolated (yahoo_finance.py:224-250)") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    val lake = Lake(spark, root)
    val fetch = (url: String, _: Map[String, String]) =>
      if (url.contains("BAD")) None else Some(Fixtures.yahooChart)
    val ingest = new Ingest(spark, lake, fetch)
    val res = ingest.batchFetchSymbols(Seq("AAPL", "BAD", "MSFT"))
    res("AAPL")("status") shouldBe "success"
    res("BAD")("status") shouldBe "error"
    res("MSFT")("status") shouldBe "success"
    lake.find("bronze", "yahoo_finance", "stock").size shouldBe 2
  }

  test("loadAndStore lands detected CSV in bronze with a status envelope (csv_loader.py:180-222)") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    val lake = Lake(spark, root)
    val res = CsvAutoLoader.loadAndStore(spark, lake, "/root/repo/fixtures/AAPL_daily.csv", "stock")
    res("status") shouldBe "success"
    res("records_count") shouldBe 3L
    lake.find("bronze", "csv_import", "stock").size shouldBe 1
    CsvAutoLoader.loadAndStore(spark, lake, "/root/repo/fixtures/AAPL_daily.csv", "nope")("status") shouldBe "error"
  }
}
