package graft.sources

import org.apache.spark.sql.SparkSession

/** Ingestion orchestration (reference alphavantage.py:247-277,
  * yahoo_finance.py:192-250 — S13/S14): fetch a payload, parse it with the
  * offline-testable [[JsonPayloads]] operators, land it in bronze under the
  * filename convention, return a status envelope.
  *
  * The fetch function is injected (`(url, params) => Option[String]`) so the
  * pipeline is fully exercisable in the zero-egress environment — production
  * wires [[Http.get]]; tests wire fixture payloads. Mirrors the reference's
  * envelope states: `success` / `error` + `records_count`.
  */
final class Ingest(
    spark: SparkSession,
    lake: Lake,
    fetch: (String, Map[String, String]) => Option[String],
    batchDelayMs: Long = 0L) {

  private val avBase = "https://www.alphavantage.co/query"
  private val yahooBase = "https://query1.finance.yahoo.com/v8/finance/chart/"

  /** S14 Alpha Vantage daily-stock ingest (reference alphavantage.py:247-277). */
  def fetchAndStoreStock(symbol: String, apiKey: String = "demo",
      outputSize: String = "full"): Map[String, Any] =
    fetch(avBase, Map("function" -> "TIME_SERIES_DAILY", "symbol" -> symbol,
      "outputsize" -> outputSize, "apikey" -> apiKey)) match {
      case None => Map("status" -> "error", "message" -> s"fetch failed for $symbol")
      case Some(payload) =>
        val df = JsonPayloads.parseAlphaVantageStock(spark, Seq(payload), symbol)
        if (df.isEmpty) Map("status" -> "error", "message" -> s"no data for $symbol")
        else {
          val name = lake.generateFilename("alphavantage", s"stock_$symbol")
          val path = lake.write(df, "bronze", name)
          Map("status" -> "success", "records_count" -> df.count(), "file_path" -> path)
        }
    }

  /** S14 Yahoo chart ingest (reference yahoo_finance.py:192-221). */
  def fetchAndStoreStockYahoo(symbol: String, interval: String = "1d"): Map[String, Any] =
    fetch(yahooBase + symbol, Map("interval" -> interval)) match {
      case None => Map("status" -> "error", "message" -> s"fetch failed for $symbol")
      case Some(payload) =>
        val df = JsonPayloads.parseYahooChart(spark, Seq(payload), symbol)
        if (df.isEmpty) Map("status" -> "error", "message" -> s"no data for $symbol")
        else {
          val name = lake.generateFilename("yahoo_finance", s"stock_$symbol")
          val path = lake.write(df, "bronze", name)
          Map("status" -> "success", "records_count" -> df.count(), "file_path" -> path)
        }
    }

  /** S13 batch multi-symbol fetch (reference yahoo_finance.py:224-250):
    * sequential per-symbol fetch+store with an inter-symbol delay, per-symbol
    * status map.
    */
  def batchFetchSymbols(symbols: Seq[String]): Map[String, Map[String, Any]] =
    symbols.zipWithIndex.map { case (sym, i) =>
      if (i > 0 && batchDelayMs > 0) Thread.sleep(batchDelayMs)
      sym -> fetchAndStoreStockYahoo(sym)
    }.toMap
}
