package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's "real-time" surface re-expressed as Structured Streaming
  * (SURVEY.md §2.9). The reference's asynchrony is fire-and-forget background
  * ingestion (reference routes.py:40-42, 82-84) with last-writer-wins daily
  * files — here that becomes `readStream → event-time window agg → foreachBatch
  * lake sink`, with `Trigger.AvailableNow` as the deterministic batch-parity
  * twin of "fetch what's there now in the background".
  *
  * Scale: state = one candle per (window, symbol) bounded by the watermark;
  * a Kafka source swaps in for the file source with no operator change.
  */
object Streaming {

  /** File-based tick stream (Kafka-shaped: swap `format("parquet")` for
    * `format("kafka")` + payload decode via [[graft.sources.JsonPayloads]]).
    */
  def tickStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(dir)

  /** Streaming OHLCV candles: tumbling event-time window per symbol with
    * watermark-bounded state — the streaming twin of
    * [[graft.operators.Transforms.aggregate]] (reference transformers.py:99-142).
    *
    * `min_by`/`max_by` on the event timestamp give open/close their intended
    * earliest/latest-tick semantics (SURVEY.md §2.5 note 2) in both engines.
    */
  def candles(
      ticks: DataFrame,
      windowDuration: String = "1 day",
      watermark: String = "1 day",
      timeCol: String = "timestamp",
      valueCols: CandleCols = CandleCols()): DataFrame = {
    val t = col(timeCol)
    ticks.withWatermark(timeCol, watermark)
      .groupBy(window(t, windowDuration).as("w"), col(valueCols.symbol))
      .agg(
        min_by(col(valueCols.open), t).as("open"),
        max(col(valueCols.high)).as("high"),
        min(col(valueCols.low)).as("low"),
        max_by(col(valueCols.close), t).as("close"),
        sum(col(valueCols.volume)).as("volume"))
      .select(col("w.start").as(timeCol), col(valueCols.symbol),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }

  case class CandleCols(
      symbol: String = "symbol", open: String = "open", high: String = "high",
      low: String = "low", close: String = "close", volume: String = "volume")

  /** Streaming exact dedup-on-ingest: drop records whose key columns repeat
    * within the watermark delay — the streaming twin of
    * [[graft.operators.Dedup.exact]], and the dedup step a training-data
    * ingest pipeline runs before landing documents in the lake.
    *
    * State is bounded by the watermark (`dropDuplicatesWithinWatermark`): a
    * key is remembered only while a duplicate could still arrive, so state
    * size tracks the ingest rate × delay, not corpus size — the property that
    * makes this viable on an unbounded 100 TB/day feed. Key on a content hash
    * (e.g. `xxhash64(text)`), never the payload: state then stores 8-byte
    * keys.
    */
  def dedupStream(ticks: DataFrame, keyCols: Seq[String], timeCol: String,
      delay: String = "1 hour"): DataFrame =
    ticks.withWatermark(timeCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Bronze-landing sink (reference helpers.py:31-46 contract): every
    * micro-batch appends to the lake path. `AvailableNow` processes the
    * current backlog then stops — deterministic for tests, incremental in
    * production.
    */
  def toLake(
      candles: DataFrame, outDir: String, checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val w = candles.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w.trigger(Trigger.ProcessingTime("10 seconds")))
      .start()
  }

  /** Run a stream to a named in-memory sink and return the materialized result
    * — the deterministic harness used by the batch/stream parity tests and the
    * `q_stream_candles` entry.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String, mode: OutputMode = OutputMode.Complete()): DataFrame = {
    spark.catalog.dropTempView(name) // re-runnable in a shared session (bench warmup)
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
