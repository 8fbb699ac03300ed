package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's declared-but-unimplemented query surface
  * (reference schema.py:73-76: `timeseries`, `correlation`, `moving_average`)
  * implemented as first-class operators, plus the relational extensions the
  * reference's normalize step gestures at but never performs (union, join
  * enrichment) — SURVEY.md §2.6 / §2.10.
  */
object Queries {

  /** `timeseries` query: time-range + membership predicate + ordered projection.
    *
    * Scale: the range predicate and `isin` both push down to the parquet scan
    * (`PushedFilters` in explain); the sort is the only wide stage and is a
    * range-partitioned sort, so it scales linearly with selected rows.
    */
  def timeseries(
      df: DataFrame,
      timeCol: String,
      start: String,
      end: String,
      keyCol: Option[String] = None,
      keys: Seq[String] = Seq.empty,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val ranged = df.filter(col(timeCol).between(lit(start).cast(TimestampType), lit(end).cast(TimestampType)))
    val keyed = keyCol match {
      case Some(k) if keys.nonEmpty => ranged.filter(col(k).isin(keys.map(lit(_)): _*))
      case _ => ranged
    }
    keyed.orderBy((timeCol +: tieBreak).map(col): _*)
  }

  /** Simple (arithmetic) period returns: `(x - prev) / prev` per key in time
    * order — the standard financial pct-change series. One `lag` under the
    * same key-shuffle every other per-symbol window shares; null for the
    * first row of each key (no prior observation). All-IEEE arithmetic
    * (one subtract, one divide) — deterministic and oracle-identical.
    */
  def returns(df: DataFrame, valueCol: String, partitionCols: Seq[String],
      orderCols: Seq[String], outCol: String = "ret"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn(outCol, (col(valueCol) - prev) / prev)
  }

  /** Running peak and drawdown — `peak = max so far`, `dd = (x - peak)/peak`
    * (≤ 0; the classic underwater curve). The running max is a bounded-state
    * ordered frame on the same key shuffle as [[returns]].
    */
  def drawdown(df: DataFrame, valueCol: String, partitionCols: Seq[String],
      orderCols: Seq[String], outCol: String = "drawdown"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col(valueCol)).over(w)
    df.withColumn("peak", peak)
      .withColumn(outCol, (col(valueCol) - col("peak")) / col("peak"))
  }

  /** Volume-weighted average price per (bucket, keys):
    * `sum(price·volume) / sum(volume)` with fixed-point-decimal sums so the
    * ratio is summation-order-independent — one partial-aggregable groupBy.
    */
  def vwap(df: DataFrame, priceCol: String, volCol: String,
      bucket: Column, keyCols: Seq[String] = Seq.empty): DataFrame =
    df.groupBy(bucket.as("bucket") +: keyCols.map(col): _*)
      .agg((sum((col(priceCol) * col(volCol)).cast(DecimalType(30, 6))).cast(DoubleType)
        / sum(col(volCol).cast(DecimalType(30, 6))).cast(DoubleType)).as("vwap"))

  /** `moving_average` query: trailing n-row mean per partition key.
    *
    * Exact-arithmetic variant: the windowed sum runs in fixed-point decimal so
    * the result is order-independent and bit-identical across engines (Spark vs
    * the DuckDB oracle); the final divide happens in double.
    *
    * Scale: one shuffle on the partition key; frames are bounded (ROWS BETWEEN
    * n-1 PRECEDING) so state per key is O(n), no skew risk beyond key skew.
    */
  def movingAverage(
      df: DataFrame,
      valueCol: String,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      n: Int,
      outCol: String = "mov_avg"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn(outCol,
      sum(col(valueCol).cast(DecimalType(30, 6))).over(w).cast(DoubleType)
        / count(col(valueCol)).over(w).cast(DoubleType))
  }

  /** `correlation` query: align two series on a shared time key, Pearson r.
    *
    * Implemented from exact decimal power sums (Σx, Σy, Σxy, Σx², Σy²) rather
    * than `corr()`: streaming co-moment formulas are summation-order-dependent,
    * so Spark and an external oracle disagree in the last ulps; fixed-point
    * sums make every term exact and the final double arithmetic identical.
    *
    * Input: a frame already pivoted to (key, x, y) rows — see
    * [[alignPair]] for building it from tall (time, series, value) data.
    * Scale: single partial-aggregable aggregation; shuffles 5 numbers per
    * partition — constant-size shuffle regardless of input size.
    */
  def pearson(df: DataFrame, xCol: String, yCol: String, outCol: String = "r"): DataFrame = {
    // Power sums: each per-row product multiplies in DOUBLE (single rounding,
    // deterministic, engine-independent) and the product is quantized to
    // DECIMAL(30,6) so the SUM is exact and order-independent. Decimal×decimal
    // is avoided on purpose: DuckDB computes DECIMAL(18)×DECIMAL(18) in int64
    // and overflows on real magnitudes.
    val dec = DecimalType(30, 6)
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val pairs = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val agg = pairs.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(x.cast(dec)).cast(DoubleType).as("sx"),
      sum(y.cast(dec)).cast(DoubleType).as("sy"),
      sum((x * y).cast(dec)).cast(DoubleType).as("sxy"),
      sum((x * x).cast(dec)).cast(DoubleType).as("sxx"),
      sum((y * y).cast(dec)).cast(DoubleType).as("syy"))
    agg.select(
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy")))).as(outCol))
  }

  /** Rolling Pearson correlation over an ordered (key, x, y) frame: the same
    * exact-decimal power sums as [[pearson]], computed over a bounded ROWS
    * window, so every rolling r is bit-identical to the oracle. Rows whose
    * window is not yet full are dropped (degenerate variance ⇒ NaN noise).
    *
    * Scale: bounded frame (O(n) state per partition); with `partitionCols`
    * empty this is a single ordered partition — correct for one global pair
    * of series, use partition keys for per-entity rolling correlation.
    */
  def rollingPearson(
      df: DataFrame, orderCol: String, xCol: String, yCol: String, n: Int,
      partitionCols: Seq[String] = Seq.empty, outCol: String = "r"): DataFrame = {
    val dec = DecimalType(30, 6)
    val base = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(-(n - 1), Window.currentRow)
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    def es(c: Column) = sum(c.cast(dec)).over(w).cast(DoubleType)
    df.withColumn("__rn", row_number().over(base))
      .withColumn("__n", count(lit(1)).over(w).cast(DoubleType))
      .withColumn("__sx", es(x)).withColumn("__sy", es(y))
      .withColumn("__sxy", es(x * y)).withColumn("__sxx", es(x * x)).withColumn("__syy", es(y * y))
      .filter(col("__rn") >= n)
      .withColumn(outCol,
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
               (col("__n") * col("__syy") - col("__sy") * col("__sy"))))
      .drop("__rn", "__n", "__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Rolling volatility: sample standard deviation over a bounded ROWS
    * window, from exact decimal power sums (same oracle-parity rationale as
    * [[rollingPearson]]): σ = sqrt((n·Σx² − (Σx)²) / (n·(n−1))). Rows with a
    * not-yet-full window are dropped.
    */
  def rollingVolatility(
      df: DataFrame, orderCol: String, valueCol: String, n: Int,
      partitionCols: Seq[String] = Seq.empty, outCol: String = "vol"): DataFrame = {
    val dec = DecimalType(30, 6)
    val base = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(-(n - 1), Window.currentRow)
    val x = col(valueCol).cast(DoubleType)
    df.withColumn("__rn", row_number().over(base))
      .withColumn("__n", count(lit(1)).over(w).cast(DoubleType))
      .withColumn("__sx", sum(x.cast(dec)).over(w).cast(DoubleType))
      .withColumn("__sxx", sum((x * x).cast(dec)).over(w).cast(DoubleType))
      .filter(col("__rn") >= n)
      .withColumn(outCol,
        sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) /
          (col("__n") * (col("__n") - 1))))
      .drop("__rn", "__n", "__sx", "__sxx")
  }

  /** Align two series of a tall (timeKey, seriesKey, value) frame into
    * (timeKey, x, y) rows via an inner self-equi-join on the time key.
    * With a pre-aggregated per-key frame this is a 1:1 equi-join; Catalyst
    * broadcast-joins it when one side is small, else sort-merge on timeKey.
    */
  def alignPair(
      df: DataFrame, timeCol: String, seriesCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    val left = df.filter(col(seriesCol) === a).groupBy(col(timeCol))
      .agg(avg(valueCol).as("x"))
    val right = df.filter(col(seriesCol) === b).groupBy(col(timeCol))
      .agg(avg(valueCol).as("y"))
    left.join(right, Seq(timeCol), "inner")
  }

  /** Top-k-per-group (the reference's "latest dataset" pattern, storage.py:158-170,
    * generalized): deterministic row_number with explicit tie-breaks. With
    * `k = 1` (the default) the helper rank column is dropped; for `k > 1` it is
    * kept as `__rn` so callers can expose the rank.
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int = 1): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val ranked = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    if (k == 1) ranked.drop("__rn") else ranked
  }

  /** Multi-source consolidation: union by name tolerating missing columns
    * (the dynamic-schema union the reference's common `data_type` tag implies,
    * SURVEY.md §2.6).
    */
  def unionAll(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}
