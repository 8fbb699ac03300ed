package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, TimestampType}

/** Calendar resampling with gap fill — the missing half of graft's own
  * time-bucket aggregation ([[Transforms.aggregate]]): a groupBy-only
  * formulation drops buckets that received no rows, whereas the reference's
  * `pd.Grouper(key=..., freq=...)` (transformers.py:139) — like pandas
  * `resample(...).asfreq()`/`ffill()` — emits empty calendar bins. A
  * financial series with missing trading days needs the spine back before
  * indicators run over it.
  *
  * Shape: per-key date spine (`sequence` over the key's own [min, max] day —
  * a narrow generator off a tiny bounds aggregate) → left join of the
  * observed daily frame → forward fill via `last(_, ignoreNulls)` over an
  * unbounded-preceding running frame.
  *
  * Scale (100 TB): the bounds aggregate is one partial-aggregable shuffle on
  * the key; the spine explode is ~days-per-key rows per key (thousands, not
  * data-sized) and joins back keyed on (key, day) — co-partitioned with the
  * daily aggregate, AQE broadcast-joins the spine side when small. The
  * forward fill is one key shuffle with a running frame (O(1) state per row).
  * Nothing is driver-side; no all-days cross join (a global spine ×  keys
  * cartesian would shuffle |keys|·|days| rows regardless of data, and a
  * per-key spine is also the correct semantics — keys do not extend beyond
  * their own observed range).
  */
object Resample {

  /** Daily-bucket the frame per key, then fill calendar gaps: one output row
    * per (key, day) in the key's observed [min, max] day range. `x` is the
    * observed daily max (null on gap days), `x_filled` carries the last
    * observation forward, `was_gap` flags synthesized rows.
    */
  /** Calendar-spine daily candles: [[Transforms.aggregate]] at freq "D"
    * composed with a date spine over the observed [min, max] day — the
    * faithful pandas `pd.Grouper(freq=...)` bin semantics the plain groupBy
    * knowingly drops (transformers.py:138-139 emits EMPTY calendar bins
    * inside the data's span). Gap bins carry pandas' empty-group aggregates:
    * open/high/low/close null (first/max/min/last of an empty bin are NaN)
    * and volume 0 (pandas sum of an empty group is 0 since 1.0), plus a
    * `was_gap` flag.
    *
    * Scale: the candle aggregate is the same partial-aggregable shuffle as
    * the plain variant; the bounds aggregate is one row, the spine is
    * days-in-span rows (thousands, not data-sized) and broadcast-joins back.
    */
  def calendarDailyCandles(ticks: DataFrame): DataFrame = {
    val candles = Transforms.aggregate(ticks, "D", exactSums = true)
    val bounds = candles.agg(min(col("timestamp")).as("d0"), max(col("timestamp")).as("d1"))
    val spine = bounds.select(
        explode(sequence(col("d0").cast(DateType), col("d1").cast(DateType))).as("__dd"))
      .select(col("__dd").cast(TimestampType).as("timestamp"))
    spine.join(candles, Seq("timestamp"), "left")
      .select(col("timestamp"), col("open"), col("high"), col("low"), col("close"),
        coalesce(col("volume"), lit(0.0)).as("volume"),
        col("open").isNull.as("was_gap"))
  }

  def gapFillDaily(df: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val daily = df
      .groupBy(keys :+ date_trunc("DAY", col(tsCol)).as("d"): _*)
      .agg(max(col(valueCol)).as("x"))
    val bounds = daily.groupBy(keys: _*)
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    // spine over DATES, cast back to local-midnight timestamps: a timestamp
    // sequence with INTERVAL 1 DAY adds a fixed 24h, which drifts off local
    // midnight across a DST transition and silently stops joining the
    // date_trunc'd daily keys; a date sequence can't drift (both sides derive
    // local midnight from the same session zone)
    val spine = bounds.select(
        keys :+ explode(sequence(col("d0").cast(DateType), col("d1").cast(DateType))).as("__dd"): _*)
      .select(keys :+ col("__dd").cast(TimestampType).as("d"): _*)
    val joined = spine.join(daily, keyCols :+ "d", "left")
    val runningFrame = Window.partitionBy(keys: _*).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      keys ++ Seq(col("d"), col("x"),
        last(col("x"), ignoreNulls = true).over(runningFrame).as("x_filled"),
        col("x").isNull.as("was_gap")): _*)
  }

  /** Linear interpolation of interior gaps on the daily spine — the
    * two-sided complement of [[gapFillDaily]]'s forward fill:
    * `x_interp = prev + (next − prev) · days(prev→d) / days(prev→next)`
    * for spine days with observations on BOTH sides; leading/trailing gaps
    * (no bracketing observation) stay null, observed days pass through.
    *
    * Determinism: the day distances are integers, so the fraction is one
    * exact-operand double division and the interpolation a fixed IEEE
    * expression tree — mirrored verbatim by the oracle.
    *
    * Scale: same shape as [[gapFillDaily]] — the spine explode is narrow,
    * then ONE key-partitioned exchange feeds both window directions (the
    * backward `last` and forward `first` share partitioning and sort order,
    * so Catalyst plans a single sort with two Window nodes).
    */
  def interpolateDaily(df: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val daily = df
      .groupBy(keys :+ date_trunc("DAY", col(tsCol)).as("d"): _*)
      .agg(max(col(valueCol)).as("x"))
    val bounds = daily.groupBy(keys: _*)
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = bounds.select(
        keys :+ explode(sequence(col("d0").cast(DateType), col("d1").cast(DateType))).as("__dd"): _*)
      .select(keys :+ col("__dd").cast(TimestampType).as("d"): _*)
    val joined = spine.join(daily, keyCols :+ "d", "left")
    val back = Window.partitionBy(keys: _*).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keys: _*).orderBy(col("d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("x"), ignoreNulls = true).over(back)
    val pt = last(when(col("x").isNotNull, col("d")), ignoreNulls = true).over(back)
    val nv = first(col("x"), ignoreNulls = true).over(fwd)
    val nt = first(when(col("x").isNotNull, col("d")), ignoreNulls = true).over(fwd)
    joined
      .withColumn("__pv", pv).withColumn("__pt", pt)
      .withColumn("__nv", nv).withColumn("__nt", nt)
      .withColumn("x_interp",
        when(col("x").isNotNull, col("x"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (datediff(col("d"), col("__pt")).cast(DoubleType) /
               datediff(col("__nt"), col("__pt")).cast(DoubleType))))
      .select(keys ++ Seq(col("d"), col("x"), col("x_interp"),
        col("x").isNull.as("was_gap")): _*)
  }
}
