package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over (start, end) spans — the "how many sessions were
  * open at once" question the reference's dashboard gestures at with its
  * per-day event counts (index.html's activity panel) but never computes.
  *
  * The classic answer is a boundary sweep: +1 at each start, −1 after each
  * end, running total in time order. The running total is a GLOBAL prefix
  * sum — the textbook formulation (`sum().over(Window.orderBy(t))`) funnels
  * the whole boundary stream through one task, the same scale killer
  * [[Packing.packSequences]] documents. The same two-level fix applies:
  * per-bucket local prefix sums under a partitioned window, plus an
  * exclusive carry sum over the small per-bucket-totals table, broadcast
  * back. Integer arithmetic throughout ⇒ bit-identical to the single-window
  * formulation (which is exactly what the DuckDB oracle runs) at any bucket
  * width.
  */
object Intervals {

  /** Concurrency timeline of inclusive [start, end] intervals: one row per
    * distinct boundary instant `t` with `active` = number of intervals
    * satisfying `start <= t AND end >= t`.
    *
    * Derivation: `active(t) = #starts(<=t) − #ends(<t)`; aggregating
    * boundaries per distinct instant into (st, et) counts makes that
    * `cumsum(st − et)(<=t) + et` — the `et` add-back is what makes the end
    * bound inclusive (an interval ending AT t is still open at t; a
    * single-instant interval contributes 1 at its only instant).
    *
    * Scale: one groupBy shuffle on the boundary instant (map-side combine
    * absorbs duplicate instants), then the two-level prefix sum — local
    * windows partitioned by time bucket, one tiny carry table (time span /
    * `bucketMicros` rows; pick the width so that table stays ~10⁵ rows —
    * hours for a month of data, days for a decade), broadcast joined back.
    * No unpartitioned window over the data ever exists.
    */
  def concurrency(df: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long = 3600000000L): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val bounds = df.select(col(startCol).as("t"), lit(1L).as("__s"), lit(0L).as("__e"))
      .unionAll(df.select(col(endCol).as("t"), lit(0L).as("__s"), lit(1L).as("__e")))
    val perT = bounds.groupBy("t")
      .agg(sum("__s").as("__st"), sum("__e").as("__et"))
      .withColumn("__grp", expr(s"unix_micros(t) div ${bucketMicros}L"))
    val wIn = Window.partitionBy(col("__grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = perT.withColumn("__local",
      sum(col("__st") - col("__et")).over(wIn))
    val wCarry = Window.orderBy(col("__grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = perT.groupBy(col("__grp"))
      .agg(sum(col("__st") - col("__et")).as("__gtot"))
      .withColumn("__goff", coalesce(sum(col("__gtot")).over(wCarry), lit(0L)))
      .select(col("__grp"), col("__goff"))
    local.join(broadcast(carries), Seq("__grp"))
      .withColumn("active", col("__goff") + col("__local") + col("__et"))
      .select(col("t"), col("active"))
  }
}
