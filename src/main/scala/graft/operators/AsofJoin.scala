package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join: for every left row, attach the most recent right row whose
  * event time is `<=` the left row's time (optionally within a tolerance),
  * per join key — the canonical time-series enrichment operator (quote-at-
  * trade-time, indicator-at-order-date). The reference's data model implies it
  * (multi-source time series sharing a `timestamp` axis) but never implements
  * it; DuckDB's native `ASOF JOIN` serves as the oracle.
  *
  * Implementation is the union-and-carry pattern, NOT a range join:
  * both sides are tagged and unioned, sorted within each key partition by
  * (time, side-order), and the right row's payload — packed in ONE non-null
  * struct so genuinely-null payload values don't fall through to older rows —
  * is carried forward with `last(ignoreNulls = true)` over an
  * unbounded-preceding running frame. One shuffle on the key (the same
  * shuffle a plain join would need), zero row-explosion — at 100 TB this
  * beats a range join's quadratic candidate blow-up and inherits AQE skew
  * splitting on the single exchange.
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < side 1), so
  * an exactly-simultaneous right row matches — `<=` semantics, same as
  * DuckDB `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsofJoin {

  /** @param left       probe side (one output row per left row)
    * @param right      reference side (payload carried forward in time)
    * @param keyCols    equi-join key (present in both frames)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right-side columns to attach (same names on output)
    * @param tolerance  optional max staleness (e.g. "INTERVAL 7 DAYS"): matches
    *                   older than `leftTime - tolerance` (backward) or later
    *                   than `leftTime + tolerance` (forward) are nulled out
    * @param direction  "backward" (default — most recent right row at or
    *                   before leftTime) or "forward" (earliest right row at
    *                   or after leftTime — the next-quote join). Forward is
    *                   the SAME union-and-carry over the reversed time
    *                   order, so it costs the identical single key shuffle;
    *                   DuckDB's `ASOF ... ON l.ts <= r.ts` is its dual.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof: direction must be backward|forward, got $direction")
    require(payload.nonEmpty, "asof: payload columns required")
    val lPayloadCols = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTime)
    // the output carries left pass-through columns AND right payload columns
    // under their own names — a shared name would emit two identically-named
    // columns and poison every downstream select with AMBIGUOUS_REFERENCE
    val clash = lPayloadCols.toSet.intersect(payload.toSet)
    require(clash.isEmpty,
      s"asof: left columns ${clash.mkString(", ")} collide with payload names — rename one side")

    // Common axis: key, event time `__t`, side tag (right first on ties), the
    // right payload as one non-null struct (plus the match time inside it),
    // left columns passed through (null on right rows).
    val rStruct = struct(col(rightTime).as("__match_t") +: payload.map(col): _*)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"), rStruct.as("__r")) ++
        lPayloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val nullStruct = lit(null).cast(
      StructType(StructField("__match_t", right.schema(rightTime).dataType) +:
        payload.map(c => StructField(c, right.schema(c).dataType))))
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"), nullStruct.as("__r")) ++
        lPayloadCols.map(c => col(c).as(s"__l_$c")): _*)

    // forward = the same carry over the REVERSED time order (right rows
    // still sort before left rows at equal timestamps, preserving the
    // inclusive match in both directions)
    val tOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val fresh: Column = tolerance match {
      case Some(t) if direction == "backward" =>
        col("__m").isNotNull && col("__m.__match_t") >= col("__t") - expr(t)
      case Some(t) =>
        col("__m").isNotNull && col("__m.__match_t") <= col("__t") + expr(t)
      case None => col("__m").isNotNull
    }
    carried.select(
      keyCols.map(col) ++
        Seq(col("__t").as(leftTime)) ++
        lPayloadCols.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => when(fresh, col(s"__m.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
