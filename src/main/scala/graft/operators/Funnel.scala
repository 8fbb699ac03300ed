package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-journey analytics over event logs: ordered-step funnels and
  * first-touch retention cohorts — the two counting shapes every
  * product/event warehouse runs daily. Both are all-integer (counts of
  * users over exact timestamps), so results are bit-deterministic.
  */
object Funnel {

  /** Ordered funnel over `steps` event types: a user reaches step i at their
    * EARLIEST type-Sᵢ event strictly after their step-(i−1) time (step 1 is
    * the unconditioned earliest S₁). Emits one row per step —
    * (step, step_name, n_users) — with n_users non-increasing.
    *
    * Scale: step i is a min-aggregation of the type-Sᵢ slice joined to the
    * step-(i−1) user frame — every shuffle is keyed on the user column and
    * partial-aggregable (min/count), the per-step frames shrink
    * monotonically, and no window touches the full corpus. k−1 joins for a
    * k-step funnel is the declarative form of the sequential dependency a
    * funnel inherently has.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, timeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var prev: DataFrame = null
    val counts = steps.zipWithIndex.map { case (st, i) =>
      val slice = df.filter(col(typeCol) === st)
        .select(col(userCol).as("__u"), col(timeCol).as("__ts"))
      val stepFrame =
        if (i == 0) slice.groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
        else slice.join(prev, Seq("__u"))
          .filter(col("__ts") > col("__t"))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
      prev = stepFrame
      stepFrame.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("step_name"), col("n_users"))
    }
    counts.reduce(_ unionAll _)
  }

  /** First-touch retention: users cohort by the calendar day of their first
    * event; for each (cohort_day, day_offset) the count of cohort users
    * active that day (offset 0 is the cohort day itself, so its count is the
    * cohort size).
    *
    * Scale: two user-keyed partial-aggregable shuffles (first-touch min,
    * distinct active days) that co-partition for the join, then one tiny
    * (cohort, offset) count — day-grain frames only, nothing row-quadratic.
    */
  def retentionCohorts(df: DataFrame, userCol: String, timeCol: String): DataFrame = {
    val days = df.select(col(userCol).as("__u"), to_date(col(timeCol)).as("__d"))
    val cohort = days.groupBy(col("__u")).agg(min(col("__d")).as("cohort_day"))
    val active = days.distinct()
    active.join(cohort, Seq("__u"))
      .select(col("cohort_day"),
        datediff(col("__d"), col("cohort_day")).cast(LongType).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
