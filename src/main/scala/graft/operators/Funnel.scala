package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** First-order Markov transition matrix of the per-user event stream:
    * for each (src → dst) adjacent-event pair, the transition count and the
    * row-normalized probability `p = n / Σ_dst n`. Adjacency is defined by
    * (time, tie-break id) order WITHIN a user — the same deterministic-order
    * requirement every windowed operator in this engine states, made explicit
    * here because equal timestamps across event types are common in clickstream
    * data.
    *
    * Scale: one user-keyed exchange feeds the `lead` window, then one
    * (src, dst) count shuffle with map-side combine; the row totals derive
    * from the counts frame itself (#types² rows), so normalization is free.
    * Probabilities are integer-count ratios — engine-independent doubles.
    */
  def transitions(df: DataFrame, userCol: String, typeCol: String,
      timeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    // project before the window: the user-keyed exchange and sort must carry
    // the four participating columns, not the source row (a wide payload
    // column would ride the whole shuffle otherwise)
    val counts = df.select(col(userCol), col(typeCol), col(timeCol), col(tieCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("src"), col("__next").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("__tot"))
    counts.join(totals, Seq("src"))
      .withColumn("p", col("n").cast(DoubleType) / col("__tot").cast(DoubleType))
      .select("src", "dst", "n", "p")
  }

  /** Top-k most-traveled 3-step paths: adjacent (e₁→e₂→e₃) type triples in
    * each unit's time-ordered stream, counted corpus-wide — the path-mining
    * companion of [[transitions]] (first-order chains miss multi-step
    * structure like view→click→purchase vs view→click→view).
    *
    * Same projected unit-keyed window as [[transitions]] (two leads ride one
    * sort), one partial-aggregable count, `TakeOrdered` top-k — never a
    * global sort. All-integer, deterministic (count desc, then path).
    */
  def topPaths(df: DataFrame, unitCol: String, typeCol: String,
      timeCol: String, tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(unitCol)).orderBy(col(timeCol), col(tieCol))
    df.select(col(unitCol), col(typeCol), col(timeCol), col(tieCol))
      .withColumn("__e2", lead(col(typeCol), 1).over(w))
      .withColumn("__e3", lead(col(typeCol), 2).over(w))
      .filter(col("__e2").isNotNull && col("__e3").isNotNull)
      .groupBy(col(typeCol).as("e1"), col("__e2").as("e2"), col("__e3").as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Stationary distribution of the [[transitions]] Markov chain by
    * fixed-iteration power method: `π' = π·P` from a uniform start, with
    * states lacking outgoing transitions keeping their mass (self-loop
    * semantics — the bounded analogue of PageRank's dangling handling, but
    * without teleport: this is the raw chain). Long-run occupancy is the
    * summary a behavior report derives from the transition matrix.
    *
    * Engine parity is [[Graph.pageRank]]'s pattern verbatim: per-state
    * contribution sums go through DECIMAL(38,12), so they are
    * order-independent and bit-reproducible; everything else is identically
    * written double arithmetic. Scale: the state set is #distinct event
    * types — bounded by construction (the one tiny unpartitioned window is
    * over that frame) — and each iteration is one edges⋈π join + one
    * partial-aggregable sum, the BSP dataflow shape, regardless of how many
    * EVENTS produced the matrix.
    */
  def stationary(trans: DataFrame, iterations: Int = 4,
      maxStates: Int = 512): DataFrame = {
    // driver-collect guard: the collect below is sized for state sets that
    // are VOCABULARIES (event types), bounded at maxStates² transition rows.
    // A high-cardinality state column (user ids, urls) would otherwise OOM
    // the driver with no diagnostic. The guard rides the collect itself —
    // take(cap+1) either returns the whole (bounded) frame, which then IS
    // the collected matrix, or proves the overflow and fails fast; zero
    // extra jobs on the good path.
    val cap = maxStates.toLong * maxStates.toLong
    // the guard below rides take((cap+1).toInt): for maxStates ≥ 46341 the
    // Int cast would WRAP (e.g. 65536² + 1 → 1) and silently truncate the
    // matrix to one row while the require still passes — fail fast instead
    require(cap + 1 <= Int.MaxValue,
      s"stationary: maxStates = $maxStates overflows the driver-collect guard " +
        s"(maxStates^2 + 1 must fit an Int); a state vocabulary this large " +
        "should not be driver-collected — use the dataflow pageRank shape")
    // r10: the power iteration runs ON THE DRIVER over the COLLECTED
    // transition matrix — bounded at #states² rows (the state set is the
    // event-type vocabulary, not data volume), so this is the PCA-w/kmeans
    // driver-iteration pattern taken to its limit: ONE distributed job (the
    // transition-count aggregation underneath `trans`) instead of
    // 4 × (join + decimal agg + join). The arithmetic replicates the
    // previous dataflow bit for bit: per-edge contribution = double product
    // → DECIMAL(38,12) HALF_UP (java BigDecimal.valueOf ≡ Spark's
    // Decimal(double) shortest-string semantics), exact decimal sums
    // (order-free), decimal→double at the round boundary, and absorbing
    // states (no outgoing edges) carry their mass forward.
    val head = trans.select(col("src"), col("dst"), col("p")).take((cap + 1).toInt)
    require(head.length <= cap,
      s"stationary: transition frame exceeds $maxStates^2 = $cap rows — " +
        "the state column looks data-keyed, not a vocabulary; raise maxStates " +
        "only if the state set is genuinely bounded")
    val t = head.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val statesArr = (t.map(_._1) ++ t.map(_._2)).distinct.sorted
    val hasOut = t.map(_._1).toSet
    var pi: Map[String, Double] = statesArr.map(s => s -> 1.0 / statesArr.length).toMap
    (1 to iterations).foreach { _ =>
      val sums = scala.collection.mutable.Map[String, java.math.BigDecimal]()
      t.foreach { case (src, dst, p) =>
        val dec = java.math.BigDecimal.valueOf(pi(src) * p)
          .setScale(12, java.math.RoundingMode.HALF_UP)
        sums(dst) = sums.getOrElse(dst, java.math.BigDecimal.ZERO).add(dec)
      }
      pi = statesArr.map { s =>
        s -> (sums.get(s).map(_.doubleValue).getOrElse(0.0) +
          (if (hasOut(s)) 0.0 else pi(s)))
      }.toMap
    }
    val session = trans.sparkSession
    import session.implicits._
    statesArr.toSeq.map(s => (s, pi(s))).toDF("state", "pi")
  }
}
