package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** Cron-expression scheduling for streams — the reference DECLARES a cron
  * `schedule` per data source (reference schema.py:10,
  * `schedule: Optional[str]  # cron expression for scheduling`) but never
  * implements it; here the declared surface maps onto Structured Streaming's
  * trigger model, which is the Spark-native expression of "run this
  * periodically":
  *
  *  - a FIXED-RATE cron (`*&#47;5 * * * *`, `0 * * * *`, `0 3 * * *`) maps to
  *    `Trigger.ProcessingTime(interval)` — the stream stays up and fires a
  *    micro-batch each period;
  *  - `@once` / blank maps to `Trigger.AvailableNow()` — drain the backlog
  *    and stop (the reference's fire-and-forget background ingest semantics).
  *
  * Only fixed-rate shapes are expressible: ProcessingTime fires every N
  * units from stream start, so a cron that encodes a CALENDAR anchor
  * (specific day-of-month/day-of-week, or an enumerated list like
  * `0 9,17 * * *`) has no faithful trigger — [[toTrigger]] rejects it rather
  * than silently approximating. At cluster scale those belong to an external
  * workflow scheduler launching an `AvailableNow` run per fire (the standard
  * Spark pattern for calendar-anchored batch ingest).
  *
  * PHASE is not preserved: a pinned minute/hour anchor (`30 * * * *`,
  * `15 3 * * *`) keeps its RATE (hourly, daily) but fires relative to stream
  * start, not at :30 or 03:15 wall-clock — ProcessingTime has no phase knob.
  * This is a documented contract, not an oversight: the period is the
  * load-bearing part of an ingest schedule (how stale data may get), the
  * phase is cosmetic under micro-batching. A caller that needs wall-clock
  * phase has a calendar requirement and should treat it like the rejected
  * shapes above (external scheduler + AvailableNow).
  */
object Schedules {

  /** Parsed fixed-rate view of a 5-field cron expression. */
  final case class FixedRate(intervalMinutes: Long)

  private val Field = """(\*|\d{1,2})(?:/(\d{1,2}))?""".r

  /** Parse a standard 5-field cron (`min hour dom month dow`) into a fixed
    * rate, if it has one:
    *  - `*&#47;N * * * *`            → every N minutes
    *  - `M * * * *`               → hourly (anchor minute ignored for rate)
    *  - `* / *&#47;N in the hour field, minutes pinned` → every N hours
    *  - `M H * * *`               → daily
    * Returns None for calendar-anchored or enumerated expressions.
    */
  def fixedRate(cron: String): Option[FixedRate] = {
    val fields = cron.trim.split("\\s+")
    if (fields.length != 5) return None
    val Array(min, hour, dom, month, dow) = fields
    if (dom != "*" || month != "*" || dow != "*") return None // calendar anchor
    // field validity: steps must be >= 1 ('*/0' is not a schedule) AND divide
    // their field's period — cron '*/45 * * * *' fires at minutes 0 and 45
    // then WRAPS to 0 of the next hour (uneven 45/15 cadence), which a
    // uniform ProcessingTime(45 min) does not reproduce; such steps are
    // calendar shapes in disguise and are rejected like any other. Anchors
    // must be in range — an invalid cron must be rejected, not silently
    // mapped to some rate (ProcessingTime(0) would busy-loop).
    def stepOk(s: String, period: Long) =
      s != null && s.toLong >= 1L && period % s.toLong == 0L
    def anchorOk(v: String, max: Int) = v == "*" || v.toInt <= max
    (min, hour) match {
      case ("*", "*") => Some(FixedRate(1L)) // every minute
      case (Field("*", step), "*") if stepOk(step, 60L) =>
        Some(FixedRate(step.toLong))
      case (Field(m, null), "*") if m != "*" && anchorOk(m, 59) =>
        Some(FixedRate(60L)) // hourly
      case (Field(m, null), Field("*", step)) if m != "*" && anchorOk(m, 59) &&
          stepOk(step, 24L) =>
        Some(FixedRate(step.toLong * 60L)) // every N hours
      case (Field(m, null), Field(h, null)) if m != "*" && h != "*" &&
          anchorOk(m, 59) && anchorOk(h, 23) =>
        Some(FixedRate(24L * 60L)) // daily
      case _ => None // lists/ranges (9,17 or 9-17) are calendar shapes
    }
  }

  /** Cron → Spark trigger. `@once`, empty, or null run as `AvailableNow`;
    * fixed-rate crons run as `ProcessingTime`; calendar-anchored crons are
    * rejected (see class doc for why, and what to use instead).
    *
    * CONTRACT: pinned anchors lose their phase — `0 3 * * *` becomes "every
    * 24 h from stream start", not "at 03:00". Callers needing wall-clock
    * phase must use an external scheduler (see class doc, "PHASE is not
    * preserved").
    */
  def toTrigger(schedule: String): Trigger = schedule match {
    case null | "" | "@once" => Trigger.AvailableNow()
    case cron =>
      fixedRate(cron) match {
        case Some(FixedRate(m)) => Trigger.ProcessingTime(m * 60000L)
        case None => throw new IllegalArgumentException(
          s"cron '$cron' is calendar-anchored; use an external scheduler firing AvailableNow runs")
      }
  }
}
