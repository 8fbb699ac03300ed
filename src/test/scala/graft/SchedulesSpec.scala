package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Schedules

/** The reference's declared-but-unimplemented cron `schedule`
  * (schema.py:10) mapped onto Structured Streaming triggers.
  */
class SchedulesSpec extends AnyFunSuite with Matchers {

  test("fixed-rate crons parse to their interval in minutes") {
    Schedules.fixedRate("* * * * *").map(_.intervalMinutes) shouldBe Some(1L)
    Schedules.fixedRate("*/5 * * * *").map(_.intervalMinutes) shouldBe Some(5L)
    Schedules.fixedRate("0 * * * *").map(_.intervalMinutes) shouldBe Some(60L)
    Schedules.fixedRate("30 * * * *").map(_.intervalMinutes) shouldBe Some(60L)
    Schedules.fixedRate("0 */6 * * *").map(_.intervalMinutes) shouldBe Some(360L)
    Schedules.fixedRate("15 3 * * *").map(_.intervalMinutes) shouldBe Some(1440L)
  }

  test("calendar-anchored crons have no fixed rate") {
    Schedules.fixedRate("0 9 * * 1-5") shouldBe None // weekdays
    Schedules.fixedRate("0 0 1 * *") shouldBe None // first of month
    Schedules.fixedRate("0 9,17 * * *") shouldBe None // enumerated hours
    Schedules.fixedRate("0 9-17 * * *") shouldBe None // hour range
    Schedules.fixedRate("not a cron") shouldBe None
    Schedules.fixedRate("* * *") shouldBe None // wrong arity
    Schedules.fixedRate("*/0 * * * *") shouldBe None // zero step is not a rate
    Schedules.fixedRate("99 * * * *") shouldBe None // minute out of range
    Schedules.fixedRate("0 99 * * *") shouldBe None // hour out of range
    // steps that don't divide the field period wrap unevenly in real cron
    // (minutes 0,45,0,45… ≠ uniform 45-minute rate) — rejected, not approximated
    Schedules.fixedRate("*/45 * * * *") shouldBe None
    Schedules.fixedRate("0 */5 * * *") shouldBe None
  }

  test("toTrigger: @once/blank -> AvailableNow, fixed rate -> ProcessingTime, calendar -> rejected") {
    Schedules.toTrigger("@once") shouldBe Trigger.AvailableNow()
    Schedules.toTrigger("") shouldBe Trigger.AvailableNow()
    Schedules.toTrigger(null) shouldBe Trigger.AvailableNow()
    Schedules.toTrigger("*/10 * * * *") shouldBe Trigger.ProcessingTime(10 * 60000L)
    Schedules.toTrigger("0 2 * * *") shouldBe Trigger.ProcessingTime(1440 * 60000L)
    an[IllegalArgumentException] should be thrownBy Schedules.toTrigger("0 9 * * 1")
  }
}
