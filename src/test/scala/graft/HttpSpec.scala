package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.sources.Http

/** S12 retry/backoff/throttle contract (reference yahoo_finance.py:23-87) —
  * exercised offline via injected send/sleep.
  */
class HttpSpec extends AnyFunSuite with Matchers {

  test("backoff policy: 429 exponential with multiplicative jitter, capped at 30s") {
    Http.backoffSeconds(0, rateLimited = true, u = 0.0) shouldBe 1.0
    Http.backoffSeconds(2, rateLimited = true, u = 0.5) shouldBe 6.0
    Http.backoffSeconds(10, rateLimited = true, u = 0.9) shouldBe 30.0 // cap
  }

  test("backoff policy: other errors exponential plus U(1,3), capped at 30s") {
    Http.backoffSeconds(0, rateLimited = false, u = 0.0) shouldBe 2.0 // 2^0 + 1
    Http.backoffSeconds(3, rateLimited = false, u = 1.0) shouldBe 11.0 // 8 + 3
    Http.backoffSeconds(20, rateLimited = false, u = 0.0) shouldBe 30.0 // cap
  }

  test("get retries through failures, returns body on success, None after exhaustion") {
    var calls = 0
    var sleeps = List.empty[Long]
    val http = new Http(minDelaySeconds = 0.0, maxRetries = 5,
      send = _ => { calls += 1; if (calls < 3) (429, "slow down") else (200, "payload") },
      sleep = ms => sleeps = ms :: sleeps)
    http.get("http://example.test/x", Map("a" -> "1")) shouldBe Some("payload")
    calls shouldBe 3
    // two backoff sleeps happened (plus throttle sleeps which are < 1.1s)
    sleeps.count(_ >= 1000) shouldBe 2

    var n = 0
    var deadSleeps = List.empty[Long]
    val dead = new Http(minDelaySeconds = 0.0, maxRetries = 4,
      send = _ => { n += 1; (500, "boom") }, sleep = ms => deadSleeps = ms :: deadSleeps)
    dead.get("http://example.test/y") shouldBe None
    n shouldBe 4
    // no terminal backoff: 4 attempts → 3 inter-attempt sleeps, none after the last
    deadSleeps.count(_ >= 1000) shouldBe 3
  }
}
