package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.util.Random

/** Connector-side HTTP shell: throttle, retry with exponential backoff +
  * jitter, rotating User-Agent pool (reference yahoo_finance.py:23-87 S12).
  *
  * Pure JVM utility, intentionally outside any Spark operator — the parsers in
  * [[JsonPayloads]] consume payload strings from anywhere (fixture files, a
  * message bus, or this client), which keeps the dataflow testable in the
  * zero-egress environment. In a cluster deployment this runs driver-side (or
  * inside a custom streaming source's admin thread), never inside a task.
  *
  * The network send and the sleeper are injectable so the retry/backoff
  * contract itself is unit-testable offline.
  */
final class Http(
    minDelaySeconds: Double = 2.0,
    maxRetries: Int = 5,
    timeoutSeconds: Int = 10,
    rng: Random = new Random(),
    send: HttpRequest => (Int, String) = null,
    sleep: Long => Unit = Thread.sleep) {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds)).build()

  private def doSend(req: HttpRequest): (Int, String) =
    if (send != null) send(req)
    else {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }

  /** Rotating browser User-Agent pool (reference yahoo_finance.py:26-32). */
  private val userAgents = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:125.0) Gecko/20100101 Firefox/125.0")

  @volatile private var lastRequestAt = 0L

  /** Min-delay throttle + U(0.1,1.0)s jitter between calls
    * (reference yahoo_finance.py:34-45).
    */
  private def throttle(): Unit = synchronized {
    val wait = (minDelaySeconds + 0.1 + rng.nextDouble() * 0.9) * 1000 -
      (System.currentTimeMillis() - lastRequestAt)
    if (wait > 0) sleep(wait.toLong)
    lastRequestAt = System.currentTimeMillis()
  }

  /** GET with retry (reference yahoo_finance.py:47-87): `maxRetries` attempts;
    * backoff per [[Http.backoffSeconds]]; None after exhaustion.
    */
  def get(url: String, params: Map[String, String] = Map.empty): Option[String] = {
    val q = if (params.isEmpty) "" else params.map { case (k, v) =>
      s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }.mkString("?", "&", "")
    val req = HttpRequest.newBuilder(URI.create(url + q))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("User-Agent", userAgents(rng.nextInt(userAgents.length)))
      .GET().build()
    var attempt = 0
    while (attempt < maxRetries) {
      throttle()
      // no backoff after the FINAL attempt — a terminal sleep (up to 30 s)
      // would delay the caller's error path while preceding no retry
      val lastAttempt = attempt + 1 == maxRetries
      try {
        val (status, body) = doSend(req)
        if (status == 200) return Some(body)
        else if (!lastAttempt)
          sleep((Http.backoffSeconds(attempt, status == 429, rng.nextDouble()) * 1000).toLong)
      } catch {
        case _: Exception =>
          if (!lastAttempt)
            sleep((Http.backoffSeconds(attempt, rateLimited = false, rng.nextDouble()) * 1000).toLong)
      }
      attempt += 1
    }
    None
  }
}

object Http {

  /** Backoff policy (reference yahoo_finance.py:62-83), as a pure function of
    * (attempt, rate-limited?, uniform draw): HTTP 429 waits
    * `min(30, 2^attempt·(1+U(0,1)))` seconds; other failures wait
    * `min(30, 2^attempt + U(1,3))` seconds.
    */
  def backoffSeconds(attempt: Int, rateLimited: Boolean, u: Double): Double =
    if (rateLimited) math.min(30.0, math.pow(2.0, attempt) * (1 + u))
    else math.min(30.0, math.pow(2.0, attempt) + 1 + u * 2)
}
