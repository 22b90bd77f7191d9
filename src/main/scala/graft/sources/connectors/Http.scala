package graft.sources.connectors

/** Minimal HTTP abstraction the connectors program against. Production
  * would bind this to java.net.http; tests inject scripted stubs
  * (offline container — zero egress), which is exactly the seam the
  * reference lacks (its fetchers call `requests` directly and are
  * untested; SURVEY §5).
  */
final case class HttpResponse(
    status: Int,
    bytes: Array[Byte],
    headers: Map[String, String] = Map.empty) {
  /** Text view of the payload; JSON/CSV consumers decode on demand.
    * Binary payloads (ZIP archives, parquet) must use [[bytes]] — a
    * String round-trip replaces invalid UTF-8 sequences and corrupts
    * them (the reference streams raw bytes: url_fetcher.py wb mode).
    */
  def body: String = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  def isSuccess: Boolean = status >= 200 && status < 300

  // case-class equality on an Array field is reference identity —
  // compare payload by content so structurally-equal responses match
  override def equals(other: Any): Boolean = other match {
    case that: HttpResponse =>
      status == that.status && headers == that.headers &&
        java.util.Arrays.equals(bytes, that.bytes)
    case _ => false
  }
  override def hashCode(): Int =
    (status, java.util.Arrays.hashCode(bytes), headers).##
}

object HttpResponse {
  def apply(status: Int, body: String): HttpResponse =
    HttpResponse(status, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  def apply(status: Int, body: String, headers: Map[String, String]): HttpResponse =
    HttpResponse(status, body.getBytes(java.nio.charset.StandardCharsets.UTF_8), headers)
}

trait HttpClient {
  def get(url: String, params: Map[String, String] = Map.empty): HttpResponse
  def post(url: String, jsonBody: String): HttpResponse
}

/** S3 — the reference's retry policy (nyc_open_data_fetcher.py:125-179):
  * up to `maxRetries` attempts; HTTP 429 sleeps the Retry-After header
  * (default 60 s) and retries; transport errors back off 2^attempt
  * seconds; the final attempt rethrows / returns the failure.
  *
  * `sleeper` is injected so specs assert the exact wait sequence
  * without real sleeping.
  */
final class RetryingClient(
    inner: HttpClient,
    maxRetries: Int = 3,
    sleeper: Long => Unit = s => Thread.sleep(s * 1000)) extends HttpClient {

  override def get(url: String, params: Map[String, String]): HttpResponse =
    withRetry(inner.get(url, params))

  override def post(url: String, jsonBody: String): HttpResponse =
    withRetry(inner.post(url, jsonBody))

  private def withRetry(call: => HttpResponse): HttpResponse = {
    var lastError: Throwable = null
    var attempt = 0
    while (attempt < maxRetries) {
      try {
        val resp = call
        if (resp.status == 429) {
          val retryAfter = resp.headers.get("Retry-After")
            .flatMap(s => s.toLongOption).getOrElse(60L)
          sleeper(retryAfter)
        } else if (!resp.isSuccess) {
          throw new java.io.IOException(s"HTTP ${resp.status}")
        } else {
          return resp
        }
      } catch {
        case e: Throwable =>
          lastError = e
          if (attempt >= maxRetries - 1) throw e
          sleeper(1L << attempt) // 2^attempt seconds
      }
      attempt += 1
    }
    if (lastError != null) throw lastError
    throw new java.io.IOException("Max retries exceeded")
  }
}
