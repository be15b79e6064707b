package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Driver-side HTTP plumbing for the SaaS extractors — the one
  * reference subsystem (src/extractors/pipedrive_bronze.py,
  * zendesk_bronze.py) with no engine-side counterpart: cursor-paged
  * API pulls are inherently sequential per entity (each page's cursor
  * comes from the previous response), so they run on the driver and
  * hand landed bronze files to Spark. Everything here is JDK-only
  * (java.net.http + the Jackson that ships with Spark); the transport
  * is a seam so specs drive the extractors against an in-memory stub
  * API with fault injection instead of the network.
  */
final case class ApiResponse(status: Int, headers: Map[String, String],
    body: String) {
  /** RFC 9110 header names are case-insensitive. */
  def header(name: String): Option[String] =
    headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }
}

/** One GET. Implementations must not retry — retry/backoff policy
  * lives in [[RetryingApi]] so it is testable and uniform. */
trait ApiTransport {
  def get(url: String, params: Map[String, String]): ApiResponse
}

/** java.net.http transport; auth/static headers fixed at construction
  * (reference: session headers, pipedrive_bronze.py:65,
  * zendesk_bronze.py:121). */
final class JdkHttpTransport(staticHeaders: Map[String, String],
    timeoutMs: Long = 60000L) extends ApiTransport {
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  def get(url: String, params: Map[String, String]): ApiResponse = {
    val full = Api.withQuery(url, params)
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(full))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET()
    staticHeaders.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    val hs = scala.jdk.CollectionConverters
      .MapHasAsScala(resp.headers().map()).asScala.map {
        case (k, vs) => (k, if (vs.isEmpty) "" else vs.get(0))
      }.toMap
    ApiResponse(resp.statusCode(), hs, resp.body())
  }
}

/** Retry/backoff front of a transport (reference `_request`,
  * pipedrive_bronze.py:68-85 / zendesk_bronze.py:125-139): 429 honors
  * a digit `Retry-After` else exponential backoff capped at
  * `backoffCapSeconds`; 5xx backs off the same; other statuses return
  * to the caller, and `getJson` raises on >= 400 with a body snippet.
  * The sleeper is injected so specs assert the schedule without
  * sleeping. */
final class RetryingApi(transport: ApiTransport, maxRetries: Int = 8,
    backoffCapSeconds: Double = 30.0,
    sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong)) {
  require(maxRetries >= 1)

  def get(url: String, params: Map[String, String]): ApiResponse = {
    var last: ApiResponse = null
    var attempt = 0
    while (attempt < maxRetries) {
      val r = transport.get(url, params)
      last = r
      if (r.status == 429) {
        val ra = r.header("Retry-After").filter(_.forall(_.isDigit))
        sleeper(ra.map(_.toDouble)
          .getOrElse(math.min(backoffCapSeconds, math.pow(2.0, attempt))))
      } else if (r.status >= 500 && r.status < 600) {
        sleeper(math.min(backoffCapSeconds, math.pow(2.0, attempt)))
      } else {
        return r
      }
      attempt += 1
    }
    last
  }

  def getJson(url: String, params: Map[String, String]): JsonNode = {
    val r = get(url, params)
    if (r.status >= 400)
      throw new java.io.IOException(
        s"HTTP ${r.status} - ${r.body.take(500)}")
    Api.mapper.readTree(r.body)
  }
}

object Api {
  /** Shared, thread-safe after config; Jackson ships with Spark. */
  val mapper = new ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Append params to a URL that may already carry a query string
    * (Zendesk `next_page` links do). Deterministic param order. */
  def withQuery(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val q = params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      url + (if (url.contains("?")) "&" else "?") + q
    }

  /** Query params of a URL — cursor recovery from `next_page` links
    * (zendesk_bronze.py:185-192). */
  def queryParams(url: String): Map[String, String] = {
    val qi = url.indexOf('?')
    if (qi < 0) Map.empty
    else url.substring(qi + 1).split('&').toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap
  }

  /** Compact single-line JSON of a payload node — the bronze line
    * format (reference json_dumps, one object per line). */
  def line(node: JsonNode): String = mapper.writeValueAsString(node)
}
