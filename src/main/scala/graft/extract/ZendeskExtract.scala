package graft.extract

import com.fasterxml.jackson.databind.JsonNode
import graft.sources.RunManifest
import org.apache.spark.sql.SparkSession

/** Zendesk bronze extractor — the reference's three export modes
  * (zendesk_bronze.py main:281-418):
  *
  *  - tickets: CURSOR-BASED incremental export
  *    (`incremental/tickets/cursor.json`, :153-204) — resumes from
  *    the persisted after_cursor, else starts at the saved/initial
  *    `start_time`; the cursor is recovered from `after_cursor`,
  *    `meta.after_cursor`, or the `next_page`/`links.next` URL's
  *    query string, in that order; the loop ends at
  *    `end_of_stream` and FAILS EXPLICITLY when neither cursor nor
  *    end-of-stream is present (silent truncation is the failure
  *    mode this guards);
  *  - users / organizations: TIME-BASED incremental export
  *    (`incremental/{users,organizations}.json`, :359-387) — pages
  *    follow `next_page`, the watermark advances to the LAST
  *    `end_time` seen so the next run resumes where the stream ended;
  *  - groups / ticket_fields / ticket_forms: SNAPSHOT pagination
  *    following `next_page` (:140-151).
  *
  * Same part batching / bronze layout / run manifest as the
  * Pipedrive extractor; cursor documents persist as
  * {"mode","cursor","start_time"} via [[CursorStore]].
  */
final class ZendeskExtractor(spark: SparkSession, api: RetryingApi,
    baseUrl: String, lakeBase: String, initialStartTime: Long = 0L,
    perPage: Int = 1000, batchPages: Int = 8,
    excludeDeleted: Boolean = true,
    now: () => java.time.Instant = () => java.time.Instant.now()) {

  private val source = "zendesk"
  private val cursors = new CursorStore(spark, lakeBase)
  private val manifest = new RunManifest(spark, lakeBase)

  private val snapshots = Map(
    "groups" -> ("/api/v2/groups.json", "groups"),
    "ticket_fields" -> ("/api/v2/ticket_fields.json", "ticket_fields"),
    "ticket_forms" -> ("/api/v2/ticket_forms.json", "ticket_forms"))
  private val timeBased = Map(
    "users" -> ("/api/v2/incremental/users.json", "users"),
    "organizations" -> ("/api/v2/incremental/organizations.json",
      "organizations"))

  private def cursorOf(payload: JsonNode): Option[String] = {
    val direct = payload.path("after_cursor")
    val meta = payload.path("meta").path("after_cursor")
    val link = Seq(payload.path("next_page"),
      payload.path("links").path("next"))
      .find(n => n.isTextual && n.asText.nonEmpty)
      .flatMap { n =>
        val q = Api.queryParams(n.asText)
        q.get("cursor").orElse(q.get("after_cursor"))
      }
    if (direct.isTextual && direct.asText.nonEmpty) Some(direct.asText)
    else if (meta.isTextual && meta.asText.nonEmpty) Some(meta.asText)
    else link
  }

  def runScope(scope: String, entities: Seq[String])
      : Seq[RunManifest.EntityReport] = {
    val started = now()
    val rid = Extract.runId(started)
    val idate = Extract.ingestionDate(started)

    val reports = entities.map { entity =>
      val writer = new BronzePartWriter(spark, lakeBase, source, scope,
        entity, idate, rid, batchPages, maxBufferRecords = Int.MaxValue)
      val mode = entity match {
        case "tickets" =>
          val wm = cursors.load(source, scope, "tickets")
          val startTime = wm.map(_.path("start_time").asLong(
            initialStartTime)).getOrElse(initialStartTime)
          var cursor = wm.flatMap { d =>
            val c = d.path("cursor")
            if (c.isTextual && c.asText.nonEmpty) Some(c.asText)
            else None
          }
          var lastCursor = cursor
          var eos = false
          while (!eos) {
            val params = Map("per_page" -> perPage.toString) ++
              cursor.map("cursor" -> _).map(Seq(_)).getOrElse(
                Seq("start_time" -> startTime.toString)) ++
              (if (excludeDeleted) Seq("exclude_deleted" -> "true")
               else Seq.empty)
            val payload = api.getJson(
              s"$baseUrl/api/v2/incremental/tickets/cursor.json",
              params)
            writer.page(Extract.arr(payload, "tickets").map(Api.line))
            eos = payload.path("end_of_stream").asBoolean(false)
            val next = cursorOf(payload)
            next.foreach(c => lastCursor = Some(c))
            if (!eos) {
              if (next.isEmpty)
                throw new java.io.IOException(
                  "Missing after_cursor (and not end_of_stream); " +
                    "refusing to truncate the ticket export silently")
              cursor = next
            }
          }
          val doc = Api.mapper.createObjectNode()
          doc.put("mode", "cursor")
          lastCursor.foreach(doc.put("cursor", _))
          doc.put("start_time", startTime)
          doc.put("end_of_stream", eos)
          cursors.save(source, scope, "tickets", doc)
          "incremental_cursor"

        case e if timeBased.contains(e) =>
          val (path, root) = timeBased(e)
          val wm = cursors.load(source, scope, e)
          val startTime = wm.map(_.path("start_time").asLong(
            initialStartTime)).getOrElse(initialStartTime)
          var endTime = startTime
          var url = s"$baseUrl$path"
          var params = Map("start_time" -> startTime.toString,
            "per_page" -> perPage.toString)
          var done = false
          while (!done) {
            val payload = api.getJson(url, params)
            writer.page(Extract.arr(payload, root).map(Api.line))
            val et = payload.path("end_time")
            if (et.isNumber) endTime = et.asLong(endTime)
            val np = payload.path("next_page")
            if (payload.path("end_of_stream").asBoolean(false) ||
                !np.isTextual || np.asText.isEmpty) done = true
            else { url = np.asText; params = Map.empty }
          }
          val doc = Api.mapper.createObjectNode()
          doc.put("mode", "time")
          doc.put("start_time", endTime)
          cursors.save(source, scope, e, doc)
          "incremental_time"

        case e if snapshots.contains(e) =>
          val (path, root) = snapshots(e)
          var url = s"$baseUrl$path"
          var params = Map("per_page" -> perPage.toString)
          var done = false
          while (!done) {
            val payload = api.getJson(url, params)
            writer.page(Extract.arr(payload, root).map(Api.line))
            val np = payload.path("next_page")
            if (!np.isTextual || np.asText.isEmpty) done = true
            else { url = np.asText; params = Map.empty }
          }
          "snapshot"

        case other =>
          throw new IllegalArgumentException(
            s"unknown zendesk entity: $other")
      }
      val (records, parts) = writer.close()
      RunManifest.EntityReport(Some(scope), entity, mode, records,
        parts.toLong)
    }
    manifest.save(source, rid, started, now(), reports)
    reports
  }
}
