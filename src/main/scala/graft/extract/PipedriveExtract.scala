package graft.extract

import com.fasterxml.jackson.databind.JsonNode
import graft.sources.{RunManifest, WatermarkStore}
import org.apache.spark.sql.SparkSession

/** Pipedrive bronze extractor — the driver-side puller the reference
  * runs per scope (pipedrive_bronze.py run_scope:201-276):
  *
  *  - deals / persons / organizations / activities: INCREMENTAL
  *    cursor-paged v2 export, `updated_since` = saved watermark minus
  *    the 5-minute overlap, `updated_until` = the run instant, pages
  *    followed via `additional_data.next_cursor` (iter_cursor_pages,
  *    :95-113), deleted rows filtered per page;
  *  - pipelines / stages: SNAPSHOT through the same cursor pager (no
  *    since/until);
  *  - users: one-shot v1 snapshot (:114-117).
  *
  * Pages buffer into gzip JSONL parts (batch_pages / max_buffer
  * budgets) under the exact bronze layout `Bronze.read` lists, the
  * per-entity watermark advances to the run instant only after the
  * entity lands, and the run manifest records (records, parts) per
  * entity. The clock is injected so specs get replayable run ids.
  */
final class PipedriveExtractor(spark: SparkSession, api: RetryingApi,
    baseUrlV2: String, baseUrlV1: String, lakeBase: String,
    overlapMinutes: Int = 5, batchPages: Int = 5,
    maxBufferRecords: Int = 10000, pageLimit: Int = 500,
    now: () => java.time.Instant = () => java.time.Instant.now()) {

  private val source = "pipedrive"
  private val watermarks = new WatermarkStore(spark, lakeBase)
  private val manifest = new RunManifest(spark, lakeBase)

  private val incrementalEntities =
    Set("deals", "persons", "organizations", "activities")
  private val entityPaths = Map(
    "deals" -> "/deals", "persons" -> "/persons",
    "organizations" -> "/organizations",
    "activities" -> "/activities", "pipelines" -> "/pipelines",
    "stages" -> "/stages")

  /** Cursor pages of one v2 endpoint: (data rows, next cursor). */
  private def cursorPages(path: String,
      params: Map[String, String]): Iterator[Seq[JsonNode]] =
    new Iterator[Seq[JsonNode]] {
      private var cursor: Option[String] = None
      private var exhausted = false
      def hasNext: Boolean = !exhausted
      def next(): Seq[JsonNode] = {
        val q = params ++ Map("limit" -> pageLimit.toString) ++
          cursor.map("cursor" -> _)
        val payload = api.getJson(s"$baseUrlV2$path", q)
        val rows = Extract.arr(payload, "data")
        val nc = payload.path("additional_data").path("next_cursor")
        cursor =
          if (nc.isTextual && nc.asText.nonEmpty) Some(nc.asText)
          else None
        if (cursor.isEmpty) exhausted = true
        rows
      }
    }

  private def entityParams(entity: String,
      since: Option[java.time.Instant],
      until: java.time.Instant): Map[String, String] = {
    val window =
      since.map(s => Map("updated_since" -> s.toString))
        .getOrElse(Map.empty) ++ Map("updated_until" -> until.toString)
    entity match {
      case "deals" =>
        Map("status" -> "open,won,lost", "sort_by" -> "update_time",
          "sort_direction" -> "asc") ++ window
      case "persons" | "organizations" | "activities" =>
        Map("sort_by" -> "update_time",
          "sort_direction" -> "asc") ++ window
      case _ => Map.empty // snapshots: no window
    }
  }

  /** Run one scope over `entities`; returns the manifest reports
    * (also persisted via RunManifest under the shared run id). */
  def runScope(scope: String, entities: Seq[String])
      : Seq[RunManifest.EntityReport] = {
    val until = now()
    val rid = Extract.runId(until)
    val idate = Extract.ingestionDate(until)

    val reports = entities.map { entity =>
      val writer = new BronzePartWriter(spark, lakeBase, source, scope,
        entity, idate, rid, batchPages, maxBufferRecords)
      val mode =
        if (entity == "users") {
          val payload = api.getJson(s"$baseUrlV1/users", Map.empty)
          writer.page(Extract.arr(payload, "data").map(Api.line))
          "snapshot"
        } else if (incrementalEntities(entity)) {
          val since = watermarks.load(source, scope, entity,
            java.time.Duration.ofMinutes(overlapMinutes.toLong))
          cursorPages(entityPaths(entity),
            entityParams(entity, since, until))
            .foreach(rows =>
              writer.page(Extract.dropDeleted(rows).map(Api.line)))
          "incremental"
        } else {
          cursorPages(entityPaths(entity), Map.empty)
            .foreach(rows => writer.page(rows.map(Api.line)))
          "snapshot"
        }
      val (records, parts) = writer.close()
      // watermark only advances once the entity's parts are down —
      // a crash mid-entity re-extracts from the previous watermark
      // (plus overlap), and the (blob, line) staging dedup absorbs
      // the replayed rows
      watermarks.save(source, scope, entity, until)
      RunManifest.EntityReport(Some(scope), entity, mode, records,
        parts.toLong)
    }
    manifest.save(source, rid, until, now(), reports)
    reports
  }
}
