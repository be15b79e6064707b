package graft.gold

import graft.functions.{SafeCasts => SC}
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zendesk gold transformers (04_core_zendesk.sql shapes): dims, the
  * tickets fact, and the four exploded bridge tables (E5/E6).
  * Silver is versioned without scope (02_stg_zendesk.sql:23).
  */
object Zendesk {

  /** D1 keep-latest per ticket/user/... id. Idempotent marker: silver
    * never carries an `id` column, so its presence means this frame is
    * ALREADY the deduped output — the pipeline dedups once, persists,
    * and feeds the same frame to every bridge transformer instead of
    * re-running the window per table. */
  def dedupLatest(silver: DataFrame): DataFrame =
    if (silver.columns.contains("id")) silver
    else Dedup.keepLatest(
      silver.withColumn("id",
        SC.safeLong(get_json_object(col("raw_data"), "$.id"))),
      Seq("id"),
      Seq(col("loaded_at"), col("source_blob_path"), col("source_line_no")))

  private def audit: Seq[Column] = Seq(
    col("run_id").as("_source_run_id"),
    col("loaded_at").as("_loaded_at"), col("loaded_at").as("_updated_at"))

  private def j(field: String): Column =
    get_json_object(col("raw_data"), s"$$.$field")

  /** core.zd_organizations (:10-29, full column set). */
  def organizations(silver: DataFrame): DataFrame =
    dedupLatest(silver).select(Seq(
      col("id").as("organization_id"),
      SC.safeText(j("name")).as("name"),
      get_json_object(col("raw_data"), "$.domain_names").as("domain_names"),
      SC.safeText(j("details")).as("details"),
      SC.safeText(j("notes")).as("notes"),
      SC.safeLong(j("group_id")).as("group_id"),
      SC.safeBool(j("shared_tickets")).as("shared_tickets"),
      SC.safeBool(j("shared_comments")).as("shared_comments"),
      get_json_object(col("raw_data"), "$.tags").as("tags"),
      get_json_object(col("raw_data"), "$.organization_fields")
        .as("organization_fields"),
      SC.safeText(j("external_id")).as("external_id"),
      SC.safeTimestamp(j("created_at")).as("created_at"),
      SC.safeTimestamp(j("updated_at")).as("updated_at")) ++ audit: _*)

  private val userSchema: String =
    "name STRING, email STRING, phone STRING, role STRING, " +
      "organization_id STRING, time_zone STRING, locale STRING, " +
      "active STRING, verified STRING, suspended STRING, " +
      "external_id STRING, alias STRING, notes STRING, details STRING, " +
      "default_group_id STRING, only_private_comments STRING, " +
      "restricted_agent STRING, shared STRING, shared_agent STRING, " +
      "signature STRING, ticket_restriction STRING, " +
      "created_at STRING, updated_at STRING, last_login_at STRING"

  /** core.zd_users (:39-71, full column set; one from_json pass). */
  def users(silver: DataFrame): DataFrame =
    dedupLatest(silver)
      .withColumn("p",
        graft.functions.JsonOps.parse(col("raw_data"), userSchema))
      .select(Seq(
      col("id").as("user_id"),
      SC.safeText(col("p.name")).as("name"),
      SC.safeText(col("p.email")).as("email"),
      SC.safeText(col("p.phone")).as("phone"),
      SC.safeText(col("p.role")).as("role"),
      SC.safeLong(col("p.organization_id")).as("organization_id"),
      SC.safeText(col("p.time_zone")).as("time_zone"),
      SC.safeText(col("p.locale")).as("locale"),
      SC.safeBool(col("p.active")).as("active"),
      SC.safeBool(col("p.verified")).as("verified"),
      SC.safeBool(col("p.suspended")).as("suspended"),
      get_json_object(col("raw_data"), "$.tags").as("tags"),
      get_json_object(col("raw_data"), "$.user_fields").as("user_fields"),
      SC.safeText(col("p.external_id")).as("external_id"),
      SC.safeText(col("p.alias")).as("alias"),
      SC.safeText(col("p.notes")).as("notes"),
      SC.safeText(col("p.details")).as("details"),
      SC.safeLong(col("p.default_group_id")).as("default_group_id"),
      SC.safeBool(col("p.only_private_comments"))
        .as("only_private_comments"),
      SC.safeBool(col("p.restricted_agent")).as("restricted_agent"),
      SC.safeBool(col("p.shared")).as("shared"),
      SC.safeBool(col("p.shared_agent")).as("shared_agent"),
      SC.safeText(col("p.signature")).as("signature"),
      SC.safeText(col("p.ticket_restriction")).as("ticket_restriction"),
      SC.safeTimestamp(col("p.created_at")).as("created_at"),
      SC.safeTimestamp(col("p.updated_at")).as("updated_at"),
      SC.safeTimestamp(col("p.last_login_at")).as("last_login_at"))
      ++ audit: _*)

  /** core.zd_groups (:83-95). */
  def groups(silver: DataFrame): DataFrame =
    dedupLatest(silver).select(Seq(
      col("id").as("group_id"),
      SC.safeText(j("name")).as("name"),
      SC.safeText(j("description")).as("description"),
      SC.safeBool(j("is_public")).as("is_public"),
      // DDL default FALSE (:87)
      coalesce(SC.safeBool(j("deleted")), lit(false)).as("deleted"),
      SC.safeTimestamp(j("created_at")).as("created_at"),
      SC.safeTimestamp(j("updated_at")).as("updated_at")) ++ audit: _*)

  /** core.zd_ticket_fields (:102-126, full column set). */
  def ticketFields(silver: DataFrame): DataFrame =
    dedupLatest(silver).select(Seq(
      col("id").as("field_id"),
      SC.safeText(j("title")).as("title"),
      SC.safeText(j("type")).as("type"),
      SC.safeText(j("description")).as("description"),
      SC.safeInt(j("position")).as("position"),
      SC.safeBool(j("active")).as("active"),
      SC.safeBool(j("required")).as("required"),
      SC.safeBool(j("collapsed_for_agents")).as("collapsed_for_agents"),
      SC.safeText(j("regexp_for_validation")).as("regexp_for_validation"),
      SC.safeText(j("title_in_portal")).as("title_in_portal"),
      SC.safeBool(j("visible_in_portal")).as("visible_in_portal"),
      SC.safeBool(j("editable_in_portal")).as("editable_in_portal"),
      SC.safeBool(j("required_in_portal")).as("required_in_portal"),
      SC.safeText(j("tag")).as("tag"),
      get_json_object(col("raw_data"), "$.custom_field_options")
        .as("custom_field_options"),
      get_json_object(col("raw_data"), "$.system_field_options")
        .as("system_field_options"),
      SC.safeBool(j("removable")).as("removable"),
      SC.safeTimestamp(j("created_at")).as("created_at"),
      SC.safeTimestamp(j("updated_at")).as("updated_at")) ++ audit: _*)

  /** core.zd_ticket_forms (:133-151, full column set). */
  def ticketForms(silver: DataFrame): DataFrame =
    dedupLatest(silver).select(Seq(
      col("id").as("form_id"),
      SC.safeText(j("name")).as("name"),
      SC.safeText(j("display_name")).as("display_name"),
      SC.safeInt(j("position")).as("position"),
      SC.safeBool(j("active")).as("active"),
      SC.safeBool(j("default")).as("default_form"),
      SC.safeBool(j("end_user_visible")).as("end_user_visible"),
      SC.safeBool(j("in_all_brands")).as("in_all_brands"),
      SC.safeText(j("raw_name")).as("raw_name"),
      SC.safeText(j("raw_display_name")).as("raw_display_name"),
      get_json_object(col("raw_data"), "$.ticket_field_ids")
        .as("ticket_field_ids"),
      SC.safeTimestamp(j("created_at")).as("created_at"),
      SC.safeTimestamp(j("updated_at")).as("updated_at")) ++ audit: _*)

  /** Scalar ticket fields parsed in ONE from_json pass; residual JSON
    * columns (via_source, satisfaction_rating, tags, custom_fields)
    * stay on get_json_object — they pass through verbatim as JSONB
    * does in the reference. */
  private val ticketSchema: String =
    "subject STRING, raw_subject STRING, description STRING, " +
      "status STRING, priority STRING, type STRING, " +
      "requester_id STRING, submitter_id STRING, assignee_id STRING, " +
      "organization_id STRING, group_id STRING, brand_id STRING, " +
      "ticket_form_id STRING, external_id STRING, " +
      "via STRUCT<channel: STRING>, " +
      "is_public STRING, has_incidents STRING, " +
      "allow_channelback STRING, allow_attachments STRING, " +
      "satisfaction_rating STRUCT<score: STRING>, " +
      "created_at STRING, updated_at STRING, due_at STRING, " +
      "initially_assigned_at STRING, assigned_at STRING, solved_at STRING"

  /** core.zd_tickets (:158-210, full column set): nested via.channel /
    * via.source (P3), SLA timestamps (solved_at drives the
    * hours_to_resolution view — NULL while unsolved), satisfaction and
    * residual custom_fields/tags JSON. */
  def tickets(silver: DataFrame): DataFrame =
    dedupLatest(silver)
      .withColumn("p",
        graft.functions.JsonOps.parse(col("raw_data"), ticketSchema))
      .select(Seq(
      col("id").as("ticket_id"),
      SC.safeText(col("p.external_id")).as("external_id"),
      SC.safeText(col("p.subject")).as("subject"),
      SC.safeText(col("p.description")).as("description"),
      SC.safeText(col("p.raw_subject")).as("raw_subject"),
      SC.safeText(col("p.status")).as("status"),
      SC.safeText(col("p.priority")).as("priority"),
      SC.safeText(col("p.type")).as("type"),
      SC.safeLong(col("p.requester_id")).as("requester_id"),
      SC.safeLong(col("p.submitter_id")).as("submitter_id"),
      SC.safeLong(col("p.assignee_id")).as("assignee_id"),
      SC.safeLong(col("p.organization_id")).as("organization_id"),
      SC.safeLong(col("p.group_id")).as("group_id"),
      SC.safeLong(col("p.brand_id")).as("brand_id"),
      SC.safeLong(col("p.ticket_form_id")).as("ticket_form_id"),
      SC.safeBool(col("p.is_public")).as("is_public"),
      SC.safeBool(col("p.has_incidents")).as("has_incidents"),
      SC.safeBool(col("p.allow_channelback")).as("allow_channelback"),
      SC.safeBool(col("p.allow_attachments")).as("allow_attachments"),
      get_json_object(col("raw_data"), "$.satisfaction_rating")
        .as("satisfaction_rating"),
      SC.safeText(col("p.satisfaction_rating.score"))
        .as("satisfaction_score"),
      SC.safeTimestamp(col("p.created_at")).as("created_at"),
      SC.safeTimestamp(col("p.updated_at")).as("updated_at"),
      SC.safeTimestamp(col("p.due_at")).as("due_at"),
      SC.safeTimestamp(col("p.initially_assigned_at"))
        .as("initially_assigned_at"),
      SC.safeTimestamp(col("p.assigned_at")).as("assigned_at"),
      SC.safeTimestamp(col("p.solved_at")).as("solved_at"),
      SC.safeText(col("p.via.channel")).as("via_channel"),
      get_json_object(col("raw_data"), "$.via.source").as("via_source"),
      get_json_object(col("raw_data"), "$.tags").as("tags"),
      get_json_object(col("raw_data"), "$.custom_fields")
        .as("custom_fields")) ++ audit: _*)

  /** core.zd_ticket_tags (E5 + D4: explode text array, DISTINCT —
    * normalize_zendesk.py:705-762). */
  def ticketTags(silver: DataFrame): DataFrame =
    dedupLatest(silver)
      .withColumn("tags",
        graft.functions.JsonOps.parse(get_json_object(col("raw_data"), "$.tags"), "ARRAY<STRING>"))
      .filter(col("tags").isNotNull && size(col("tags")) > 0)
      .select(col("id").as("ticket_id"), explode(col("tags")).as("tag"))
      .distinct()

  /** core.zd_ticket_custom_fields (E6 + D5: explode struct array, drop
    * empty values, keep latest per (ticket_id, field_id) —
    * normalize_zendesk.py:764-829). Runs on the FULL versioned silver
    * (not dedupLatest) exactly like the reference: the latest non-empty
    * value per field wins by loaded_at. */
  def ticketCustomFields(silver: DataFrame): DataFrame = {
    val exploded = silver
      .withColumn("ticket_id",
        SC.safeLong(get_json_object(col("raw_data"), "$.id")))
      .withColumn("cf",
        graft.functions.JsonOps.parse(get_json_object(col("raw_data"), "$.custom_fields"), "ARRAY<STRUCT<id: STRING, value: STRING>>"))
      .filter(col("cf").isNotNull)
      .select(col("ticket_id"), explode(col("cf")).as("f"),
        col("run_id"),
        col("loaded_at"), col("source_blob_path"), col("source_line_no"))
      .select(col("ticket_id"),
        SC.safeLong(col("f.id")).as("field_id"),
        SC.safeText(col("f.value")).as("value"),
        col("run_id"),
        col("loaded_at"), col("source_blob_path"), col("source_line_no"))
      .filter(col("value").isNotNull) // empty-string values cleaned to NULL
    Dedup.keepLatest(exploded, Seq("ticket_id", "field_id"),
      Seq(col("loaded_at"), col("source_blob_path"), col("source_line_no")))
      .select(col("ticket_id"), col("field_id"), col("value"),
        col("run_id").as("_source_run_id"),
        col("loaded_at").as("_loaded_at"),
        col("loaded_at").as("_updated_at"))
  }

  /** core.zd_ticket_collaborators / followers (:245-268): id arrays. */
  private def idArrayBridge(silver: DataFrame, field: String,
      outCol: String): DataFrame =
    dedupLatest(silver)
      .withColumn("ids",
        graft.functions.JsonOps.parse(
          get_json_object(col("raw_data"), s"$$.$field"), "ARRAY<STRING>"))
      .filter(col("ids").isNotNull && size(col("ids")) > 0)
      .select(col("id").as("ticket_id"),
        explode(col("ids")).as("__v"))
      .select(col("ticket_id"), SC.safeLong(col("__v")).as(outCol))
      .distinct()

  def ticketCollaborators(silver: DataFrame): DataFrame =
    idArrayBridge(silver, "collaborator_ids", "user_id")

  def ticketFollowers(silver: DataFrame): DataFrame =
    idArrayBridge(silver, "follower_ids", "user_id")
}
