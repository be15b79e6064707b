package graft.gold

import graft.functions.{JsonOps, SafeCasts => SC}
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipedrive gold transformers (03_core_pipedrive.sql shapes).
  *
  * Silver is *versioned* (every blob/line kept, D3), so every
  * transformer starts with the keep-latest window over
  * (scope, payload id) ordered by loaded_at — the reference's CTE that
  * precedes all 13 upserts (normalize_pipedrive.py:122-133, D1). All
  * gold keys are composite (id, scope) per ADR-003 multi-tenancy.
  */
object Pipedrive {

  /** D1: latest version per (scope, id); ordering made total with the
    * lineage columns so replays can't flap between equal timestamps.
    *
    * Ordering is LOAD time (loaded_at), exactly the reference's policy
    * (normalize_pipedrive.py:122-133): a late-replayed stale blob wins,
    * and the protection against that is the extractor's watermark
    * ordering, not the dedup. An event-time policy would order by
    * payload update_time instead — deliberate deviation point. */
  def dedupLatest(silver: DataFrame): DataFrame =
    Dedup.keepLatest(
      silver.withColumn("id",
        SC.safeLong(get_json_object(col("raw_data"), "$.id"))),
      Seq("scope", "id"),
      Seq(col("loaded_at"), col("source_blob_path"), col("source_line_no")))

  /** Event-time variant: order by the payload's update_time first, so
    * a late-replayed stale blob canNOT overwrite a newer version (the
    * alternative policy to the reference's load-time ordering; see
    * dedupLatest). loaded_at + lineage remain as tie-breaks. */
  def dedupLatestEventTime(silver: DataFrame,
      eventTimePath: String = "$.update_time"): DataFrame =
    Dedup.keepLatest(
      silver.withColumn("id",
        SC.safeLong(get_json_object(col("raw_data"), "$.id"))),
      Seq("scope", "id"),
      Seq(SC.safeTimestamp(get_json_object(col("raw_data"), eventTimePath)),
        col("loaded_at"), col("source_blob_path"), col("source_line_no")))

  private def p(schema: String)(df: DataFrame): DataFrame =
    df.withColumn("p", graft.functions.JsonOps.parse(col("raw_data"), schema))

  private def audit: Seq[Column] = Seq(
    col("scope"), col("run_id").as("_source_run_id"),
    col("loaded_at").as("_loaded_at"), col("loaded_at").as("_updated_at"))

  /** core.pd_pipelines (03_core_pipedrive.sql:11-28). */
  def pipelines(silver: DataFrame): DataFrame =
    p("id STRING, name STRING, order_nr STRING, active STRING, " +
      "deleted STRING, add_time STRING, update_time STRING")(
      dedupLatest(silver))
      .select(Seq(
        col("id").as("pipeline_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeInt(col("p.order_nr")).as("order_nr"),
        SC.safeBool(col("p.active")).as("active"),
        SC.safeBool(col("p.deleted")).as("deleted"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"))
        ++ audit: _*)

  /** core.pd_stages (:35-54). */
  def stages(silver: DataFrame): DataFrame =
    p("id STRING, order_nr STRING, name STRING, active_flag STRING, " +
      "deal_probability STRING, pipeline_id STRING, rotten_flag STRING, " +
      "add_time STRING, update_time STRING")(dedupLatest(silver))
      .select(Seq(
        col("id").as("stage_id"),
        SC.safeInt(col("p.order_nr")).as("order_nr"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeBool(col("p.active_flag")).as("active_flag"),
        SC.safeInt(col("p.deal_probability")).as("deal_probability"),
        SC.safeLong(col("p.pipeline_id")).as("pipeline_id"),
        SC.safeBool(col("p.rotten_flag")).as("rotten_flag"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"))
        ++ audit: _*)

  /** core.pd_users (:63-87, full column set). */
  def users(silver: DataFrame): DataFrame =
    p("id STRING, name STRING, email STRING, phone STRING, " +
      "active_flag STRING, is_admin STRING, role_id STRING, " +
      "icon_url STRING, timezone_name STRING, timezone_offset STRING, " +
      "locale STRING, default_currency STRING, " +
      "created STRING, modified STRING, last_login STRING")(
      dedupLatest(silver))
      .select(Seq(
        col("id").as("user_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeText(col("p.email")).as("email"),
        SC.safeText(col("p.phone")).as("phone"),
        SC.safeBool(col("p.active_flag")).as("active_flag"),
        SC.safeBool(col("p.is_admin")).as("is_admin"),
        SC.safeLong(col("p.role_id")).as("role_id"),
        SC.safeText(col("p.icon_url")).as("icon_url"),
        SC.safeText(col("p.timezone_name")).as("timezone_name"),
        SC.safeText(col("p.timezone_offset")).as("timezone_offset"),
        SC.safeText(col("p.locale")).as("locale"),
        SC.safeText(col("p.default_currency")).as("default_currency"),
        SC.safeTimestamp(col("p.created")).as("created"),
        SC.safeTimestamp(col("p.modified")).as("modified"),
        SC.safeTimestamp(col("p.last_login")).as("last_login"))
        ++ audit: _*)

  /** Pipedrive-API standard org fields (normalize_pipedrive.py:400-414)
    * — the residual-exclusion set for custom_fields. */
  private val OrgStandard = Seq("id", "name", "owner_id", "owner_name",
    "address", "address_locality", "address_country",
    "address_postal_code", "cc_email", "active_flag",
    "people_count", "open_deals_count", "won_deals_count",
    "lost_deals_count", "add_time", "update_time", "visible_to",
    "next_activity_date", "next_activity_time", "next_activity_id",
    "last_activity_id", "last_activity_date", "activities_count",
    "done_activities_count", "undone_activities_count", "files_count",
    "notes_count", "followers_count", "email_messages_count",
    "picture_id", "related_closed_deals_count",
    "related_lost_deals_count", "related_open_deals_count",
    "related_won_deals_count", "label", "address_subpremise",
    "address_street_number", "address_route", "address_sublocality",
    "address_admin_area_level_1", "address_admin_area_level_2",
    "address_formatted_address", "deleted", "is_deleted")

  private val orgSchema: String =
    "id STRING, name STRING, owner_id STRING, address STRING, " +
      "address_subpremise STRING, address_street_number STRING, " +
      "address_route STRING, address_sublocality STRING, " +
      "address_locality STRING, address_admin_area_level_1 STRING, " +
      "address_admin_area_level_2 STRING, address_country STRING, " +
      "address_postal_code STRING, cc_email STRING, active_flag STRING, " +
      "people_count STRING, activities_count STRING, " +
      "done_activities_count STRING, undone_activities_count STRING, " +
      "files_count STRING, notes_count STRING, followers_count STRING, " +
      "won_deals_count STRING, lost_deals_count STRING, " +
      "open_deals_count STRING, related_open_deals_count STRING, " +
      "related_closed_deals_count STRING, related_won_deals_count STRING, " +
      "related_lost_deals_count STRING, " +
      "next_activity_date STRING, next_activity_time STRING, " +
      "next_activity_id STRING, last_activity_id STRING, " +
      "last_activity_date STRING, visible_to STRING, " +
      "add_time STRING, update_time STRING"

  /** core.pd_organizations (:96-148, full column set incl. the parsed
    * address block and 14 counters) with residual custom_fields (P6). */
  def organizations(silver: DataFrame): DataFrame =
    p(orgSchema)(dedupLatest(silver))
      .select(Seq(
        col("id").as("org_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeLong(col("p.owner_id")).as("owner_id"),
        SC.safeText(col("p.address")).as("address"),
        SC.safeText(col("p.address_subpremise")).as("address_subpremise"),
        SC.safeText(col("p.address_street_number"))
          .as("address_street_number"),
        SC.safeText(col("p.address_route")).as("address_route"),
        SC.safeText(col("p.address_sublocality")).as("address_sublocality"),
        SC.safeText(col("p.address_locality")).as("address_locality"),
        SC.safeText(col("p.address_admin_area_level_1"))
          .as("address_admin_area_level_1"),
        SC.safeText(col("p.address_admin_area_level_2"))
          .as("address_admin_area_level_2"),
        SC.safeText(col("p.address_country")).as("address_country"),
        SC.safeText(col("p.address_postal_code")).as("address_postal_code"),
        SC.safeText(col("p.cc_email")).as("cc_email"),
        // DDL default TRUE (:110)
        coalesce(SC.safeBool(col("p.active_flag")), lit(true))
          .as("active_flag"),
        SC.safeInt(col("p.people_count")).as("people_count"),
        SC.safeInt(col("p.activities_count")).as("activities_count"),
        SC.safeInt(col("p.done_activities_count"))
          .as("done_activities_count"),
        SC.safeInt(col("p.undone_activities_count"))
          .as("undone_activities_count"),
        SC.safeInt(col("p.files_count")).as("files_count"),
        SC.safeInt(col("p.notes_count")).as("notes_count"),
        SC.safeInt(col("p.followers_count")).as("followers_count"),
        SC.safeInt(col("p.won_deals_count")).as("won_deals_count"),
        SC.safeInt(col("p.lost_deals_count")).as("lost_deals_count"),
        SC.safeInt(col("p.open_deals_count")).as("open_deals_count"),
        SC.safeInt(col("p.related_open_deals_count"))
          .as("related_open_deals_count"),
        SC.safeInt(col("p.related_closed_deals_count"))
          .as("related_closed_deals_count"),
        SC.safeInt(col("p.related_won_deals_count"))
          .as("related_won_deals_count"),
        SC.safeInt(col("p.related_lost_deals_count"))
          .as("related_lost_deals_count"),
        SC.safeDate(col("p.next_activity_date")).as("next_activity_date"),
        SC.safeText(col("p.next_activity_time")).as("next_activity_time"),
        SC.safeLong(col("p.next_activity_id")).as("next_activity_id"),
        SC.safeLong(col("p.last_activity_id")).as("last_activity_id"),
        SC.safeDate(col("p.last_activity_date")).as("last_activity_date"),
        SC.safeInt(col("p.visible_to")).as("visible_to"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        JsonOps.residualJson(col("raw_data"), OrgStandard)
          .as("custom_fields")) ++ audit: _*)

  private val personContactT =
    "ARRAY<STRUCT<value: STRING, primary: BOOLEAN, label: STRING>>"

  /** Pipedrive-API standard person fields (normalize_pipedrive.py:
    * 531-546) — the residual-exclusion set for custom_fields. */
  private val PersonStandard = Seq("id", "name", "first_name", "last_name",
    "org_id", "owner_id", "email", "phone", "visible_to", "active_flag",
    "open_deals_count", "related_open_deals_count",
    "closed_deals_count", "related_closed_deals_count",
    "won_deals_count", "related_won_deals_count",
    "lost_deals_count", "related_lost_deals_count",
    "participant_open_deals_count", "participant_closed_deals_count",
    "add_time", "update_time", "activities_count",
    "done_activities_count", "undone_activities_count", "files_count",
    "notes_count", "followers_count", "email_messages_count",
    "last_activity_date", "next_activity_date", "next_activity_time",
    "next_activity_id", "last_activity_id",
    "picture_id", "label", "org_name", "owner_name", "cc_email",
    "primary_email", "marketing_status", "deleted", "is_deleted")

  private val personSchema: String =
    "id STRING, name STRING, first_name STRING, last_name STRING, " +
      s"owner_id STRING, org_id STRING, email $personContactT, " +
      s"phone $personContactT, active_flag STRING, label STRING, " +
      "open_deals_count STRING, related_open_deals_count STRING, " +
      "closed_deals_count STRING, related_closed_deals_count STRING, " +
      "participant_open_deals_count STRING, " +
      "participant_closed_deals_count STRING, activities_count STRING, " +
      "done_activities_count STRING, undone_activities_count STRING, " +
      "files_count STRING, notes_count STRING, followers_count STRING, " +
      "won_deals_count STRING, related_won_deals_count STRING, " +
      "lost_deals_count STRING, related_lost_deals_count STRING, " +
      "next_activity_date STRING, next_activity_time STRING, " +
      "next_activity_id STRING, last_activity_id STRING, " +
      "last_activity_date STRING, visible_to STRING, " +
      "add_time STRING, update_time STRING"

  /** core.pd_persons (:158-211, full column set): primary-else-first
    * email/phone (P5), raw arrays preserved as JSON text, 16 counters,
    * residual custom_fields (P6). */
  def persons(silver: DataFrame): DataFrame =
    p(personSchema)(dedupLatest(silver))
      .select(Seq(
        col("id").as("person_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeText(col("p.first_name")).as("first_name"),
        SC.safeText(col("p.last_name")).as("last_name"),
        SC.safeLong(col("p.owner_id")).as("owner_id"),
        SC.safeLong(col("p.org_id")).as("org_id"),
        JsonOps.primaryValue(col("p.email")).as("primary_email"),
        JsonOps.primaryValue(col("p.phone")).as("primary_phone"),
        SC.structText(col("p.email")).as("emails"),
        SC.structText(col("p.phone")).as("phones"),
        // DDL default TRUE (:173)
        coalesce(SC.safeBool(col("p.active_flag")), lit(true))
          .as("active_flag"),
        SC.safeLong(col("p.label")).as("label"),
        SC.safeInt(col("p.open_deals_count")).as("open_deals_count"),
        SC.safeInt(col("p.related_open_deals_count"))
          .as("related_open_deals_count"),
        SC.safeInt(col("p.closed_deals_count")).as("closed_deals_count"),
        SC.safeInt(col("p.related_closed_deals_count"))
          .as("related_closed_deals_count"),
        SC.safeInt(col("p.participant_open_deals_count"))
          .as("participant_open_deals_count"),
        SC.safeInt(col("p.participant_closed_deals_count"))
          .as("participant_closed_deals_count"),
        SC.safeInt(col("p.activities_count")).as("activities_count"),
        SC.safeInt(col("p.done_activities_count"))
          .as("done_activities_count"),
        SC.safeInt(col("p.undone_activities_count"))
          .as("undone_activities_count"),
        SC.safeInt(col("p.files_count")).as("files_count"),
        SC.safeInt(col("p.notes_count")).as("notes_count"),
        SC.safeInt(col("p.followers_count")).as("followers_count"),
        SC.safeInt(col("p.won_deals_count")).as("won_deals_count"),
        SC.safeInt(col("p.related_won_deals_count"))
          .as("related_won_deals_count"),
        SC.safeInt(col("p.lost_deals_count")).as("lost_deals_count"),
        SC.safeInt(col("p.related_lost_deals_count"))
          .as("related_lost_deals_count"),
        SC.safeDate(col("p.next_activity_date")).as("next_activity_date"),
        SC.safeText(col("p.next_activity_time")).as("next_activity_time"),
        SC.safeLong(col("p.next_activity_id")).as("next_activity_id"),
        SC.safeLong(col("p.last_activity_id")).as("last_activity_id"),
        SC.safeDate(col("p.last_activity_date")).as("last_activity_date"),
        SC.safeInt(col("p.visible_to")).as("visible_to"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        JsonOps.residualJson(col("raw_data"), PersonStandard)
          .as("custom_fields")) ++ audit: _*)

  /** Pipedrive-API standard deal fields (normalize_pipedrive.py:710-726)
    * — everything else lands in residual custom_fields (P6). */
  private val DealStandard = Seq("id", "title", "value", "currency",
    "status", "person_id", "org_id", "user_id", "pipeline_id", "stage_id",
    "expected_close_date", "probability", "won_time", "lost_time",
    "close_time", "add_time", "update_time", "stage_change_time",
    "lost_reason", "visible_to",
    "activities_count", "done_activities_count", "undone_activities_count",
    "participants_count", "files_count", "notes_count", "followers_count",
    "email_messages_count", "products_count",
    "next_activity_date", "next_activity_id", "next_activity_subject",
    "next_activity_type", "next_activity_duration", "next_activity_note",
    "next_activity_time", "last_activity_id", "last_activity_date",
    "origin", "origin_id", "channel", "channel_id",
    "creator_user_id", "person_name", "org_name", "stage_order_nr",
    "owner_name", "formatted_value", "weighted_value",
    "weighted_value_currency", "formatted_weighted_value", "rotten_time",
    "cc_email", "org_hidden", "person_hidden", "last_incoming_mail_time",
    "last_outgoing_mail_time", "label", "local_won_date", "local_lost_date",
    "local_close_date", "first_won_time", "active", "deleted",
    "renewal_type", "stage_id_before_last_stage_change", "acv", "arr",
    "mrr", "is_deleted")

  /** Scalar deal fields parsed in ONE from_json pass (a
    * get_json_object per column would re-parse the payload ~50×/row).
    * `value` stays OUT of this schema: the ADR-002 drift case sends
    * {"value":1500,"currency":"BRL"} where a STRING leaf would null
    * out, so it goes through get_json_object + SafeCasts' unwrap. */
  private val dealSchema: String =
    "title STRING, status STRING, currency STRING, " +
      "weighted_value STRING, weighted_value_currency STRING, " +
      "person_id STRING, org_id STRING, user_id STRING, " +
      "pipeline_id STRING, stage_id STRING, " +
      "add_time STRING, update_time STRING, stage_change_time STRING, " +
      "expected_close_date STRING, close_time STRING, " +
      "won_time STRING, lost_time STRING, first_won_time STRING, " +
      "lost_reason STRING, active STRING, deleted STRING, " +
      "probability STRING, stage_order_nr STRING, rotten_time STRING, " +
      "visible_to STRING, " +
      "activities_count STRING, done_activities_count STRING, " +
      "undone_activities_count STRING, participants_count STRING, " +
      "files_count STRING, notes_count STRING, followers_count STRING, " +
      "email_messages_count STRING, products_count STRING, " +
      "next_activity_id STRING, next_activity_subject STRING, " +
      "next_activity_type STRING, next_activity_duration STRING, " +
      "next_activity_note STRING, next_activity_time STRING, " +
      "next_activity_date STRING, " +
      "last_activity_id STRING, last_activity_date STRING, " +
      "origin STRING, origin_id STRING, channel STRING, channel_id STRING"

  /** core.pd_deals (03_core_pipedrive.sql:222-302, full column set):
    * dict-drift tolerant value cast, residual custom_fields.
    * next_activity_duration / next_activity_time are TIME in the
    * reference DDL; Spark has no TIME type, so they stay TEXT
    * ("HH:MM:SS" verbatim) — documented deviation. */
  def deals(silver: DataFrame): DataFrame =
    p(dealSchema)(dedupLatest(silver))
      .select(Seq(
        col("id").as("deal_id"),
        SC.safeText(col("p.title")).as("title"),
        SC.safeText(col("p.status")).as("status"),
        SC.safeDecimal(get_json_object(col("raw_data"), "$.value"), 18, 2)
          .as("value"),
        coalesce(
          SC.safeText(col("p.currency")),
          SC.safeText(get_json_object(col("raw_data"), "$.value.currency")))
          .as("currency"),
        SC.safeDecimal(col("p.weighted_value"), 18, 2).as("weighted_value"),
        SC.safeText(col("p.weighted_value_currency"))
          .as("weighted_value_currency"),
        SC.safeLong(col("p.person_id")).as("person_id"),
        SC.safeLong(col("p.org_id")).as("org_id"),
        SC.safeLong(col("p.user_id")).as("user_id"),
        SC.safeLong(col("p.pipeline_id")).as("pipeline_id"),
        SC.safeLong(col("p.stage_id")).as("stage_id"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        SC.safeTimestamp(col("p.stage_change_time")).as("stage_change_time"),
        SC.safeDate(col("p.expected_close_date")).as("expected_close_date"),
        SC.safeTimestamp(col("p.close_time")).as("close_time"),
        SC.safeTimestamp(col("p.won_time")).as("won_time"),
        SC.safeTimestamp(col("p.lost_time")).as("lost_time"),
        SC.safeTimestamp(col("p.first_won_time")).as("first_won_time"),
        SC.safeText(col("p.lost_reason")).as("lost_reason"),
        // DDL defaults: active TRUE, deleted FALSE (:255-256)
        coalesce(SC.safeBool(col("p.active")), lit(true)).as("active"),
        coalesce(SC.safeBool(col("p.deleted")), lit(false)).as("deleted"),
        SC.safeDecimal(col("p.probability"), 5, 2).as("probability"),
        SC.safeInt(col("p.stage_order_nr")).as("stage_order_nr"),
        SC.safeTimestamp(col("p.rotten_time")).as("rotten_time"),
        SC.safeInt(col("p.visible_to")).as("visible_to"),
        SC.safeInt(col("p.activities_count")).as("activities_count"),
        SC.safeInt(col("p.done_activities_count"))
          .as("done_activities_count"),
        SC.safeInt(col("p.undone_activities_count"))
          .as("undone_activities_count"),
        SC.safeInt(col("p.participants_count")).as("participants_count"),
        SC.safeInt(col("p.files_count")).as("files_count"),
        SC.safeInt(col("p.notes_count")).as("notes_count"),
        SC.safeInt(col("p.followers_count")).as("followers_count"),
        SC.safeInt(col("p.email_messages_count"))
          .as("email_messages_count"),
        SC.safeInt(col("p.products_count")).as("products_count"),
        SC.safeLong(col("p.next_activity_id")).as("next_activity_id"),
        SC.safeText(col("p.next_activity_subject"))
          .as("next_activity_subject"),
        SC.safeText(col("p.next_activity_type")).as("next_activity_type"),
        SC.safeText(col("p.next_activity_duration"))
          .as("next_activity_duration"),
        SC.safeText(col("p.next_activity_note")).as("next_activity_note"),
        SC.safeText(col("p.next_activity_time")).as("next_activity_time"),
        SC.safeDate(col("p.next_activity_date")).as("next_activity_date"),
        SC.safeLong(col("p.last_activity_id")).as("last_activity_id"),
        SC.safeDate(col("p.last_activity_date")).as("last_activity_date"),
        SC.safeText(col("p.origin")).as("origin"),
        SC.safeText(col("p.origin_id")).as("origin_id"),
        SC.safeLong(col("p.channel")).as("channel"),
        SC.safeText(col("p.channel_id")).as("channel_id"),
        JsonOps.residualJson(col("raw_data"), DealStandard)
          .as("custom_fields")) ++ audit: _*)

  private val activitySchema: String =
    "id STRING, type STRING, subject STRING, note STRING, " +
      "done STRING, busy_flag STRING, " +
      "user_id STRING, deal_id STRING, person_id STRING, org_id STRING, " +
      "lead_id STRING, project_id STRING, assigned_to_user_id STRING, " +
      "due_date STRING, add_time STRING, " +
      "marked_as_done_time STRING, update_time STRING, " +
      "location_subpremise STRING, location_street_number STRING, " +
      "location_route STRING, location_sublocality STRING, " +
      "location_locality STRING, location_admin_area_level_1 STRING, " +
      "location_admin_area_level_2 STRING, location_country STRING, " +
      "location_postal_code STRING, location_formatted_address STRING, " +
      "conference_meeting_client STRING, conference_meeting_url STRING, " +
      "conference_meeting_id STRING, public_description STRING, " +
      "active_flag STRING"

  /** core.pd_activities (:321-381, full column set): dict-valued
    * due_time/duration/location pass through safeText's
    * unwrap-or-serialize (so they stay OUT of the parsed schema);
    * participants/attendees ride along as raw JSON. due_time/duration
    * are TIME in the DDL — Spark has no TIME type, kept as TEXT. */
  def activities(silver: DataFrame): DataFrame =
    p(activitySchema)(dedupLatest(silver))
      .select(Seq(
        col("id").as("activity_id"),
        SC.safeText(col("p.type")).as("type"),
        SC.safeText(col("p.subject")).as("subject"),
        SC.safeText(col("p.note")).as("note"),
        SC.boolOrFalse(col("p.done")).as("done"),
        SC.safeBool(col("p.busy_flag")).as("busy_flag"),
        SC.safeLong(col("p.user_id")).as("user_id"),
        SC.safeLong(col("p.deal_id")).as("deal_id"),
        SC.safeLong(col("p.person_id")).as("person_id"),
        SC.safeLong(col("p.org_id")).as("org_id"),
        SC.safeText(col("p.lead_id")).as("lead_id"),
        SC.safeLong(col("p.project_id")).as("project_id"),
        SC.safeLong(col("p.assigned_to_user_id")).as("assigned_to_user_id"),
        SC.safeDate(col("p.due_date")).as("due_date"),
        SC.safeText(get_json_object(col("raw_data"), "$.due_time"))
          .as("due_time"),
        SC.safeText(get_json_object(col("raw_data"), "$.duration"))
          .as("duration"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.marked_as_done_time"))
          .as("marked_as_done_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        SC.safeText(get_json_object(col("raw_data"), "$.location"))
          .as("location"),
        SC.safeText(col("p.location_subpremise")).as("location_subpremise"),
        SC.safeText(col("p.location_street_number"))
          .as("location_street_number"),
        SC.safeText(col("p.location_route")).as("location_route"),
        SC.safeText(col("p.location_sublocality"))
          .as("location_sublocality"),
        SC.safeText(col("p.location_locality")).as("location_locality"),
        SC.safeText(col("p.location_admin_area_level_1"))
          .as("location_admin_area_level_1"),
        SC.safeText(col("p.location_admin_area_level_2"))
          .as("location_admin_area_level_2"),
        SC.safeText(col("p.location_country")).as("location_country"),
        SC.safeText(col("p.location_postal_code"))
          .as("location_postal_code"),
        SC.safeText(col("p.location_formatted_address"))
          .as("location_formatted_address"),
        get_json_object(col("raw_data"), "$.participants")
          .as("participants"),
        get_json_object(col("raw_data"), "$.attendees").as("attendees"),
        SC.safeText(col("p.conference_meeting_client"))
          .as("conference_meeting_client"),
        SC.safeText(col("p.conference_meeting_url"))
          .as("conference_meeting_url"),
        SC.safeText(col("p.conference_meeting_id"))
          .as("conference_meeting_id"),
        SC.safeText(col("p.public_description")).as("public_description"),
        SC.safeBool(col("p.active_flag")).as("active_flag"))
        ++ audit: _*)
}
