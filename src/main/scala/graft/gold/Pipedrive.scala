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

  /** core.pd_users (:63-87). */
  def users(silver: DataFrame): DataFrame =
    p("id STRING, name STRING, email STRING, active_flag STRING, " +
      "role_id STRING, created STRING, modified STRING")(dedupLatest(silver))
      .select(Seq(
        col("id").as("user_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeText(col("p.email")).as("email"),
        SC.safeBool(col("p.active_flag")).as("active_flag"),
        SC.safeLong(col("p.role_id")).as("role_id"),
        SC.safeTimestamp(col("p.created")).as("created"),
        SC.safeTimestamp(col("p.modified")).as("modified"))
        ++ audit: _*)

  private val OrgStandard = Seq("id", "name", "owner_id", "people_count",
    "open_deals_count", "address", "visible_to", "add_time", "update_time",
    "deleted", "is_deleted")

  /** core.pd_organizations (:96-148) with residual custom_fields (P6). */
  def organizations(silver: DataFrame): DataFrame =
    p("id STRING, name STRING, owner_id STRING, people_count STRING, " +
      "open_deals_count STRING, address STRING, visible_to STRING, " +
      "add_time STRING, update_time STRING")(dedupLatest(silver))
      .select(Seq(
        col("id").as("org_id"),
        SC.safeText(col("p.name")).as("name"),
        SC.safeLong(col("p.owner_id")).as("owner_id"),
        SC.safeInt(col("p.people_count")).as("people_count"),
        SC.safeInt(col("p.open_deals_count")).as("open_deals_count"),
        SC.safeText(col("p.address")).as("address"),
        SC.safeInt(col("p.visible_to")).as("visible_to"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        JsonOps.residualJson(col("raw_data"), OrgStandard)
          .as("custom_fields")) ++ audit: _*)

  private val personContactT =
    "ARRAY<STRUCT<value: STRING, primary: BOOLEAN, label: STRING>>"

  private val PersonStandard = Seq("id", "name", "first_name", "last_name",
    "owner_id", "org_id", "email", "phone", "visible_to", "add_time",
    "update_time", "deleted", "is_deleted")

  /** core.pd_persons (:158-211): primary-else-first email/phone (P5),
    * raw arrays preserved as JSON text, residual custom_fields (P6). */
  def persons(silver: DataFrame): DataFrame =
    p("id STRING, name STRING, first_name STRING, last_name STRING, " +
      s"owner_id STRING, org_id STRING, email $personContactT, " +
      s"phone $personContactT, visible_to STRING, add_time STRING, " +
      "update_time STRING")(dedupLatest(silver))
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
        SC.safeInt(col("p.visible_to")).as("visible_to"),
        SC.safeTimestamp(col("p.add_time")).as("add_time"),
        SC.safeTimestamp(col("p.update_time")).as("update_time"),
        JsonOps.residualJson(col("raw_data"), PersonStandard)
          .as("custom_fields")) ++ audit: _*)

  private val DealStandard = Seq("id", "title", "value", "currency",
    "status", "person_id", "org_id", "user_id", "pipeline_id", "stage_id",
    "expected_close_date", "probability", "won_time", "lost_time",
    "close_time", "add_time", "update_time", "stage_change_time",
    "lost_reason", "visible_to", "activities_count", "origin", "channel",
    "deleted", "is_deleted")

  /** core.pd_deals (:222-302): dict-drift tolerant value cast (the
    * ADR-002 {"value":1500,"currency":"BRL"} case goes through
    * SafeCasts' unwrap), residual custom_fields. */
  def deals(silver: DataFrame): DataFrame =
    dedupLatest(silver)
      .select(Seq(
        col("id").as("deal_id"),
        SC.safeText(get_json_object(col("raw_data"), "$.title")).as("title"),
        SC.safeDecimal(get_json_object(col("raw_data"), "$.value"), 18, 2)
          .as("value"),
        coalesce(
          SC.safeText(get_json_object(col("raw_data"), "$.currency")),
          SC.safeText(get_json_object(col("raw_data"), "$.value.currency")))
          .as("currency"),
        SC.safeText(get_json_object(col("raw_data"), "$.status")).as("status"),
        SC.safeLong(get_json_object(col("raw_data"), "$.person_id"))
          .as("person_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.org_id")).as("org_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.user_id"))
          .as("user_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.pipeline_id"))
          .as("pipeline_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.stage_id"))
          .as("stage_id"),
        SC.safeDate(get_json_object(col("raw_data"), "$.expected_close_date"))
          .as("expected_close_date"),
        SC.safeInt(get_json_object(col("raw_data"), "$.probability"))
          .as("probability"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.won_time"))
          .as("won_time"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.lost_time"))
          .as("lost_time"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.close_time"))
          .as("close_time"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.add_time"))
          .as("add_time"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.update_time"))
          .as("update_time"),
        SC.safeTimestamp(
          get_json_object(col("raw_data"), "$.stage_change_time"))
          .as("stage_change_time"),
        SC.safeText(get_json_object(col("raw_data"), "$.lost_reason"))
          .as("lost_reason"),
        SC.safeInt(get_json_object(col("raw_data"), "$.visible_to"))
          .as("visible_to"),
        SC.safeInt(get_json_object(col("raw_data"), "$.activities_count"))
          .as("activities_count"),
        SC.safeText(get_json_object(col("raw_data"), "$.origin")).as("origin"),
        SC.safeText(get_json_object(col("raw_data"), "$.channel"))
          .as("channel"),
        JsonOps.residualJson(col("raw_data"), DealStandard)
          .as("custom_fields")) ++ audit: _*)

  /** core.pd_activities (:321-381): dict-valued due_time/duration/
    * location pass through safeText's unwrap-or-serialize. */
  def activities(silver: DataFrame): DataFrame =
    dedupLatest(silver)
      .select(Seq(
        col("id").as("activity_id"),
        SC.safeText(get_json_object(col("raw_data"), "$.type")).as("type"),
        SC.safeText(get_json_object(col("raw_data"), "$.subject"))
          .as("subject"),
        SC.boolOrFalse(get_json_object(col("raw_data"), "$.done")).as("done"),
        SC.safeDate(get_json_object(col("raw_data"), "$.due_date"))
          .as("due_date"),
        SC.safeText(get_json_object(col("raw_data"), "$.due_time"))
          .as("due_time"),
        SC.safeText(get_json_object(col("raw_data"), "$.duration"))
          .as("duration"),
        SC.safeLong(get_json_object(col("raw_data"), "$.deal_id"))
          .as("deal_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.person_id"))
          .as("person_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.org_id")).as("org_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.user_id"))
          .as("user_id"),
        SC.safeLong(get_json_object(col("raw_data"), "$.assigned_to_user_id"))
          .as("assigned_to_user_id"),
        SC.safeTimestamp(
          get_json_object(col("raw_data"), "$.marked_as_done_time"))
          .as("marked_as_done_time"),
        SC.safeText(get_json_object(col("raw_data"), "$.location"))
          .as("location"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.add_time"))
          .as("add_time"),
        SC.safeTimestamp(get_json_object(col("raw_data"), "$.update_time"))
          .as("update_time")) ++ audit: _*)
}
