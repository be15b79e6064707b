package graft

import graft.gold.{Evo, Pipedrive, Zendesk}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-width parity gate: every business column of the reference's
  * gold DDL must exist in the corresponding transformer's output, so
  * any reference BI query can run unchanged. Lists are transcribed from
  * the reference schemas (file:line cited per table); audit columns are
  * asserted once via `auditCols`.
  */
class GoldParitySpec extends SparkSpec {
  import spark.implicits._

  private val auditCols = Seq("_source_run_id", "_loaded_at", "_updated_at")

  private def evoSilver: DataFrame =
    Seq(("{}", "r1")).toDF("raw_data", "run_id")
      .withColumn("_loaded_at", current_timestamp())
      .withColumn("_updated_at", current_timestamp())

  private def versionedSilver(scoped: Boolean): DataFrame = {
    val base = Seq(("{}", "blob", 1, "r1")).toDF(
      "raw_data", "source_blob_path", "source_line_no", "run_id")
      .withColumn("loaded_at", current_timestamp())
    if (scoped) base.withColumn("scope", lit("comercial")) else base
  }

  private def assertCovers(name: String, df: DataFrame,
      expected: Seq[String], audit: Boolean = true): Unit = {
    val have = df.columns.toSet
    val want = expected ++ (if (audit) auditCols else Nil)
    val missing = want.filterNot(have.contains)
    assert(missing.isEmpty, s"$name missing reference columns: $missing")
  }

  test("EVO gold tables carry every reference business column") {
    // evo_schemas.sql:287-348
    assertCovers("evo_members", Evo.members(evoSilver), Seq(
      "member_id", "branch_id", "branch_name", "first_name", "last_name",
      "full_name", "register_name", "register_last_name",
      "use_preferred_name", "document", "document_id", "email",
      "cellphone", "gender", "birth_date", "marital_status", "address",
      "address_number", "complement", "neighborhood", "city", "state",
      "country", "zip_code", "access_card_number", "access_blocked",
      "blocked_reason", "status", "membership_status", "penalized",
      "total_fit_coins", "register_date", "conversion_date",
      "last_access_date", "update_date", "photo_url", "gympass_id",
      "code_totalpass", "user_id_gurupass",
      "client_with_promotional_restriction", "personal_trainer",
      "personal_type", "cref", "cref_expiration_date",
      "employee_consultant_id", "employee_consultant_name",
      "employee_instructor_id", "employee_instructor_name",
      "employee_personal_id", "employee_personal_name",
      "member_migration_id"))
    // evo_schemas.sql:351-401 (id SERIAL omitted — no semantic content)
    assertCovers("evo_member_memberships",
      Evo.memberMemberships(evoSilver), Seq(
        "member_membership_id", "member_id", "membership_id",
        "membership_name", "membership_renewed_id", "sale_id",
        "sale_date", "start_date", "end_date", "cancel_date",
        "cancel_date_on", "cancel_creation_date", "membership_status",
        "value_next_month", "original_value", "next_charge",
        "next_date_suspension", "category_membership_id",
        "loyalty_end_date", "assessment_end_date", "acceptance_date",
        "num_members", "fl_allow_locker", "fl_additional_membership",
        "allow_les_mills", "allows_cancellation_by_app", "signed_terms",
        "limitless", "weekly_limit", "bioimpedance_amount",
        "concluded_sessions", "pending_sessions", "scheduled_sessions",
        "pending_repositions", "repositions_total", "bonus_sessions",
        "number_suspension_times", "max_suspension_days",
        "minimum_suspension_days", "disponible_suspension_days",
        "disponible_suspension_times", "days_left_to_freeze",
        "contract_printing", "freezes", "sessions"))
    // evo_schemas.sql:153-188
    assertCovers("evo_prospects", Evo.prospects(evoSilver), Seq(
      "prospect_id", "branch_id", "branch_name", "first_name",
      "last_name", "full_name", "document", "email", "cellphone",
      "gender", "birth_date", "address", "address_number", "complement",
      "neighborhood", "city", "state", "country", "zip_code",
      "signup_type", "mkt_channel", "current_step", "gympass_id",
      "conversion_date", "member_id", "is_converted", "responsible_name",
      "responsible_document", "responsible_is_financial", "register_date",
      "custom_fields"))
    // evo_schemas.sql:191-219
    assertCovers("evo_sales", Evo.sales(evoSilver), Seq(
      "sale_id", "member_id", "prospect_id", "employee_id",
      "employee_sale_id", "employee_sale_name", "personal_id",
      "branch_id", "sale_date", "sale_date_server", "update_date",
      "sale_source", "observations", "corporate_partnership_id",
      "corporate_partnership_name", "sale_recurrency_id", "removed",
      "removal_date", "employee_removal_id", "sale_migration_id",
      "cart_token"))
    // evo_schemas.sql:222-255
    assertCovers("evo_sale_items", Evo.saleItems(evoSilver), Seq(
      "sale_item_id", "sale_id", "description", "item", "item_value",
      "sale_value", "sale_value_without_credit", "quantity", "discount",
      "corporate_discount", "tax", "value_next_month", "membership_id",
      "membership_renewed_id", "member_membership_id", "product_id",
      "service_id", "corporate_partnership_id",
      "corporate_partnership_name", "membership_start_date",
      "num_members", "voucher", "accounting_code",
      "municipal_service_code", "fl_receipt_only", "fl_swimming",
      "fl_allow_locker", "sale_item_migration_id"))
    // evo_schemas.sql:258-284
    assertCovers("evo_receivables", Evo.receivables(evoSilver), Seq(
      "receivable_id", "sale_id", "registration_date", "due_date",
      "receiving_date", "cancellation_date", "update_date", "amount",
      "amount_paid", "status_id", "status_name", "current_installment",
      "total_installments", "payment_type_id", "payment_type_name",
      "authorization", "tid", "nsu", "card_flag", "transaction_token"))
    // evo_schemas.sql:417-462
    assertCovers("evo_entries", Evo.entries(evoSilver), Seq(
      "entry_id", "entry_date", "entry_year", "member_id", "member_name",
      "prospect_id", "prospect_name", "employee_id", "employee_name",
      "branch_id", "entry_type", "entry_action", "device",
      "block_reason", "migration_id"))
  }

  test("Pipedrive gold tables carry every reference business column") {
    val s = versionedSilver(scoped = true)
    // 03_core_pipedrive.sql:11-28
    assertCovers("pd_pipelines", Pipedrive.pipelines(s), Seq(
      "pipeline_id", "scope", "name", "order_nr", "active", "deleted",
      "add_time", "update_time"))
    // :35-54
    assertCovers("pd_stages", Pipedrive.stages(s), Seq(
      "stage_id", "scope", "name", "order_nr", "active_flag",
      "deal_probability", "pipeline_id", "rotten_flag", "add_time",
      "update_time"))
    // :63-87
    assertCovers("pd_users", Pipedrive.users(s), Seq(
      "user_id", "scope", "name", "email", "phone", "active_flag",
      "is_admin", "role_id", "icon_url", "timezone_name",
      "timezone_offset", "locale", "default_currency", "created",
      "modified", "last_login"))
    // :96-148
    assertCovers("pd_organizations", Pipedrive.organizations(s), Seq(
      "org_id", "scope", "name", "owner_id", "address",
      "address_subpremise", "address_street_number", "address_route",
      "address_sublocality", "address_locality",
      "address_admin_area_level_1", "address_admin_area_level_2",
      "address_country", "address_postal_code", "cc_email",
      "active_flag", "people_count", "activities_count",
      "done_activities_count", "undone_activities_count", "files_count",
      "notes_count", "followers_count", "won_deals_count",
      "lost_deals_count", "open_deals_count", "related_open_deals_count",
      "related_closed_deals_count", "related_won_deals_count",
      "related_lost_deals_count", "next_activity_date",
      "next_activity_time", "next_activity_id", "last_activity_id",
      "last_activity_date", "add_time", "update_time", "custom_fields"))
    // :158-211
    assertCovers("pd_persons", Pipedrive.persons(s), Seq(
      "person_id", "scope", "name", "first_name", "last_name",
      "owner_id", "org_id", "primary_email", "primary_phone", "emails",
      "phones", "active_flag", "label", "open_deals_count",
      "related_open_deals_count", "closed_deals_count",
      "related_closed_deals_count", "participant_open_deals_count",
      "participant_closed_deals_count", "activities_count",
      "done_activities_count", "undone_activities_count", "files_count",
      "notes_count", "followers_count", "won_deals_count",
      "related_won_deals_count", "lost_deals_count",
      "related_lost_deals_count", "next_activity_date",
      "next_activity_time", "next_activity_id", "last_activity_id",
      "last_activity_date", "add_time", "update_time", "custom_fields"))
    // :222-302
    assertCovers("pd_deals", Pipedrive.deals(s), Seq(
      "deal_id", "scope", "title", "status", "value", "currency",
      "weighted_value", "weighted_value_currency", "person_id", "org_id",
      "user_id", "pipeline_id", "stage_id", "add_time", "update_time",
      "stage_change_time", "expected_close_date", "close_time",
      "won_time", "lost_time", "first_won_time", "lost_reason", "active",
      "deleted", "probability", "stage_order_nr", "rotten_time",
      "activities_count", "done_activities_count",
      "undone_activities_count", "participants_count", "files_count",
      "notes_count", "followers_count", "email_messages_count",
      "next_activity_id", "next_activity_subject", "next_activity_type",
      "next_activity_duration", "next_activity_note",
      "next_activity_time", "next_activity_date", "last_activity_id",
      "last_activity_date", "origin", "origin_id", "channel",
      "channel_id", "custom_fields"))
    // :321-381
    assertCovers("pd_activities", Pipedrive.activities(s), Seq(
      "activity_id", "scope", "type", "subject", "note", "done",
      "busy_flag", "user_id", "deal_id", "person_id", "org_id",
      "lead_id", "project_id", "due_date", "due_time", "duration",
      "add_time", "marked_as_done_time", "update_time", "location",
      "location_subpremise", "location_street_number", "location_route",
      "location_sublocality", "location_locality",
      "location_admin_area_level_1", "location_admin_area_level_2",
      "location_country", "location_postal_code",
      "location_formatted_address", "participants", "attendees",
      "conference_meeting_client", "conference_meeting_url",
      "conference_meeting_id", "public_description", "active_flag"))
  }

  test("Zendesk gold tables carry every reference business column") {
    val s = versionedSilver(scoped = false)
    // 04_core_zendesk.sql:10-29
    assertCovers("zd_organizations", Zendesk.organizations(s), Seq(
      "organization_id", "name", "domain_names", "details", "notes",
      "group_id", "shared_tickets", "shared_comments", "tags",
      "organization_fields", "external_id", "created_at", "updated_at"))
    // :39-71
    assertCovers("zd_users", Zendesk.users(s), Seq(
      "user_id", "name", "email", "phone", "role", "organization_id",
      "time_zone", "locale", "active", "verified", "suspended", "tags",
      "user_fields", "external_id", "alias", "notes", "details",
      "default_group_id", "only_private_comments", "restricted_agent",
      "shared", "shared_agent", "signature", "ticket_restriction",
      "created_at", "updated_at", "last_login_at"))
    // :83-95
    assertCovers("zd_groups", Zendesk.groups(s), Seq(
      "group_id", "name", "description", "is_public", "deleted",
      "created_at", "updated_at"))
    // :102-126
    assertCovers("zd_ticket_fields", Zendesk.ticketFields(s), Seq(
      "field_id", "title", "type", "description", "position", "active",
      "required", "collapsed_for_agents", "regexp_for_validation",
      "title_in_portal", "visible_in_portal", "editable_in_portal",
      "required_in_portal", "tag", "custom_field_options",
      "system_field_options", "removable", "created_at", "updated_at"))
    // :133-151
    assertCovers("zd_ticket_forms", Zendesk.ticketForms(s), Seq(
      "form_id", "name", "display_name", "position", "active",
      "default_form", "end_user_visible", "in_all_brands", "raw_name",
      "raw_display_name", "ticket_field_ids", "created_at",
      "updated_at"))
    // :158-210
    assertCovers("zd_tickets", Zendesk.tickets(s), Seq(
      "ticket_id", "external_id", "subject", "description",
      "raw_subject", "status", "priority", "type", "requester_id",
      "submitter_id", "assignee_id", "organization_id", "group_id",
      "brand_id", "ticket_form_id", "is_public", "has_incidents",
      "allow_channelback", "allow_attachments", "satisfaction_rating",
      "satisfaction_score", "created_at", "updated_at", "due_at",
      "initially_assigned_at", "assigned_at", "solved_at", "via_channel",
      "via_source", "tags", "custom_fields"))
    // :228-268 bridges
    assertCovers("zd_ticket_tags", Zendesk.ticketTags(s),
      Seq("ticket_id", "tag"), audit = false)
    assertCovers("zd_ticket_collaborators", Zendesk.ticketCollaborators(s),
      Seq("ticket_id", "user_id"), audit = false)
    assertCovers("zd_ticket_followers", Zendesk.ticketFollowers(s),
      Seq("ticket_id", "user_id"), audit = false)
    // :275-285
    assertCovers("zd_ticket_custom_fields", Zendesk.ticketCustomFields(s),
      Seq("ticket_id", "field_id", "value"), audit = false)
  }
}
