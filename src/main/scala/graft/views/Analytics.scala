package graft.views

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Analytics views over gold tables (SURVEY.md §2 J1–J5, A1–A11).
  * Pure DataFrame pipelines; dims are broadcast (they are tiny — 9
  * pipelines, 43 stages in the reference catalog).
  */
object Analytics {

  /** vw_pd_sales_funnel (03_core_pipedrive.sql:396-412): deals ⋈
    * pipelines ⋈ stages on composite (id, scope) + GROUP BY.
    * WHERE d.active = TRUE (:407) — dead deals never enter the funnel. */
  def salesFunnel(deals: DataFrame, pipelines: DataFrame,
      stages: DataFrame): DataFrame =
    deals
      .filter(col("active") === true)
      .join(broadcast(pipelines.select(col("pipeline_id"), col("scope"),
        col("name").as("pipeline_name"))), Seq("pipeline_id", "scope"))
      .join(broadcast(stages.select(col("stage_id"), col("scope"),
        col("name").as("stage_name"), col("order_nr"))),
        Seq("stage_id", "scope"))
      .groupBy("scope", "pipeline_name", "stage_name", "order_nr",
        "status", "currency")
      .agg(count(lit(1)).as("deal_count"),
        sum("value").as("total_value"),
        avg("value").as("avg_value"))
      .orderBy("scope", "pipeline_name", "order_nr")

  /** vw_pd_seller_performance (:417-435): filtered aggregates + win
    * rate with NULLIF guard. */
  def sellerPerformance(deals: DataFrame, users: DataFrame): DataFrame =
    deals
      .join(broadcast(users.select(col("user_id"), col("scope"),
        col("name").as("seller_name"))), Seq("user_id", "scope"))
      .groupBy("scope", "user_id", "seller_name")
      .agg(
        count(lit(1)).as("deal_count"),
        count(when(col("status") === "won", 1)).as("won_count"),
        count(when(col("status") === "lost", 1)).as("lost_count"),
        sum(when(col("status") === "won", col("value"))).as("won_value"))
      .withColumn("win_rate",
        round(lit(100.0) * col("won_count").cast("double") /
          nullif(col("won_count") + col("lost_count"), lit(0)), 2))

  /** vw_zd_ticket_metrics (04_core_zendesk.sql:296-336): multi-way LEFT
    * JOIN star (users twice under different roles) + duration math. */
  def ticketMetrics(tickets: DataFrame, users: DataFrame,
      organizations: DataFrame, groups: DataFrame): DataFrame = {
    val requesters = users.select(col("user_id").as("requester_id"),
      col("name").as("requester_name"))
    val assignees = users.select(col("user_id").as("assignee_id"),
      col("name").as("assignee_name"))
    tickets
      .join(broadcast(requesters), Seq("requester_id"), "left")
      .join(broadcast(assignees), Seq("assignee_id"), "left")
      .join(broadcast(organizations.select(col("organization_id"),
        col("name").as("org_name"))),
        Seq("organization_id"), "left")
      .join(broadcast(groups.select(col("group_id"),
        col("name").as("group_name"))), Seq("group_id"), "left")
      // CASE WHEN solved_at IS NOT NULL ... ELSE NULL (:305-310) — an
      // unsolved ticket has NO resolution time, however recently touched
      .withColumn("hours_to_resolution",
        when(col("solved_at").isNotNull,
          round((unix_timestamp(col("solved_at")) -
            unix_timestamp(col("created_at"))).cast("double") / 3600, 2)))
  }

  /** Retention join (EVO_DATA_MODEL.md:346-355). */
  def membershipRetention(memberships: DataFrame,
      members: DataFrame): DataFrame =
    memberships.join(members.select("member_id", "branch_id"), Seq("member_id"))
      .groupBy("branch_id", "membership_status")
      .agg(countDistinct("member_id").as("n_members"),
        count(lit(1)).as("n_memberships"))

  /** mv_daily_entries (COSTS.md:155-162): the gold→platinum rollup,
    * written as its own table on a schedule at scale. */
  def dailyEntries(entries: DataFrame): DataFrame =
    entries.groupBy(col("entry_date").cast("date").as("entry_day"),
      col("branch_id"))
      .agg(count(lit(1)).as("n_entries"),
        countDistinct("member_id").as("n_unique_members"))

  /** Scope-filter convenience view (05_scope_views.sql). */
  def scopeView(df: DataFrame, scope: String): DataFrame =
    df.filter(col("scope") === scope)

  /** Cross-system fuzzy-key join (data-catalog/README.md:423-437):
    * deals ⋈ persons ⋈ lower(email) ⋈ tickets. */
  def dealsWithTickets(deals: DataFrame, persons: DataFrame,
      zdUsers: DataFrame, tickets: DataFrame): DataFrame =
    deals
      .join(persons.select(col("person_id"), col("scope"),
        lower(col("primary_email")).as("email_key")),
        Seq("person_id", "scope"))
      .join(zdUsers.select(col("user_id").as("zd_user_id"),
        lower(col("email")).as("email_key")), Seq("email_key"))
      .join(tickets.select(col("ticket_id"),
        col("requester_id").as("zd_user_id")), Seq("zd_user_id"))
      .groupBy("deal_id", "scope")
      .agg(count(lit(1)).as("n_tickets"))
      .filter(col("n_tickets") > 0)
}
