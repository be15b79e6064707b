package graft.views

import graft.functions.Keys
import graft.pipeline.MedallionPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc SQL entry point (SURVEY.md §3.3): registers every existing
  * gold table as a temp view under its reference name, plus the
  * analytics views, so `spark.sql("SELECT ... FROM evo_members ...")`
  * works exactly like querying the reference's core.* schema.
  */
object SqlGateway {

  val GoldTables: Seq[String] = Seq(
    "evo_members", "evo_member_memberships", "evo_member_contacts",
    "evo_sales", "evo_sale_items", "evo_receivables", "evo_entries",
    "evo_prospects",
    "pd_pipelines", "pd_stages", "pd_users", "pd_organizations",
    "pd_persons", "pd_deals", "pd_activities",
    "zd_organizations", "zd_users", "zd_groups", "zd_ticket_fields",
    "zd_ticket_forms", "zd_tickets", "zd_ticket_tags",
    "zd_ticket_custom_fields", "zd_ticket_collaborators",
    "zd_ticket_followers")

  /** Scope-filter convenience views (05_scope_views.sql:9-41): one view
    * per (table, scope). Trivially cheap — the scope predicate pushes
    * down to the parquet scan. */
  val ScopeViewTables: Seq[String] = Seq("pd_deals", "pd_persons",
    "pd_activities", "pd_organizations", "pd_users")
  val Scopes: Seq[String] = Seq("comercial", "expansao")

  /** Register all materialized gold tables (+ derived views where their
    * inputs exist) and the SQL functions. Returns registered names. */
  def register(spark: SparkSession, pipe: MedallionPipeline): Seq[String] = {
    Keys.registerSqlFunctions(spark)
    val present = GoldTables.filter(t =>
      pipe.format.exists(spark, pipe.goldPath(t)))
    present.foreach(t => pipe.gold(t).createOrReplaceTempView(t))

    def view(name: String, needs: Seq[String])(f: => DataFrame): Unit =
      if (needs.forall(present.contains)) f.createOrReplaceTempView(name)

    view("vw_pd_sales_funnel", Seq("pd_deals", "pd_pipelines", "pd_stages"))(
      Analytics.salesFunnel(pipe.gold("pd_deals"), pipe.gold("pd_pipelines"),
        pipe.gold("pd_stages")))
    view("vw_pd_seller_performance", Seq("pd_deals", "pd_users"))(
      Analytics.sellerPerformance(pipe.gold("pd_deals"),
        pipe.gold("pd_users")))
    view("vw_zd_ticket_metrics",
      Seq("zd_tickets", "zd_users", "zd_organizations", "zd_groups"))(
      Analytics.ticketMetrics(pipe.gold("zd_tickets"), pipe.gold("zd_users"),
        pipe.gold("zd_organizations"), pipe.gold("zd_groups")))
    view("vw_daily_entries", Seq("evo_entries"))(
      Analytics.dailyEntries(pipe.gold("evo_entries")))
    for (t <- ScopeViewTables if present.contains(t); s <- Scopes)
      view(s"vw_${t}_$s", Seq(t))(
        Analytics.scopeView(pipe.gold(t), s))
    present
  }
}
