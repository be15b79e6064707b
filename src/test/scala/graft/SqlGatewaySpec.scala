package graft

import graft.pipeline.MedallionPipeline
import graft.sources.Bronze
import graft.views.SqlGateway
import org.apache.spark.sql.functions._

/** Ad-hoc SQL surface: reference-style queries over registered gold
  * views (SURVEY.md §3.3 consumption entry point). */
class SqlGatewaySpec extends SparkSpec {
  import spark.implicits._

  test("register gold views and run reference-style SQL") {
    val root = tmpDir("sqlgw")
    val pipe = new MedallionPipeline(spark, root)
    val lines = Seq(
      """{"idMember": 1, "firstName": "Ana", "idBranch": 3,
        |"membershipStatus": "active"}""".stripMargin.replaceAll("\n", " "),
      """{"idMember": 2, "firstName": "Bea", "idBranch": 3,
        |"membershipStatus": "inactive"}""".stripMargin.replaceAll("\n", " "))
    Bronze.write(lines.toDF("line")
      .withColumn("entity", lit("members"))
      .withColumn("ingestion_date", lit("2026-01-01"))
      .withColumn("run_id", lit("r1")), s"$root/bronze", "evo")
    pipe.loadEvoSilver("members", "idMember", "r1", ts("2026-01-01T00:00:00Z"))
    pipe.transformEvo()

    // a two-scope deals table so the 05_scope_views.sql views register
    for ((scope, id) <- Seq("comercial" -> 1, "expansao" -> 2)) {
      Bronze.write(Seq(
        s"""{"id": $id, "title": "Deal $scope", "status": "open",
           |"update_time": "2026-01-01T00:00:00Z"}"""
          .stripMargin.replaceAll("\n", " ")).toDF("line")
        .withColumn("scope", lit(scope))
        .withColumn("entity", lit("deals"))
        .withColumn("ingestion_date", lit("2026-01-01"))
        .withColumn("run_id", lit("r1")), s"$root/bronze", "pipedrive")
      pipe.loadVersionedSilver("pipedrive", "deals", "r1",
        ts("2026-01-01T00:00:00Z"), Some(scope))
    }
    pipe.transformPipedrive()

    val registered = SqlGateway.register(spark, pipe)
    assert(registered.contains("evo_members"))
    assert(registered.contains("pd_deals"))
    assert(!registered.contains("pd_users")) // never loaded -> not registered

    // scope views (05_scope_views.sql:9-14): filtered, pushdown-friendly
    val com = spark.sql(
      "SELECT deal_id, scope FROM vw_pd_deals_comercial").collect()
    assert(com.length == 1 && com(0).getLong(0) == 1L &&
      com(0).getString(1) == "comercial")
    assert(spark.sql("SELECT * FROM vw_pd_deals_expansao").count() == 1)

    val active = spark.sql(
      """SELECT branch_id, COUNT(*) AS active_members
        |FROM evo_members WHERE membership_status = 'active'
        |GROUP BY branch_id ORDER BY active_members DESC""".stripMargin)
      .collect()
    assert(active.length == 1 && active(0).getLong(1) == 1L)

    // registered SQL function usable in ad-hoc SQL
    val k = spark.sql(
      "SELECT md5_key15(CAST(member_id AS STRING)) FROM evo_members " +
        "WHERE member_id = 1").collect()(0).getLong(0)
    assert(k > 0)
  }
}
