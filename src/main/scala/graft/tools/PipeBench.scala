package graft.tools

import graft.GraftSession
import graft.pipeline.MedallionPipeline
import graft.sources.Bronze
import org.apache.spark.sql.functions._

/** Pipeline-stage throughput bench: generates a synthetic EVO member
  * corpus (nested contacts + memberships, FIXTURES.md shape), runs
  * bronze → silver → gold end-to-end, and prints per-stage rec/s —
  * the numbers to hold against the reference's published envelope
  * (BASELINE.md: bronze→STG 500–600 rec/s, STG→CORE 4,000–7,000 rec/s
  * on its 2-vCPU Postgres).
  *
  *   sbt "runMain graft.tools.PipeBench [nRecords] [cores]"
  *
  * Generation is distributed (format_string over spark.range) — no
  * driver-side row building.
  */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = GraftSession.get(cores)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val root = java.nio.file.Files
      .createTempDirectory("pipebench").toString
    val pipe = new MedallionPipeline(spark, root)

    val line = format_string(
      """{"idMember": %d, "idBranch": %d, "branchName": "Branch %d", """ +
        """"firstName": "Member", "lastName": "N%d", "document": "%011d", """ +
        """"gender": "F", "birthDate": "1990-05-01", "address": "Rua %d", """ +
        """"number": "%d", "city": "BH", "state": "MG", "zipCode": "30000-000", """ +
        """"maritalStatus": "single", "accessBlocked": false, """ +
        """"status": "Active", "membershipStatus": "active", """ +
        """"totalFitCoins": "%d.50", "registerDate": "2023-01-10T12:00:00Z", """ +
        """"contacts": [{"idPhone": %d, "idContactType": 1, "ddi": "55", """ +
        """"description": "+55319999%05d"}, {"idPhone": %d, """ +
        """"idContactType": 4, "description": "m%d@example.com"}], """ +
        """"memberships": [{"idMemberMembership": %d, "idMembership": %d, """ +
        """"membershipName": "Plano", "idSale": %d, """ +
        """"startDate": "2023-01-10T00:00:00Z", "endDate": "2024-01-10T00:00:00Z", """ +
        """"membershipStatus": "active", "valueNextMonth": "99.90", """ +
        """"concludedSessions": %d, "freezes": [{"days": %d}]}]}""",
      col("id"), col("id") % 50, col("id") % 50, col("id"), col("id"),
      col("id") % 997, col("id") % 100, col("id") % 900,
      col("id") * 2, col("id") % 100000, col("id") * 2 + 1, col("id"),
      col("id") + 1000000, col("id") % 200, col("id") + 5000000,
      col("id") % 30, col("id") % 15)

    def stage(label: String, records: Long)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pipebench] $label%-16s ${records / secs}%,12.0f rec/s  ($secs%6.1fs)")
      secs
    }

    val t1 = stage("bronze-write", n) {
      Bronze.write(spark.range(n).select(line.as("line"))
        .withColumn("entity", lit("members"))
        .withColumn("ingestion_date", lit("2026-01-01"))
        .withColumn("run_id", lit("r1")),
        s"$root/bronze", "evo", parts = cores)
    }
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val t2 = stage("bronze->silver", n) {
      pipe.loadEvoSilver("members", "idMember", "r1", now)
    }
    val t3 = stage("silver->gold", n) { pipe.transformEvo() }
    val gold = pipe.gold("evo_members").count()
    require(gold == n, s"gold count $gold != $n")
    require(pipe.gold("evo_member_memberships").count() == n)
    println(s"""{"metric":"pipe_throughput","records":$n,"cores":$cores,""" +
      s""""bronze_write_rps":${(n / t1).toLong},""" +
      s""""bronze_to_silver_rps":${(n / t2).toLong},""" +
      s""""silver_to_gold_rps":${(n / t3).toLong}}""")
    spark.stop()
  }
}
