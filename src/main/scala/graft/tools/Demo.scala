package graft.tools

import graft.GraftSession
import graft.audit.Audit
import graft.pipeline.MedallionPipeline
import graft.sources.{Bronze, WatermarkStore}
import graft.views.Analytics
import org.apache.spark.sql.functions._

/** Usage example + smoke driver: runs the whole medallion flow (bronze
  * JSONL → silver → gold → views → audits) against inline sample
  * records in a temp workspace and prints the observable state.
  *   sbt "runMain graft.tools.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val pipe = new MedallionPipeline(spark, root)
    val t1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-01T00:00:00Z"))

    def bronze(source: String, entity: String, runId: String,
        lines: Seq[String], scope: Option[String] = None): Unit = {
      var df = lines.toDF("line")
        .withColumn("entity", lit(entity))
        .withColumn("ingestion_date", lit("2026-01-01"))
        .withColumn("run_id", lit(runId))
      scope.foreach(s => df = df.withColumn("scope", lit(s)))
      Bronze.write(df, s"$root/bronze", source)
    }

    bronze("evo", "members", "r1", Seq(
      """{"idMember": 1, "firstName": "Ana", "lastName": "Silva",
        |"idBranch": 3, "contacts": [{"idPhone": 1, "idContactType": 4,
        |"description": "ana@x.co"}], "memberships": [
        |{"idMemberMembership": 10, "idMembership": 2,
        |"membershipName": "Anual", "membershipStatus": "active"}]}"""
        .stripMargin.replaceAll("\n", " "),
      """{"idMember": 2, "firstName": "Bruno", "idBranch": 3}""",
      """not-even-json{{{""", // corrupt line: must not break the pipeline
      """{"firstName": "NoKey"}"""))
    bronze("evo", "entries", "r1", Seq(
      """{"date": "2026-01-01T08:00:00Z", "idMember": 1, "idBranch": 3,
        |"device": "T1", "entryAction": "Entry"}"""
        .stripMargin.replaceAll("\n", " ")))

    pipe.loadEvoSilver("members", "idMember", "r1", t1)
    pipe.loadEvoEntriesSilver("r1", t1)
    pipe.transformEvo()

    println("== gold evo_members ==")
    pipe.gold("evo_members")
      .select("member_id", "full_name", "email", "_loaded_at").show(false)
    println("== gold evo_member_memberships ==")
    pipe.gold("evo_member_memberships")
      .select("membership_id", "member_id", "membership_name").show(false)
    println("== gold evo_entries (year partition) ==")
    pipe.gold("evo_entries")
      .select("entry_id", "entry_year", "member_id").show(false)

    println("== analytics: retention ==")
    Analytics.membershipRetention(pipe.gold("evo_member_memberships"),
      pipe.gold("evo_members")).show(false)

    println("== audit: duplicate member keys (expect 0 rows) ==")
    Audit.duplicateKeys(pipe.gold("evo_members"), Seq("member_id")).show()

    println("== watermark roundtrip ==")
    val wm = new WatermarkStore(spark, root)
    wm.save("evo", "default", "members",
      java.time.Instant.parse("2026-01-01T12:00:00Z"))
    println("loaded (5min overlap applied): " +
      wm.load("evo", "default", "members"))

    // replay idempotency at the application level
    pipe.loadEvoSilver("members", "idMember", "r1", t1)
    pipe.transformEvo()
    println("== after replay: member count = " +
      pipe.gold("evo_members").count() + " (expect 2) ==")
    spark.stop()
  }
}
