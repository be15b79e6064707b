package graft

import graft.audit.Audit
import org.apache.spark.sql.functions._

/** Direct unit coverage for the audit operators not already asserted in
  * the pipeline specs (V1, V4, V6–V8). */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("V1 runCounts aggregates per run with file counts and bounds") {
    val silver = Seq(
      ("r1", "f1", "2026-01-01T00:00:00Z"),
      ("r1", "f2", "2026-01-01T01:00:00Z"),
      ("r2", "f3", "2026-01-02T00:00:00Z"))
      .toDF("run_id", "source_blob_path", "loaded_at")
      .withColumn("loaded_at", to_timestamp(col("loaded_at")))
    val got = Audit.runCounts(silver).orderBy("run_id").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("r1", 2L, 2L), ("r2", 1L, 1L)))
    assert(got(0).getTimestamp(4) == ts("2026-01-01T01:00:00Z"))
  }

  test("V1b loadHistory: trailing-window per-day counts, union-stitchable") {
    val tickets = Seq(
      ("2026-01-10T08:00:00Z"), ("2026-01-10T09:00:00Z"),
      ("2026-01-08T08:00:00Z"),
      ("2025-12-01T08:00:00Z")) // outside the 7-day window
      .toDF("loaded_at")
      .withColumn("loaded_at", to_timestamp(col("loaded_at")))
    val deals = Seq(("2026-01-09T12:00:00Z")).toDF("loaded_at")
      .withColumn("loaded_at", to_timestamp(col("loaded_at")))
    val asOf = to_date(lit("2026-01-10"))
    // the reference UNION ALLs one labeled SELECT per staging table
    // (audit_stg.sql:180-198)
    val report = Audit.loadHistory(tickets, "zendesk_tickets", 7, asOf)
      .unionByName(Audit.loadHistory(deals, "pipedrive_deals", 7, asOf))
      .orderBy(col("load_date").desc, col("source"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2))).toSeq
    assert(report == Seq(
      ("2026-01-10", "zendesk_tickets", 2L),
      ("2026-01-09", "pipedrive_deals", 1L),
      ("2026-01-08", "zendesk_tickets", 1L)))
  }

  test("V4 nullViolations reports only columns with nulls") {
    val df = Seq((Some(1L), Some("a")), (None, Some("b")),
      (Some(3L), None), (None, Some("d")))
      .toDF("member_id", "name")
    val got = Audit.nullViolations(df, Seq("member_id", "name"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("member_id", 2L), ("name", 1L)))
    // clean frame -> empty report
    assert(Audit.nullViolations(
      Seq((1L, "a")).toDF("member_id", "name"),
      Seq("member_id", "name")).isEmpty)
  }

  test("V6/V7: reconciliation delta and freshness ordering") {
    def t(at: String) = Seq(("x", at)).toDF("k", "_updated_at")
      .withColumn("_updated_at", to_timestamp(col("_updated_at")))
    val stg = t("2026-01-02T00:00:00Z").union(t("2026-01-03T00:00:00Z"))
    val core = t("2026-01-02T00:00:00Z")
    val recon = Audit.layerReconciliation(stg, core).collect()(0)
    assert(recon.getAs[Long]("delta") == 1L)
    // core older than stg: healthy
    assert(Audit.freshnessViolation(stg, core).isEmpty)
    // core "from the future": violation surfaces
    val coreFresh = t("2026-02-01T00:00:00Z")
    assert(Audit.freshnessViolation(stg, coreFresh).count() == 1)
  }

  test("V8 distribution groups by requested dims") {
    val df = Seq(("comercial", "won"), ("comercial", "won"),
      ("expansao", "lost")).toDF("scope", "status")
    val got = Audit.distribution(df, Seq("scope", "status"))
      .orderBy("scope").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("comercial", "won", 2L), ("expansao", "lost", 1L)))
  }
}
