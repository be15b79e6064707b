package graft

import graft.audit.Audit
import graft.pipeline.MedallionPipeline
import graft.sources.Bronze
import graft.views.Analytics
import org.apache.spark.sql.functions._

/** Versioned-silver path (D1/D3): Pipedrive scoped keep-latest +
  * residual custom fields + primary contacts; Zendesk bridges
  * (tags DISTINCT, custom-fields keep-latest, empty-value filter).
  */
class PipedriveZendeskSpec extends SparkSpec {
  import spark.implicits._

  /** Overridden by [[PipedriveZendeskInMemorySpec]] — seam proof, see
    * EvoPipelineSpec. */
  protected def format: graft.operators.TableFormat =
    graft.operators.ParquetTableFormat

  private lazy val root = tmpDir("pdzd")
  private lazy val pipe = new MedallionPipeline(spark, root, format)

  private def writeBronze(source: String, entity: String, runId: String,
      ingestionDate: String, lines: Seq[String],
      scope: Option[String]): Unit = {
    var df = lines.toDF("line")
      .withColumn("entity", lit(entity))
      .withColumn("ingestion_date", lit(ingestionDate))
      .withColumn("run_id", lit(runId))
    scope.foreach(s => df = df.withColumn("scope", lit(s)))
    Bronze.write(df, s"$root/bronze", source)
  }

  private def deal(id: Long, title: String, status: String,
      update: String, extra: String = "") =
    s"""{"id": $id, "title": "$title", "value": 1500.0,
       |"currency": "BRL", "status": "$status", "user_id": 12,
       |"pipeline_id": 1, "stage_id": 5,
       |"update_time": "$update"$extra}""".stripMargin.replaceAll("\n", " ")

  test("pipedrive: D1 keep-latest per scope, drift value, residuals") {
    // v1 then v2 of deal 12345 in scope comercial; same id in expansao
    writeBronze("pipedrive", "deals", "r1", "2026-01-01", Seq(
      deal(12345, "Old Title", "open", "2026-01-01T00:00:00Z",
        """, "customField_abc123": "website""""),
      deal(777, "Expansao Deal", "won", "2026-01-01T00:00:00Z")),
      Some("comercial"))
    writeBronze("pipedrive", "deals", "r1", "2026-01-01", Seq(
      deal(12345, "Same Id Other Scope", "lost", "2026-01-01T00:00:00Z")),
      Some("expansao"))
    // dict-valued drift: value arrives as {"value":..,"currency":..};
    // also carries the wide-column block (counters, next activity,
    // origin/channel split, weighted value) and an INACTIVE deal 888
    // that the funnel view must exclude (03_core_pipedrive.sql:407)
    writeBronze("pipedrive", "deals", "r2", "2026-01-02", Seq(
      """{"id": 12345, "title": "New Title", "status": "won",
        |"value": {"value": 2000.5, "currency": "USD"}, "user_id": 12,
        |"pipeline_id": 1, "stage_id": 5,
        |"update_time": "2026-01-02T00:00:00Z",
        |"weighted_value": 1600.25, "probability": 80,
        |"first_won_time": "2026-01-02T00:00:00Z",
        |"done_activities_count": 3, "notes_count": 1,
        |"next_activity_date": "2026-02-01", "next_activity_type": "call",
        |"next_activity_duration": "00:30:00",
        |"origin": "API", "origin_id": "o-1", "channel": 52,
        |"channel_id": "ch-52",
        |"customField_abc123": "instagram"}""".stripMargin
        .replaceAll("\n", " "),
      """{"id": 888, "title": "Dead Deal", "status": "open",
        |"active": false, "pipeline_id": 1, "stage_id": 5,
        |"value": 10.0, "currency": "BRL",
        |"update_time": "2026-01-02T00:00:00Z"}""".stripMargin
        .replaceAll("\n", " ")), Some("comercial"))

    writeBronze("pipedrive", "pipelines", "r1", "2026-01-01", Seq(
      """{"id": 1, "name": "Vendas", "order_nr": 1, "active": true}"""),
      Some("comercial"))
    writeBronze("pipedrive", "pipelines", "r1", "2026-01-01", Seq(
      """{"id": 1, "name": "Vendas", "order_nr": 1, "active": true}"""),
      Some("expansao"))
    writeBronze("pipedrive", "stages", "r1", "2026-01-01", Seq(
      """{"id": 5, "name": "Proposta", "order_nr": 2, "pipeline_id": 1}"""),
      Some("comercial"))
    writeBronze("pipedrive", "stages", "r1", "2026-01-01", Seq(
      """{"id": 5, "name": "Proposta", "order_nr": 2, "pipeline_id": 1}"""),
      Some("expansao"))
    writeBronze("pipedrive", "users", "r1", "2026-01-01", Seq(
      """{"id": 12, "name": "Vendedor", "email": "v@x.co",
        |"active_flag": true}""".stripMargin.replaceAll("\n", " ")),
      Some("comercial"))
    writeBronze("pipedrive", "organizations", "r1", "2026-01-01", Seq(
      """{"id": 456, "name": "Org", "owner_id": 12}"""), Some("comercial"))
    writeBronze("pipedrive", "persons", "r1", "2026-01-01", Seq(
      """{"id": 789, "name": "Joao P", "org_id": 456,
        |"email": [{"value": "x@a.co", "primary": false},
        |          {"value": "main@a.co", "primary": true}],
        |"phone": [{"value": "+551199", "primary": false}]}"""
        .stripMargin.replaceAll("\n", " ")), Some("comercial"))
    writeBronze("pipedrive", "activities", "r1", "2026-01-01", Seq(
      """{"id": 1, "type": "call", "subject": "Ligar", "done": true,
        |"deal_id": 12345, "due_time": {"value": "10:00"},
        |"duration": "00:30"}""".stripMargin.replaceAll("\n", " ")),
      Some("comercial"))

    val t1 = ts("2026-01-01T10:00:00Z")
    for (e <- Seq("deals", "pipelines", "stages", "users", "organizations",
      "persons", "activities"))
      pipe.loadVersionedSilver("pipedrive", e, "r1", t1)
    pipe.loadVersionedSilver("pipedrive", "deals", "r2",
      ts("2026-01-02T10:00:00Z"))
    pipe.transformPipedrive()

    val deals = pipe.gold("pd_deals")
    assert(deals.count() == 4) // + inactive 888 (in the table, not the funnel)
    val d = deals.filter(col("deal_id") === 12345 &&
      col("scope") === "comercial").collect()(0)
    assert(d.getAs[String]("title") == "New Title") // D1 latest wins
    assert(d.getAs[java.math.BigDecimal]("value").toString == "2000.50") // dict unwrap
    assert(d.getAs[String]("currency") == "USD") // drift fallback
    assert(d.getAs[String]("custom_fields")
      .contains("\"customField_abc123\":\"instagram\"")) // P6 latest
    // wide-column parity block (03_core_pipedrive.sql:222-302)
    assert(d.getAs[java.math.BigDecimal]("weighted_value")
      .toString == "1600.25")
    assert(d.getAs[java.math.BigDecimal]("probability").toString == "80.00")
    assert(d.getAs[Boolean]("active")) // DDL default TRUE when absent
    assert(!d.getAs[Boolean]("deleted"))
    assert(d.getAs[Int]("done_activities_count") == 3)
    assert(d.getAs[String]("next_activity_duration") == "00:30:00")
    assert(d.getAs[java.sql.Date]("next_activity_date").toString
      == "2026-02-01")
    assert(d.getAs[String]("origin_id") == "o-1")
    assert(d.getAs[Long]("channel") == 52L)
    assert(d.getAs[String]("channel_id") == "ch-52")
    assert(d.getAs[java.sql.Timestamp]("first_won_time") != null)
    // counters absent from the payload stay NULL (no fake zeros)
    assert(d.isNullAt(d.fieldIndex("participants_count")))
    val dead = deals.filter(col("deal_id") === 888).collect()(0)
    assert(!dead.getAs[Boolean]("active"))
    val other = deals.filter(col("deal_id") === 12345 &&
      col("scope") === "expansao").collect()(0)
    assert(other.getAs[String]("title") == "Same Id Other Scope") // ADR-003

    val person = pipe.gold("pd_persons").collect()(0)
    assert(person.getAs[String]("primary_email") == "main@a.co") // P5
    assert(person.getAs[String]("primary_phone") == "+551199") // first fallback

    val act = pipe.gold("pd_activities").collect()(0)
    assert(act.getAs[String]("due_time") == "10:00") // dict unwrap via safeText

    // versioned silver keeps BOTH deal versions (D3 audit trail)
    val silverDeals = spark.read.parquet(pipe.silverPath("pipedrive", "deals"))
    assert(silverDeals.filter(
      get_json_object(col("raw_data"), "$.id") === "12345" &&
        col("scope") === "comercial").count() == 2)

    // funnel + seller views (J1/J2/A1–A3); the inactive 888 deal is in
    // scope comercial but WHERE active = TRUE keeps it out of the funnel
    val funnel = Analytics.salesFunnel(deals, pipe.gold("pd_pipelines"),
      pipe.gold("pd_stages"))
    assert(funnel.filter(col("scope") === "comercial").count() == 2) // won+open... statuses
    assert(funnel.filter(col("status") === "open").isEmpty) // 888 excluded
    val seller = Analytics.sellerPerformance(deals, pipe.gold("pd_users"))
      .filter(col("scope") === "comercial").collect()(0)
    // both comercial deals are won after v2 (777 won at create,
    // 12345 flips open->won)
    assert(seller.getAs[Long]("won_count") == 2L)
    assert(seller.getAs[Double]("win_rate") == 100.0)

    // audit: no duplicate gold keys
    assert(Audit.duplicateKeys(deals, Seq("deal_id", "scope")).isEmpty)

    // incremental (onlyRun): r3 updates deal 777 only; untouched deals
    // keep their state, D1 still sees 777's full version history
    writeBronze("pipedrive", "deals", "r3", "2026-01-03", Seq(
      deal(777, "Expansao Deal v2", "lost", "2026-01-03T00:00:00Z")),
      Some("comercial"))
    pipe.loadVersionedSilver("pipedrive", "deals", "r3",
      ts("2026-01-03T10:00:00Z"))
    pipe.transformPipedrive(onlyRun = Some("r3"))
    val after = pipe.gold("pd_deals")
    assert(after.count() == 4)
    assert(after.filter(col("deal_id") === 777).collect()(0)
      .getAs[String]("title") == "Expansao Deal v2")
    assert(after.filter(col("deal_id") === 12345 &&
      col("scope") === "comercial").collect()(0)
      .getAs[String]("title") == "New Title") // untouched by r3
  }

  test("zendesk: tickets, tags DISTINCT, custom-field keep-latest") {
    val ticketV1 =
      """{"id": 555, "subject": "Catraca", "status": "open",
        |"priority": "high", "requester_id": 9001, "assignee_id": 9100,
        |"organization_id": 4, "group_id": 14,
        |"via": {"channel": "email", "source": {"from": {"address": "x@y.z"}}},
        |"collaborator_ids": [9100, 9200, 9200],
        |"follower_ids": [9100],
        |"tags": ["academia", "catraca", "catraca"],
        |"custom_fields": [{"id": 42, "value": "unidade-centro"},
        |                  {"id": 43, "value": ""}],
        |"created_at": "2026-01-02T09:00:00Z",
        |"updated_at": "2026-01-03T10:00:00Z"}"""
        .stripMargin.replaceAll("\n", " ")
    val ticketV2 =
      """{"id": 555, "subject": "Catraca nao abre", "status": "solved",
        |"raw_subject": "{{dc.catraca}} nao abre",
        |"priority": "high", "requester_id": 9001, "assignee_id": 9100,
        |"organization_id": 4, "group_id": 14,
        |"via": {"channel": "email"},
        |"collaborator_ids": [9100, 9200, 9200],
        |"follower_ids": [9100],
        |"tags": ["academia", "urgente"],
        |"custom_fields": [{"id": 42, "value": "unidade-norte"}],
        |"satisfaction_rating": {"score": "good", "comment": "resolvido"},
        |"due_at": "2026-01-06T00:00:00Z",
        |"assigned_at": "2026-01-02T11:00:00Z",
        |"initially_assigned_at": "2026-01-02T10:30:00Z",
        |"created_at": "2026-01-02T09:00:00Z",
        |"updated_at": "2026-01-04T10:00:00Z",
        |"solved_at": "2026-01-04T10:00:00Z"}"""
        .stripMargin.replaceAll("\n", " ")
    // anomaly row for audit V5: created_at > updated_at
    val anomaly =
      """{"id": 556, "subject": "Anomalia", "status": "open",
        |"created_at": "2026-01-05T00:00:00Z",
        |"updated_at": "2026-01-01T00:00:00Z"}"""
        .stripMargin.replaceAll("\n", " ")

    writeBronze("zendesk", "tickets", "r1", "2026-01-03",
      Seq(ticketV1, anomaly), None)
    writeBronze("zendesk", "tickets", "r2", "2026-01-04", Seq(ticketV2), None)
    writeBronze("zendesk", "users", "r1", "2026-01-03", Seq(
      """{"id": 9001, "name": "Cliente", "email": "c@x.co", "role": "end-user"}""",
      """{"id": 9100, "name": "Agente", "email": "a@x.co", "role": "agent"}"""),
      None)
    writeBronze("zendesk", "organizations", "r1", "2026-01-03", Seq(
      """{"id": 4, "name": "Unidade Centro"}"""), None)
    writeBronze("zendesk", "groups", "r1", "2026-01-03", Seq(
      """{"id": 14, "name": "Suporte"}"""), None)
    writeBronze("zendesk", "ticket_fields", "r1", "2026-01-03", Seq(
      """{"id": 42, "type": "text", "title": "Unidade"}"""), None)
    writeBronze("zendesk", "ticket_forms", "r1", "2026-01-03", Seq(
      """{"id": 2, "name": "default"}"""), None)

    for (e <- Seq("tickets", "users", "organizations", "groups",
      "ticket_fields", "ticket_forms"))
      pipe.loadVersionedSilver("zendesk", e, "r1", ts("2026-01-03T12:00:00Z"))
    pipe.loadVersionedSilver("zendesk", "tickets", "r2",
      ts("2026-01-04T12:00:00Z"))
    pipe.transformZendesk()

    val tickets = pipe.gold("zd_tickets")
    assert(tickets.count() == 2)
    val t555 = tickets.filter(col("ticket_id") === 555).collect()(0)
    assert(t555.getAs[String]("status") == "solved") // D1 latest
    assert(t555.getAs[String]("via_channel") == "email") // P3 nested
    // SLA/satisfaction parity block (04_core_zendesk.sql:158-210)
    assert(t555.getAs[String]("raw_subject") == "{{dc.catraca}} nao abre")
    assert(t555.getAs[String]("satisfaction_score") == "good")
    assert(t555.getAs[String]("satisfaction_rating")
      .contains("\"comment\":"))
    assert(t555.getAs[java.sql.Timestamp]("solved_at") != null)
    assert(t555.getAs[java.sql.Timestamp]("due_at") != null)
    assert(t555.getAs[String]("custom_fields").contains("unidade-norte"))

    // E5: distinct tags; latest version only had [academia, urgente] but
    // insert-ignore accumulates across versions (K8 semantics)
    val tags = pipe.gold("zd_ticket_tags")
      .filter(col("ticket_id") === 555)
      .collect().map(_.getString(1)).sorted
    assert(tags.toSeq == Seq("academia", "urgente"))

    // E6: empty value (43) filtered, latest value per field wins
    val cf = pipe.gold("zd_ticket_custom_fields").collect()
    assert(cf.length == 1)
    assert(cf(0).getAs[Long]("field_id") == 42L &&
      cf(0).getAs[String]("value") == "unidade-norte")

    // id-array bridges (04_core_zendesk.sql:245-268): the D1-latest
    // version wins the explode (v1's stale [9100,9200,9200] collaborator
    // set is NOT re-emitted per se — v2's is), dup ids collapse
    val collabs = pipe.gold("zd_ticket_collaborators")
      .filter(col("ticket_id") === 555)
      .collect().map(_.getAs[Long]("user_id")).sorted
    assert(collabs.toSeq == Seq(9100L, 9200L))
    val followers = pipe.gold("zd_ticket_followers").collect()
    assert(followers.length == 1 &&
      followers(0).getAs[Long]("user_id") == 9100L)

    // replay the whole transform: insert-ignore bridges + keyed upserts
    // must be idempotent
    pipe.transformZendesk()
    assert(pipe.gold("zd_ticket_collaborators").count() == 2)
    assert(pipe.gold("zd_ticket_followers").count() == 1)
    assert(pipe.gold("zd_ticket_custom_fields").count() == 1)

    // V5 audit finds exactly the anomaly ticket (fresh read — the
    // replay swapped the files under the earlier `tickets` plan)
    val anomalies = Audit.dateAnomalies(pipe.gold("zd_tickets"),
      "created_at", "updated_at")
    assert(anomalies.count() == 1 &&
      anomalies.collect()(0).getAs[Long]("ticket_id") == 556L)

    // J3 star enrichment (fresh read — the replay above swapped the
    // gold files under the earlier `tickets` plan's file listing)
    val metrics = Analytics.ticketMetrics(pipe.gold("zd_tickets"),
      pipe.gold("zd_users"),
      pipe.gold("zd_organizations"), pipe.gold("zd_groups"))
    val m = metrics.filter(col("ticket_id") === 555).collect()(0)
    assert(m.getAs[String]("requester_name") == "Cliente")
    assert(m.getAs[String]("assignee_name") == "Agente")
    assert(m.getAs[String]("org_name") == "Unidade Centro")
    // solved_at - created_at (04_core_zendesk.sql:305-310), NOT
    // updated_at - created_at
    assert(m.getAs[Double]("hours_to_resolution") == 49.0) // A10
    // the unsolved anomaly ticket has NULL resolution, not
    // a bogus updated_at-derived duration
    val m556 = metrics.filter(col("ticket_id") === 556).collect()(0)
    assert(m556.isNullAt(m556.fieldIndex("hours_to_resolution")))

    // incremental ≡ full for the custom-fields bridge: r3 rewrites
    // field 42 of ticket 555; onlyRun re-dedups just that ticket's
    // history yet lands the same end state a full transform would
    val ticketV3 = ticketV2.replace("unidade-norte", "unidade-sul")
    writeBronze("zendesk", "tickets", "r3", "2026-01-05", Seq(ticketV3), None)
    pipe.loadVersionedSilver("zendesk", "tickets", "r3",
      ts("2026-01-05T12:00:00Z"))
    pipe.transformZendesk(onlyRun = Some("r3"))
    val cfInc = pipe.gold("zd_ticket_custom_fields").collect()
    assert(cfInc.length == 1 && cfInc(0).getAs[String]("value") == "unidade-sul")
    pipe.transformZendesk() // full recompute: same end state (property)
    val cfFull = pipe.gold("zd_ticket_custom_fields").collect()
    assert(cfFull.length == 1 &&
      cfFull(0).getAs[String]("value") == "unidade-sul")
  }

  test("run manifest (K2): per-entity counts reconcile with V1 runCounts") {
    import graft.sources.RunManifest
    writeBronze("zendesk", "manifest_probe", "rM", "2026-01-07",
      Seq("""{"id": 1}""", """{"id": 2}""", """{"id": 3}"""), None)
    val mf = new RunManifest(spark, s"$root/bronze")
    val started = java.time.Instant.parse("2026-01-07T00:00:00Z")
    val rep = mf.reportFor("zendesk", "manifest_probe", "rM",
      mode = "incremental")
    mf.save("zendesk", "rM", started,
      java.time.Instant.parse("2026-01-07T00:05:00Z"), Seq(rep))
    val doc = mf.load("zendesk", "rM").get
    assert(doc.contains("\"run_id\": \"rM\""))
    assert(doc.contains("\"records\": 3"))
    assert(doc.contains("\"parts\": 1"))

    // the same counts the silver load records (Audit.runCounts, V1)
    pipe.loadVersionedSilver("zendesk", "manifest_probe", "rM",
      ts("2026-01-07T01:00:00Z"))
    val counts = graft.audit.Audit.runCounts(
      spark.read.parquet(pipe.silverPath("zendesk", "manifest_probe")))
      .filter(col("run_id") === "rM").collect()(0)
    assert(counts.getAs[Long]("n_records") == rep.records)
    assert(counts.getAs[Long]("n_files") == rep.parts)
  }
}

/** The identical suite bound to the in-memory TableFormat (seam proof,
  * see EvoPipelineInMemorySpec). */
class PipedriveZendeskInMemorySpec extends PipedriveZendeskSpec {
  override protected lazy val format: graft.operators.TableFormat =
    new graft.operators.InMemoryTableFormat
}

/** Third binding: the transactional commit-log format. */
class PipedriveZendeskCommitLogSpec extends PipedriveZendeskSpec {
  override protected lazy val format: graft.operators.TableFormat =
    graft.operators.CommitLogTableFormat
}
