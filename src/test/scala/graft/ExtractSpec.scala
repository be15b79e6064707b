package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.extract._
import graft.pipeline.MedallionPipeline
import graft.sources.Bronze
import org.apache.spark.sql.functions._

/** Driver-side SaaS extractor layer against an in-memory stub API —
  * the end-to-end contract: stub API → bronze parts → manifest →
  * silver → gold, byte-equal to the file-source path the rest of the
  * suite drives. Plus the transport policies the reference encodes:
  * 429 Retry-After, 5xx exponential backoff, cursor resume, explicit
  * failure on a missing cursor.
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def node(json: String): JsonNode = Api.mapper.readTree(json)

  /** Scripted transport: exact (url-without-query, sorted params)
    * lookup → queued responses (a queue entry is consumed per call,
    * last repeats). Records every call. */
  private class StubTransport extends ApiTransport {
    private val scripts = scala.collection.mutable.Map
      .empty[(String, Map[String, String]),
        scala.collection.mutable.Queue[ApiResponse]]
    val calls = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, String])]

    def script(url: String, params: Map[String, String],
        responses: ApiResponse*): Unit =
      scripts.getOrElseUpdate((url, params),
        scala.collection.mutable.Queue.empty) ++= responses

    def ok(body: String): ApiResponse =
      ApiResponse(200, Map("Content-Type" -> "application/json"), body)

    def get(url: String, params: Map[String, String]): ApiResponse = {
      calls += ((url, params))
      scripts.get((url, params)) match {
        case Some(q) if q.nonEmpty =>
          if (q.size == 1) q.head else q.dequeue()
        case _ => ApiResponse(404, Map.empty,
          s"""{"error": "unscripted $url $params"}""")
      }
    }
  }

  test("RetryingApi: 429 honors Retry-After, 5xx backs off " +
      "exponentially capped, 4xx raises, success passes through") {
    val stub = new StubTransport
    stub.script("http://api/x", Map.empty,
      ApiResponse(429, Map("Retry-After" -> "7"), ""),
      ApiResponse(503, Map.empty, ""),
      ApiResponse(500, Map.empty, ""),
      stub.ok("""{"fine": true}"""))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val api = new RetryingApi(stub, maxRetries = 8,
      backoffCapSeconds = 3.0, sleeper = sleeps += _)
    assert(api.getJson("http://api/x", Map.empty)
      .path("fine").asBoolean())
    // attempt 0: Retry-After 7 wins over backoff; attempts 1, 2:
    // 2^1 = 2 then 2^2 = 4 capped at 3
    assert(sleeps.toSeq == Seq(7.0, 2.0, 3.0))

    stub.script("http://api/bad", Map.empty,
      ApiResponse(403, Map.empty, "nope"))
    val ex = intercept[java.io.IOException](
      api.getJson("http://api/bad", Map.empty))
    assert(ex.getMessage.contains("403"))
  }

  test("RetryingApi: exhausting retries returns the last response " +
      "(getJson then raises with the status)") {
    val stub = new StubTransport
    stub.script("http://api/y", Map.empty,
      ApiResponse(500, Map.empty, "down"))
    val api = new RetryingApi(stub, maxRetries = 3,
      sleeper = _ => ())
    assert(api.get("http://api/y", Map.empty).status == 500)
    intercept[java.io.IOException](api.getJson("http://api/y", Map.empty))
  }

  private def dealJson(id: Long, title: String, update: String): String =
    s"""{"id": $id, "title": "$title", "value": 1500.0,
       |"currency": "BRL", "status": "open", "user_id": 12,
       |"pipeline_id": 1, "stage_id": 5,
       |"update_time": "$update"}""".stripMargin.replaceAll("\n", " ")

  test("pipedrive extractor: cursor pages land as bronze parts; " +
      "silver+gold from the stub-API run equal the file-source path; " +
      "manifest and watermark recorded; deleted rows filtered") {
    val root = tmpDir("extract_pd")
    val stub = new StubTransport
    val t0 = java.time.Instant.parse("2026-01-05T10:00:00Z")
    val until = t0.toString

    // two cursor pages of deals (page 2 carries a deleted row), one
    // pipelines/stages/users snapshot — enough for transformPipedrive
    val dealsBase = Map("limit" -> "500", "sort_by" -> "update_time",
      "sort_direction" -> "asc", "status" -> "open,won,lost",
      "updated_until" -> until)
    stub.script("http://pd/v2/deals", dealsBase, stub.ok(
      s"""{"data": [${dealJson(1, "Deal A", "2026-01-01T00:00:00Z")},
         |${dealJson(2, "Deal B", "2026-01-02T00:00:00Z")}],
         |"additional_data": {"next_cursor": "c2"}}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script("http://pd/v2/deals", dealsBase + ("cursor" -> "c2"),
      stub.ok(
        s"""{"data": [${dealJson(3, "Deal C", "2026-01-03T00:00:00Z")},
           |{"id": 4, "title": "Ghost", "deleted": true}],
           |"additional_data": {}}"""
          .stripMargin.replaceAll("\n", " ")))
    stub.script("http://pd/v2/pipelines", Map("limit" -> "500"), stub.ok(
      """{"data": [{"id": 1, "name": "Vendas", "order_nr": 1,
        |"active": true}], "additional_data": {}}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script("http://pd/v2/stages", Map("limit" -> "500"), stub.ok(
      """{"data": [{"id": 5, "name": "Proposta", "order_nr": 2,
        |"pipeline_id": 1}], "additional_data": {}}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script("http://pd/v1/users", Map.empty, stub.ok(
      """{"data": [{"id": 12, "name": "Vendedor", "email": "v@x.co",
        |"active_flag": true}]}""".stripMargin.replaceAll("\n", " ")))

    // lakeBase is the BRONZE base (the established WatermarkStore/
    // RunManifest convention): parts land under it, _meta beside them
    val bronzeBase = s"$root/lake/bronze"
    val api = new RetryingApi(stub, sleeper = _ => ())
    val extractor = new PipedriveExtractor(spark, api,
      "http://pd/v2", "http://pd/v1", bronzeBase,
      batchPages = 1, now = () => t0) // batchPages=1: one part per page
    val reports = extractor.runScope("comercial",
      Seq("deals", "pipelines", "stages", "users"))

    val rid = Extract.runId(t0)
    val byEntity = reports.map(r => r.entity -> r).toMap
    assert(byEntity("deals").records == 3) // ghost filtered
    assert(byEntity("deals").parts == 2)   // one part per page
    assert(byEntity("deals").mode == "incremental")
    assert(byEntity("users").mode == "snapshot")

    // bronze parts read back through the standard reader, with lineage
    val landed = Bronze.readRun(spark, bronzeBase, "pipedrive",
      "deals", rid, Some("comercial"))
    assert(landed.count() == 3)
    assert(landed.select("source_line_no").as[Int].collect().sorted
      .toSeq == Seq(1, 1, 2)) // two parts: lines 1-2 and line 1

    // manifest document exists and carries the per-entity counts
    val mf = new graft.sources.RunManifest(spark, bronzeBase)
      .load("pipedrive", rid)
    assert(mf.exists(_.contains(""""entity": "deals"""")))
    assert(mf.exists(_.contains(""""records": 3""")))

    // watermark advanced to the run instant (read back minus overlap)
    val wm = new graft.sources.WatermarkStore(spark, bronzeBase)
      .load("pipedrive", "comercial", "deals",
        java.time.Duration.ZERO)
    assert(wm.contains(t0))

    // END-TO-END EQUALITY: the same rows landed via the file-source
    // path (Bronze.write) produce byte-identical raw lines and
    // identical gold rows
    val fileRoot = tmpDir("extract_pd_files")
    val filePipe = new MedallionPipeline(spark, s"$fileRoot/lake",
      graft.operators.ParquetTableFormat)
    val apiPipe = new MedallionPipeline(spark, s"$root/lake",
      graft.operators.ParquetTableFormat)
    def writeFileBronze(entity: String, lines: Seq[String]): Unit =
      Bronze.write(lines.toDF("line")
        .withColumn("scope", lit("comercial"))
        .withColumn("entity", lit(entity))
        .withColumn("ingestion_date", lit("2026-01-05"))
        .withColumn("run_id", lit(rid)),
        s"$fileRoot/lake/bronze", "pipedrive")
    writeFileBronze("deals", Seq(
      dealJson(1, "Deal A", "2026-01-01T00:00:00Z"),
      dealJson(2, "Deal B", "2026-01-02T00:00:00Z"),
      dealJson(3, "Deal C", "2026-01-03T00:00:00Z")))
    writeFileBronze("pipelines",
      Seq("""{"id":1,"name":"Vendas","order_nr":1,"active":true}"""))
    writeFileBronze("stages",
      Seq("""{"id":5,"name":"Proposta","order_nr":2,"pipeline_id":1}"""))
    writeFileBronze("users", Seq(
      """{"id":12,"name":"Vendedor","email":"v@x.co","active_flag":true}"""))

    // raw lines byte-equal (modulo part layout): extractor landing ==
    // the canonical single-line JSON of each stub row
    val apiLines = landed.select("raw_line").as[String].collect()
      .map(node).map(Api.line).sorted.toSeq
    val fileLines = Bronze.readRun(spark, s"$fileRoot/lake/bronze",
      "pipedrive", "deals", rid, Some("comercial"))
      .select("raw_line").as[String].collect()
      .map(node).map(Api.line).sorted.toSeq
    assert(apiLines == fileLines)

    val t1 = ts("2026-01-05T10:00:00Z")
    for (e <- Seq("deals", "pipelines", "stages", "users")) {
      apiPipe.loadVersionedSilver("pipedrive", e, rid, t1)
      filePipe.loadVersionedSilver("pipedrive", e, rid, t1)
    }
    apiPipe.transformPipedrive()
    filePipe.transformPipedrive()
    val goldApi = apiPipe.gold("pd_deals")
      .drop("_loaded_at").orderBy("deal_id")
    val goldFile = filePipe.gold("pd_deals")
      .drop("_loaded_at").orderBy("deal_id")
    assert(goldApi.schema == goldFile.schema)
    assert(goldApi.collect().toSeq == goldFile.collect().toSeq)

    // SECOND RUN: watermark minus overlap becomes updated_since
    val t2 = java.time.Instant.parse("2026-01-06T10:00:00Z")
    val since = t0.minusSeconds(300).toString
    stub.script("http://pd/v2/deals", dealsBase +
      ("updated_since" -> since) +
      ("updated_until" -> t2.toString), stub.ok(
      s"""{"data": [${dealJson(9, "Deal D", "2026-01-06T00:00:00Z")}],
         |"additional_data": {}}""".stripMargin.replaceAll("\n", " ")))
    val extractor2 = new PipedriveExtractor(spark, api,
      "http://pd/v2", "http://pd/v1", bronzeBase, now = () => t2)
    val r2 = extractor2.runScope("comercial", Seq("deals"))
    assert(r2.head.records == 1)
    assert(stub.calls.exists { case (u, p) =>
      u == "http://pd/v2/deals" && p.get("updated_since").contains(since)
    })
  }

  test("zendesk extractor: cursor export resumes from the persisted " +
      "after_cursor; missing cursor without end_of_stream raises; " +
      "time-based watermark advances to last end_time") {
    val root = tmpDir("extract_zd")
    val stub = new StubTransport
    val t0 = java.time.Instant.parse("2026-02-01T00:00:00Z")
    val tickets = "http://zd/api/v2/incremental/tickets/cursor.json"

    def ticket(id: Long): String =
      s"""{"id": $id, "status": "open", "subject": "t$id",
         |"updated_at": "2026-01-31T00:00:00Z"}"""
        .stripMargin.replaceAll("\n", " ")

    // run 1: start_time init; cursor arrives via meta.after_cursor,
    // then via a links.next URL, then end_of_stream with a direct one
    stub.script(tickets,
      Map("per_page" -> "1000", "start_time" -> "0",
        "exclude_deleted" -> "true"),
      stub.ok(s"""{"tickets": [${ticket(1)}],
        |"meta": {"after_cursor": "k1"}}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script(tickets,
      Map("per_page" -> "1000", "cursor" -> "k1",
        "exclude_deleted" -> "true"),
      stub.ok(s"""{"tickets": [${ticket(2)}],
        |"links": {"next": "$tickets?cursor=k2&x=1"}}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script(tickets,
      Map("per_page" -> "1000", "cursor" -> "k2",
        "exclude_deleted" -> "true"),
      stub.ok(s"""{"tickets": [${ticket(3)}], "after_cursor": "k3",
        |"end_of_stream": true}""".stripMargin.replaceAll("\n", " ")))

    val api = new RetryingApi(stub, sleeper = _ => ())
    val zd = new ZendeskExtractor(spark, api, "http://zd",
      s"$root/lake/bronze", now = () => t0)
    val rep1 = zd.runScope("support", Seq("tickets"))
    assert(rep1.head.records == 3)
    assert(rep1.head.mode == "incremental_cursor")

    // run 2 resumes from k3
    val t1 = java.time.Instant.parse("2026-02-02T00:00:00Z")
    stub.script(tickets,
      Map("per_page" -> "1000", "cursor" -> "k3",
        "exclude_deleted" -> "true"),
      stub.ok(s"""{"tickets": [${ticket(4)}], "after_cursor": "k4",
        |"end_of_stream": true}""".stripMargin.replaceAll("\n", " ")))
    val zd2 = new ZendeskExtractor(spark, api, "http://zd",
      s"$root/lake/bronze", now = () => t1)
    assert(zd2.runScope("support", Seq("tickets")).head.records == 1)
    assert(stub.calls.exists { case (_, p) =>
      p.get("cursor").contains("k3")
    })

    // missing cursor and not end_of_stream: explicit failure
    val t2 = java.time.Instant.parse("2026-02-03T00:00:00Z")
    stub.script(tickets,
      Map("per_page" -> "1000", "cursor" -> "k4",
        "exclude_deleted" -> "true"),
      stub.ok("""{"tickets": []}"""))
    val zd3 = new ZendeskExtractor(spark, api, "http://zd",
      s"$root/lake/bronze", now = () => t2)
    val ex = intercept[java.io.IOException](
      zd3.runScope("support", Seq("tickets")))
    assert(ex.getMessage.contains("after_cursor"))

    // time-based users export: two pages, watermark = last end_time
    stub.script("http://zd/api/v2/incremental/users.json",
      Map("per_page" -> "1000", "start_time" -> "0"),
      stub.ok("""{"users": [{"id": 7, "name": "A"}],
        |"end_time": 100,
        |"next_page": "http://zd/api/v2/incremental/users.json?start_time=100"}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script("http://zd/api/v2/incremental/users.json?start_time=100",
      Map.empty,
      stub.ok("""{"users": [{"id": 8, "name": "B"}], "end_time": 200,
        |"end_of_stream": true}""".stripMargin.replaceAll("\n", " ")))
    val repU = zd.runScope("support", Seq("users"))
    assert(repU.head.records == 2)
    val cs = new CursorStore(spark, s"$root/lake/bronze")
    assert(cs.load("zendesk", "support", "users")
      .exists(_.path("start_time").asLong(-1) == 200L))

    // snapshot groups: next_page chain
    stub.script("http://zd/api/v2/groups.json",
      Map("per_page" -> "1000"),
      stub.ok("""{"groups": [{"id": 1, "name": "G1"}],
        |"next_page": "http://zd/api/v2/groups.json?page=2"}"""
        .stripMargin.replaceAll("\n", " ")))
    stub.script("http://zd/api/v2/groups.json?page=2", Map.empty,
      stub.ok("""{"groups": [{"id": 2, "name": "G2"}]}"""))
    val repG = zd.runScope("support", Seq("groups"))
    assert(repG.head.records == 2 && repG.head.mode == "snapshot")
  }
}
