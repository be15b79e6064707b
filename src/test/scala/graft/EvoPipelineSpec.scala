package graft

import graft.audit.Audit
import graft.pipeline.MedallionPipeline
import graft.sources.Bronze
import graft.views.Analytics
import org.apache.spark.sql.functions._

/** End-to-end EVO slice (SURVEY.md §7.2 step 2): bronze JSONL fixtures
  * (FIXTURES.md §A.1–A.4, incl. edge variants) → silver MERGE → gold
  * star → analytics + audit assertions + idempotency replay.
  */
class EvoPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Overridden by [[EvoPipelineInMemorySpec]] — the full suite must
    * stay green over ANY TableFormat binding (the storage seam). */
  protected def format: graft.operators.TableFormat =
    graft.operators.ParquetTableFormat

  private lazy val root = tmpDir("evo")
  private lazy val pipe = new MedallionPipeline(spark, root, format)

  private def writeBronze(source: String, entity: String, runId: String,
      lines: Seq[String], scope: Option[String] = None): Unit = {
    var df = lines.toDF("line")
      .withColumn("entity", lit(entity))
      .withColumn("ingestion_date", lit("2026-01-01"))
      .withColumn("run_id", lit(runId))
    scope.foreach(s => df = df.withColumn("scope", lit(s)))
    Bronze.write(df, s"$root/bronze", source)
  }

  private val member101 =
    """{"idMember": 101, "idBranch": 3, "branchName": "Centro",
      |"firstName": "Ana", "lastName": "Silva", "document": "12345678901",
      |"gender": "F", "birthDate": "1990-05-01", "address": "Rua A",
      |"number": "10", "addressNumber": null, "city": "BH", "state": "MG",
      |"maritalStatus": "married", "complement": "ap 101",
      |"accessCardNumber": "AC-9", "photo": "https://img/a.jpg",
      |"cref": "CREF-123", "crefExpirationDate": "2027-01-01",
      |"userIdGurupass": "GP-7", "usePreferredName": true,
      |"accessBlocked": false, "status": "Active",
      |"membershipStatus": "active", "totalFitCoins": "12.50",
      |"registerDate": "2023-01-10T12:00:00Z",
      |"idEmployeeConsultant": 7, "nameEmployeeConsultant": "Carlos",
      |"employeeInstructor": {"idEmployee": 9, "name": "Bia"},
      |"contacts": [
      | {"idPhone": 501, "idContactType": 1, "typeDescription": "Cell",
      |  "ddi": "55", "description": "+5531999990000"},
      | {"idPhone": 502, "idContactType": 4, "typeDescription": "Email",
      |  "ddi": null, "description": "ana@example.com"}],
      |"memberships": [
      | {"idMemberMembership": 9001, "idMembership": 12,
      |  "membershipName": "Plano Anual", "idSale": 7001,
      |  "idMembershipRenewed": 8001,
      |  "startDate": "2023-01-10T00:00:00Z",
      |  "endDate": "2024-01-10T00:00:00Z",
      |  "nextCharge": "2023-02-10T00:00:00Z",
      |  "idCategoryMembership": 5,
      |  "membershipStatus": "active", "valueNextMonth": "99.90",
      |  "originalValue": "119.90", "numMembers": 1,
      |  "concludedSessions": 4, "pendingSessions": 2,
      |  "maxSuspensionDays": 30, "contractPrinting": "printed",
      |  "freezes": [{"startDate": "2023-07-01", "days": 15,
      |    "reason": {"id": 2, "label": "travel"}}],
      |  "sessions": {"total": 6, "kinds": ["gym", "pool"]},
      |  "flAllowLocker": true, "limitless": true, "weeklyLimit": null}]}"""
      .stripMargin.replaceAll("\n", " ")

  // edge: contacts null, employee ids only in nested form for the
  // consultant but SCALAR v1 form for instructor/personal (both drift
  // directions, normalize_evo_members_v2:177-182)
  private val member102 =
    """{"idMember": 102, "idBranch": 3, "firstName": "Bruno",
      |"lastName": "Costa", "contacts": null,
      |"employeeConsultant": {"idEmployee": 77, "name": "Nested Only"},
      |"idEmployeeInstructor": 88, "nameEmployeeInstructor": "Scalar Inst",
      |"idEmployeePersonalTrainer": 99,
      |"memberMigrationId": "MIG-0042",
      |"accessBlocked": "true"}""".stripMargin.replaceAll("\n", " ")

  // edge: contacts non-array (type-guard P10), no memberships key
  private val member103 =
    """{"idMember": 103, "idBranch": 4, "firstName": "Caio",
      |"contacts": "oops-not-an-array"}""".stripMargin.replaceAll("\n", " ")

  // edge: missing idMember -> dropped at silver (K5)
  private val memberNoId =
    """{"idBranch": 3, "firstName": "Ghost"}"""

  private val sale7001 =
    """{"idSale": 7001, "idMember": 101, "idEmployeeSale": 7,
      |"nameEmployeeSale": "Carlos", "idBranch": 3,
      |"saleDate": "2023-01-10T12:00:00Z", "removed": false,
      |"idSaleMigration": 555,
      |"coporatePartnershipId": 44, "corporatePartnershipName": "ACME",
      |"idSaleRecurrency": 66,
      |"saleItens": [
      | {"idSaleItem": 80001, "description": "Plano Anual",
      |  "item": "membership", "itemValue": "119.90",
      |  "saleValue": "99.90", "saleValueWithoutCreditValue": "89.90",
      |  "quantity": 1, "discount": "20.00", "idMembership": 12,
      |  "idMemberMembership": 9001, "voucher": "V-1",
      |  "flAllowLocker": true},
      | {"description": "ghost item without idSaleItem"}],
      |"receivables": [
      | {"idReceivable": 90001, "dueDate": "2023-02-10T00:00:00Z",
      |  "amount": "99.90", "ammountPaid": "99.90",
      |  "status": {"id": 2, "name": "paid"},
      |  "currentInstallment": 1, "totalInstallments": 12,
      |  "paymentType": {"idPaymentType": 3, "name": "Credit Card"}}]}"""
      .stripMargin.replaceAll("\n", " ")

  private def entry(date: String, member: Long, device: String) =
    s"""{"date": "$date", "idMember": $member, "idBranch": 3,
       |"entryType": "Regular", "entryAction": "Entry",
       |"device": "$device"}""".stripMargin.replaceAll("\n", " ")

  private val prospect301 =
    """{"idProspect": 301, "idBranch": 3, "firstName": "Bruno",
      |"lastName": "Souza", "email": "bruno@example.com",
      |"address": "Rua B", "number": "42", "complement": "casa",
      |"neighborhood": "Savassi", "zipCode": "30000-000",
      |"conversionDate": "2023-06-01T10:00:00Z", "idMember": 101,
      |"financiallyResponsibles": [{"name": "Pai Souza",
      |"cpf": "11122233344", "financialResponsible": true}],
      |"registerDate": "2023-05-20T09:00:00Z",
      |"interests": ["musculacao"], "notes": "indicacao",
      |"temperature": "hot"}""".stripMargin.replaceAll("\n", " ")

  test("bronze -> silver -> gold end-to-end with edges and idempotency") {
    // ---- bronze
    writeBronze("evo", "members", "r1",
      Seq(member101, member102, member103, memberNoId))
    writeBronze("evo", "sales", "r1", Seq(sale7001))
    writeBronze("evo", "prospects", "r1", Seq(prospect301))
    writeBronze("evo", "entries", "r1", Seq(
      entry("2024-03-05T07:45:00Z", 101, "Turnstile-01"),
      entry("2024-03-05T07:45:00Z", 101, "Turnstile-01"), // exact dup -> 1 row
      entry("2023-06-01T10:00:00Z", 102, "Turnstile-02"),
      entry("2025-01-02T08:00:00Z", 103, "Turnstile-01"),
      """{"idMember": 101, "device": "NoDate"}""")) // missing date -> dropped

    // ---- silver
    val t1 = ts("2026-01-01T00:00:00Z")
    pipe.loadEvoSilver("members", "idMember", "r1", t1)
    pipe.loadEvoSilver("sales", "idSale", "r1", t1)
    pipe.loadEvoSilver("prospects", "idProspect", "r1", t1)
    pipe.loadEvoEntriesSilver("r1", t1)

    val silverMembers = spark.read.parquet(pipe.silverPath("evo", "members"))
    assert(silverMembers.count() == 3) // ghost dropped (K5)
    assert(spark.read.parquet(pipe.silverPath("evo", "entries")).count() == 3)

    // ---- gold
    pipe.transformEvo()

    val members = pipe.gold("evo_members")
    val m101 = members.filter(col("member_id") === 101).collect()(0)
    assert(m101.getAs[String]("email") == "ana@example.com") // P4 type 4
    assert(m101.getAs[String]("cellphone") == "+5531999990000") // P4 type 1
    assert(m101.getAs[String]("full_name") == "Ana Silva") // P9
    assert(m101.getAs[Long]("employee_consultant_id") == 7L)
    assert(m101.getAs[Long]("employee_instructor_id") == 9L)
    assert(!m101.getAs[Boolean]("access_blocked"))
    assert(m101.getAs[String]("marital_status") == "married")
    assert(m101.getAs[String]("photo_url") == "https://img/a.jpg") // photo|photoUrl
    assert(m101.getAs[String]("cref") == "CREF-123")
    val m102 = members.filter(col("member_id") === 102).collect()(0)
    assert(m102.getAs[Long]("employee_consultant_id") == 77L) // P2 nested fallback
    assert(m102.getAs[Long]("employee_instructor_id") == 88L) // P2 scalar form
    assert(m102.getAs[String]("employee_instructor_name") == "Scalar Inst")
    assert(m102.getAs[Long]("employee_personal_id") == 99L)
    assert(m102.getAs[String]("member_migration_id") == "MIG-0042") // TEXT
    assert(m102.getAs[Boolean]("access_blocked")) // string "true"
    assert(m102.getAs[String]("email") == null) // contacts null
    val m103 = members.filter(col("member_id") === 103).collect()(0)
    assert(m103.getAs[String]("email") == null) // non-array guard (P10)

    val mm = pipe.gold("evo_member_memberships").collect()
    assert(mm.length == 1)
    assert(mm(0).getAs[Long]("member_membership_id") == 9001L)
    assert(mm(0).getAs[Long]("membership_id") == 12L)
    assert(mm(0).getAs[Long]("membership_renewed_id") == 8001L)
    assert(mm(0).getAs[Int]("concluded_sessions") == 4)
    // freezes/sessions survive as raw JSON incl. nested drifted shapes
    assert(mm(0).getAs[String]("freezes").contains("\"label\":\"travel\""))
    assert(mm(0).getAs[String]("sessions").contains("\"total\":6"))
    assert(pipe.gold("evo_member_contacts").count() == 2)

    // ghost item (no idSaleItem) filtered per normalize_evo_sales.py:214
    val items = pipe.gold("evo_sale_items").collect()
    assert(items.length == 1 &&
      items(0).getAs[java.math.BigDecimal]("sale_value").toString == "99.90")
    // v1-drift key saleValueWithoutCreditValue lands in the column
    assert(items(0).getAs[java.math.BigDecimal]("sale_value_without_credit")
      .toString == "89.90")
    assert(items(0).getAs[String]("voucher") == "V-1")
    assert(items(0).getAs[Long]("member_membership_id") == 9001L)
    val recv = pipe.gold("evo_receivables").collect()(0)
    assert(recv.getAs[java.math.BigDecimal]("amount_paid").toString == "99.90")
    assert(recv.getAs[Long]("status_id") == 2L) // nested access (P3)
    assert(recv.getAs[String]("payment_type_name") == "Credit Card")
    val sales = pipe.gold("evo_sales").collect()(0)
    // v1 drift key, TEXT verbatim (reference column is TEXT)
    assert(sales.getAs[String]("sale_migration_id") == "555")
    // employee_id and employee_sale_id are distinct reference columns
    // (evo_schemas.sql:194-196); only the sale employee is present here
    assert(sales.isNullAt(sales.fieldIndex("employee_id")))
    assert(sales.getAs[Long]("employee_sale_id") == 7L)
    assert(sales.getAs[String]("employee_sale_name") == "Carlos")
    // v1 misspelled drift key lands in the partnership columns
    assert(sales.getAs[Long]("corporate_partnership_id") == 44L)
    assert(sales.getAs[String]("corporate_partnership_name") == "ACME")
    assert(sales.getAs[Long]("sale_recurrency_id") == 66L)

    val entries = pipe.gold("evo_entries")
    assert(entries.count() == 3) // dup collapsed by K6 key at silver
    // exact K6 parity with the Python constant (FunctionsSpec proves the
    // expression; this proves it end-to-end through the pipeline)
    assert(entries.filter(col("member_id") === 101).collect()(0)
      .getAs[Long]("entry_id") == 666922933622125L)
    assert(entries.select("entry_year").distinct().count() == 3) // K10 partitions

    val prospects = pipe.gold("evo_prospects").collect()(0)
    assert(prospects.getAs[Boolean]("is_converted"))
    assert(prospects.getAs[String]("responsible_name") == "Pai Souza") // E7
    assert(prospects.getAs[String]("custom_fields")
      .contains("\"temperature\":\"hot\"")) // P8
    assert(prospects.getAs[Boolean]("responsible_is_financial"))
    assert(prospects.getAs[String]("address_number") == "42")

    // ---- analytics views
    val retention = Analytics.membershipRetention(
      pipe.gold("evo_member_memberships"), members)
    assert(retention.collect()(0).getAs[Long]("n_members") == 1L)
    assert(Analytics.dailyEntries(entries).count() == 3)

    // ---- audit gate (V2/V3/V6)
    assert(Audit.duplicateKeys(members, Seq("member_id")).isEmpty)
    assert(Audit.uniquenessDelta(entries, "entry_id")
      .collect()(0).getLong(0) == 0L)
    val recon = Audit.layerReconciliation(silverMembers, members).collect()(0)
    assert(recon.getAs[Long]("delta") == 0L)

    // ---- incremental update + idempotency (D2: last write wins)
    val member101v2 = member101.replace("\"status\": \"Active\"",
      "\"status\": \"Inactive\"")
    writeBronze("evo", "members", "r2", Seq(member101v2))
    pipe.loadEvoSilver("members", "idMember", "r2", ts("2026-01-02T00:00:00Z"))
    pipe.transformEvo()
    val after = pipe.gold("evo_members")
    assert(after.count() == 3)
    val updated = after.filter(col("member_id") === 101).collect()(0)
    assert(updated.getAs[String]("status") == "Inactive")
    // _loaded_at preserved from first load, _updated_at advanced
    assert(updated.getAs[java.sql.Timestamp]("_loaded_at") == t1)
    assert(updated.getAs[java.sql.Timestamp]("_updated_at") ==
      ts("2026-01-02T00:00:00Z"))

    // replay r2 end-to-end: counts unchanged (idempotency)
    pipe.loadEvoSilver("members", "idMember", "r2", ts("2026-01-02T00:00:00Z"))
    pipe.transformEvo()
    assert(pipe.gold("evo_members").count() == 3)
    assert(pipe.gold("evo_member_memberships").count() == 1)

    // incremental transform: r3 adds one member + one entry; onlyRun
    // processes just that delta yet gold stays complete
    writeBronze("evo", "members", "r3", Seq(
      """{"idMember": 104, "firstName": "Novo", "idBranch": 5}"""))
    writeBronze("evo", "entries", "r3", Seq(
      entry("2025-06-01T09:00:00Z", 104, "Turnstile-03")))
    pipe.loadEvoSilver("members", "idMember", "r3", ts("2026-01-03T00:00:00Z"))
    pipe.loadEvoEntriesSilver("r3", ts("2026-01-03T00:00:00Z"))
    pipe.transformEvo(onlyRun = Some("r3"))
    assert(pipe.gold("evo_members").count() == 4)
    assert(pipe.gold("evo_entries").count() == 4) // old entries survive
    assert(pipe.gold("evo_members").filter(col("member_id") === 101)
      .collect()(0).getAs[String]("status") == "Inactive") // untouched by r3
  }
}

/** The identical end-to-end suite bound to the in-memory TableFormat —
  * green here means no pipeline code secretly assumes parquet-on-disk
  * (the storage seam is real, proven by a second implementation). */
class EvoPipelineInMemorySpec extends EvoPipelineSpec {
  override protected lazy val format: graft.operators.TableFormat =
    new graft.operators.InMemoryTableFormat
}

/** Third binding: the transactional commit-log format — the full
  * pipeline runs with manifest-resolved reads and atomic
  * rename-committed writes (see CommitLogFormatSpec for the
  * crash-injection coverage). */
class EvoPipelineCommitLogSpec extends EvoPipelineSpec {
  override protected lazy val format: graft.operators.TableFormat =
    graft.operators.CommitLogTableFormat
}
