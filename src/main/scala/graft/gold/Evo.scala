package graft.gold

import graft.functions.{JsonOps, Keys, SafeCasts => SC}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EVO gold transformers (SURVEY.md §1.3, §2 P1–P10/E1–E7).
  *
  * Inputs are silver frames (`raw_data` JSON text + lineage/audit
  * columns from SilverLoader.loadReplacing). Each transformer is a pure
  * DataFrame→DataFrame projection; writes are the pipeline's concern.
  *
  * Schemas are declared with STRING leaves and cast through SafeCasts —
  * the same text→typed discipline as the reference's
  * (raw_data->>'field')::TYPE SQL (normalize_evo_members_v2.py:131-185),
  * tolerant of API drift by construction. Drift-prone fields go through
  * get_json_object on the raw text instead of the parsed struct.
  */
object Evo {

  // ---------------------------------------------------------------- members

  private val contactsT =
    "ARRAY<STRUCT<idPhone: STRING, idContactType: STRING, " +
      "typeDescription: STRING, ddi: STRING, description: STRING>>"

  /** Full membership element shape (evo_schemas.sql:351-401,
    * normalize_evo_members_v2.py:246-292). `freezes`/`sessions` are
    * residual JSON (m->'freezes' pass-through in the reference) and are
    * NOT declared here — from_json would null them out; they are
    * re-extracted from the raw text by position in memberMemberships. */
  private val membershipsT =
    "ARRAY<STRUCT<idMemberMembership: STRING, idMembership: STRING, " +
      "membershipName: STRING, idMembershipRenewed: STRING, " +
      "idSale: STRING, saleDate: STRING, " +
      "startDate: STRING, endDate: STRING, cancelDate: STRING, " +
      "cancelDateOn: STRING, cancelCreationDate: STRING, " +
      "membershipStatus: STRING, valueNextMonth: STRING, " +
      "originalValue: STRING, nextCharge: STRING, " +
      "nextDateSuspension: STRING, idCategoryMembership: STRING, " +
      "loyaltyEndDate: STRING, assessmentEndDate: STRING, " +
      "acceptanceDate: STRING, numMembers: STRING, flAllowLocker: STRING, " +
      "flAdditionalMembership: STRING, allowLesMills: STRING, " +
      "allowsCancellationByApp: STRING, signedTerms: STRING, " +
      "limitless: STRING, weeklyLimit: STRING, bioimpedanceAmount: STRING, " +
      "concludedSessions: STRING, pendingSessions: STRING, " +
      "scheduledSessions: STRING, pendingRepositions: STRING, " +
      "repositionsTotal: STRING, bonusSessions: STRING, " +
      "numberSuspensionTimes: STRING, maxSuspensionDays: STRING, " +
      "minimumSuspensionDays: STRING, disponibleSuspensionDays: STRING, " +
      "disponibleSuspensionTimes: STRING, daysLeftToFreeze: STRING, " +
      "contractPrinting: STRING>>"

  val memberSchema: String =
    "idMember STRING, idBranch STRING, branchName STRING, " +
      "firstName STRING, lastName STRING, " +
      "registerName STRING, registerLastName STRING, " +
      "usePreferredName STRING, document STRING, documentId STRING, " +
      "gender STRING, " +
      "birthDate STRING, maritalStatus STRING, address STRING, " +
      "number STRING, " +
      "addressNumber STRING, complement STRING, neighborhood STRING, " +
      "city STRING, " +
      "state STRING, country STRING, zipCode STRING, " +
      "accessCardNumber STRING, " +
      "accessBlocked STRING, blockedReason STRING, status STRING, " +
      "membershipStatus STRING, " +
      "penalized STRING, totalFitCoins STRING, registerDate STRING, " +
      "conversionDate STRING, lastAccessDate STRING, updateDate STRING, " +
      "photo STRING, photoUrl STRING, " +
      "gympassId STRING, codeTotalpass STRING, userIdGurupass STRING, " +
      "clientWithPromotionalRestriction STRING, personalTrainer STRING, " +
      "personalType STRING, cref STRING, crefExpirationDate STRING, " +
      "idEmployeeConsultant STRING, nameEmployeeConsultant STRING, " +
      "idEmployeeInstructor STRING, nameEmployeeInstructor STRING, " +
      "idEmployeePersonalTrainer STRING, nameEmployeePersonalTrainer STRING, " +
      "memberMigrationId STRING, idMemberMigration STRING, " +
      "employeeConsultant STRUCT<idEmployee: STRING, name: STRING>, " +
      "employeeInstructor STRUCT<idEmployee: STRING, name: STRING>, " +
      "employeePersonal STRUCT<idEmployee: STRING, name: STRING>, " +
      s"contacts $contactsT, memberships $membershipsT"

  private def audit(df: DataFrame): Seq[Column] = Seq(
    col("run_id").as("_source_run_id"),
    col("_loaded_at"), col("_updated_at"))

  /** Parse silver's raw_data once under column `p` — or reuse an
    * existing `p` so a caller deriving SEVERAL tables from one silver
    * frame (members + memberships + contacts) can pre-parse and
    * persist a single parsed frame instead of re-running the
    * 55-field from_json per transformer (see
    * MedallionPipeline.transformEvo). */
  private def withParsed(silver: DataFrame, schema: String): DataFrame =
    if (silver.columns.contains("p")) silver
    else silver.withColumn("p", JsonOps.parse(col("raw_data"), schema))

  /** Pre-parse hooks for the pipeline's parse-once-persist pattern. */
  def parseMembers(silver: DataFrame): DataFrame =
    withParsed(silver, memberSchema)
  def parseSales(silver: DataFrame): DataFrame =
    withParsed(silver, saleSchema)

  /** core.evo_members (evo_schemas.sql:287-348). */
  def members(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, memberSchema)
    df.select(Seq(
      SC.safeLong(col("p.idMember")).as("member_id"),
      SC.safeLong(col("p.idBranch")).as("branch_id"),
      SC.safeText(col("p.branchName")).as("branch_name"),
      SC.safeText(col("p.firstName")).as("first_name"),
      SC.safeText(col("p.lastName")).as("last_name"),
      // generated full_name (evo_schemas.sql:293)
      trim(concat_ws(" ", coalesce(col("p.firstName"), lit("")),
        coalesce(col("p.lastName"), lit("")))).as("full_name"),
      SC.safeText(col("p.registerName")).as("register_name"),
      SC.safeText(col("p.registerLastName")).as("register_last_name"),
      SC.boolOrFalse(col("p.usePreferredName")).as("use_preferred_name"),
      SC.safeText(col("p.document")).as("document"),
      SC.safeText(col("p.documentId")).as("document_id"),
      SC.safeText(col("p.gender")).as("gender"),
      SC.safeDate(col("p.birthDate")).as("birth_date"),
      SC.safeText(col("p.maritalStatus")).as("marital_status"),
      SC.safeText(col("p.address")).as("address"),
      // schema-drift fallback addressNumber|number (P2)
      coalesce(SC.safeText(col("p.addressNumber")),
        SC.safeText(col("p.number"))).as("address_number"),
      SC.safeText(col("p.complement")).as("complement"),
      SC.safeText(col("p.neighborhood")).as("neighborhood"),
      SC.safeText(col("p.city")).as("city"),
      SC.safeText(col("p.state")).as("state"),
      SC.safeText(col("p.country")).as("country"),
      SC.safeText(col("p.zipCode")).as("zip_code"),
      SC.safeText(col("p.accessCardNumber")).as("access_card_number"),
      SC.boolOrFalse(col("p.accessBlocked")).as("access_blocked"),
      SC.safeText(col("p.blockedReason")).as("blocked_reason"),
      SC.safeText(col("p.status")).as("status"),
      SC.safeText(col("p.membershipStatus")).as("membership_status"),
      SC.boolOrFalse(col("p.penalized")).as("penalized"),
      SC.safeDecimal(col("p.totalFitCoins")).as("total_fit_coins"),
      SC.safeTimestamp(col("p.registerDate")).as("register_date"),
      SC.safeTimestamp(col("p.conversionDate")).as("conversion_date"),
      SC.safeTimestamp(col("p.lastAccessDate")).as("last_access_date"),
      SC.safeTimestamp(col("p.updateDate")).as("update_date"),
      // photo|photoUrl drift (normalize_evo_members_v2.py:169)
      coalesce(SC.safeText(col("p.photo")),
        SC.safeText(col("p.photoUrl"))).as("photo_url"),
      SC.safeText(col("p.gympassId")).as("gympass_id"),
      SC.safeText(col("p.codeTotalpass")).as("code_totalpass"),
      SC.safeText(col("p.userIdGurupass")).as("user_id_gurupass"),
      SC.boolOrFalse(col("p.clientWithPromotionalRestriction"))
        .as("client_with_promotional_restriction"),
      SC.boolOrFalse(col("p.personalTrainer")).as("personal_trainer"),
      SC.safeText(col("p.personalType")).as("personal_type"),
      SC.safeText(col("p.cref")).as("cref"),
      SC.safeDate(col("p.crefExpirationDate")).as("cref_expiration_date"),
      // employee id drift: scalar field OR nested object (P2)
      coalesce(SC.safeLong(col("p.idEmployeeConsultant")),
        SC.safeLong(col("p.employeeConsultant.idEmployee")))
        .as("employee_consultant_id"),
      coalesce(SC.safeText(col("p.nameEmployeeConsultant")),
        SC.safeText(col("p.employeeConsultant.name")))
        .as("employee_consultant_name"),
      // instructor/personal drift is symmetric with the consultant:
      // scalar v1 field OR nested object (normalize_evo_members_v2:179-182)
      coalesce(SC.safeLong(col("p.idEmployeeInstructor")),
        SC.safeLong(col("p.employeeInstructor.idEmployee")))
        .as("employee_instructor_id"),
      coalesce(SC.safeText(col("p.nameEmployeeInstructor")),
        SC.safeText(col("p.employeeInstructor.name")))
        .as("employee_instructor_name"),
      coalesce(SC.safeLong(col("p.idEmployeePersonalTrainer")),
        SC.safeLong(col("p.employeePersonal.idEmployee")))
        .as("employee_personal_id"),
      coalesce(SC.safeText(col("p.nameEmployeePersonalTrainer")),
        SC.safeText(col("p.employeePersonal.name")))
        .as("employee_personal_name"),
      // migration id drift + TEXT verbatim (not numeric-cast)
      coalesce(SC.safeText(col("p.memberMigrationId")),
        SC.safeText(col("p.idMemberMigration"))).as("member_migration_id"),
      // first-match contact selection (P4): email types 3/4, phone 1/2
      JsonOps.firstMatch(col("p.contacts"), "idContactType", Seq(3, 4),
        "description").as("email"),
      JsonOps.firstMatch(col("p.contacts"), "idContactType", Seq(1, 2),
        "description").as("cellphone")) ++ audit(df): _*)
  }

  /** core.evo_member_memberships (E1, evo_schemas.sql:351-401) — the
    * reference's heaviest table (normalize_evo_members_v2.py:215-300).
    *
    * `freezes`/`sessions` are residual JSON passed through verbatim
    * (m->'freezes'); from_json can't preserve unknown shapes, so they
    * are re-extracted from the raw text with a positional JSON path
    * (posexplode supplies the index). Costs two extra raw parses per
    * membership row — acceptable because this runs once per load, and
    * the alternative (declaring their schema) would silently drop
    * drifted sub-fields, violating ADR-002. */
  def memberMemberships(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, memberSchema)
    def rawAt(field: String): Column = call_function("get_json_object",
      col("__mtxt"),
      concat(lit("$["), col("pos"), lit(s"].$field")))
    df.select(
      SC.safeLong(col("p.idMember")).as("member_id"),
      posexplode(JsonOps.arrayOrEmpty(col("p.memberships"))).as(Seq("pos", "m")),
      // residual re-extraction parses the memberships ARRAY text, not
      // the whole raw document, per row below
      get_json_object(col("raw_data"), "$.memberships").as("__mtxt"),
      col("run_id"), col("_loaded_at"), col("_updated_at"))
      // K5 skip-null-key: a drifted element without idMemberMembership
      // cannot carry the (member_id, member_membership_id) upsert key —
      // keeping it would collapse all such ghosts into one arbitrary
      // row per member (the reference declares the column NOT NULL,
      // so its insert would refuse the row too)
      .filter(col("m.idMemberMembership").isNotNull)
      .select(
        SC.safeLong(col("m.idMemberMembership")).as("member_membership_id"),
        col("member_id"),
        SC.safeLong(col("m.idMembership")).as("membership_id"),
        SC.safeText(col("m.membershipName")).as("membership_name"),
        SC.safeLong(col("m.idMembershipRenewed")).as("membership_renewed_id"),
        SC.safeLong(col("m.idSale")).as("sale_id"),
        SC.safeTimestamp(col("m.saleDate")).as("sale_date"),
        SC.safeTimestamp(col("m.startDate")).as("start_date"),
        SC.safeTimestamp(col("m.endDate")).as("end_date"),
        SC.safeTimestamp(col("m.cancelDate")).as("cancel_date"),
        SC.safeTimestamp(col("m.cancelDateOn")).as("cancel_date_on"),
        SC.safeTimestamp(col("m.cancelCreationDate"))
          .as("cancel_creation_date"),
        SC.safeText(col("m.membershipStatus")).as("membership_status"),
        SC.safeDecimal(col("m.valueNextMonth")).as("value_next_month"),
        SC.safeDecimal(col("m.originalValue")).as("original_value"),
        SC.safeTimestamp(col("m.nextCharge")).as("next_charge"),
        SC.safeTimestamp(col("m.nextDateSuspension"))
          .as("next_date_suspension"),
        SC.safeLong(col("m.idCategoryMembership"))
          .as("category_membership_id"),
        SC.safeTimestamp(col("m.loyaltyEndDate")).as("loyalty_end_date"),
        SC.safeTimestamp(col("m.assessmentEndDate"))
          .as("assessment_end_date"),
        SC.safeTimestamp(col("m.acceptanceDate")).as("acceptance_date"),
        SC.safeInt(col("m.numMembers")).as("num_members"),
        SC.safeBool(col("m.flAllowLocker")).as("fl_allow_locker"),
        SC.safeBool(col("m.flAdditionalMembership"))
          .as("fl_additional_membership"),
        SC.safeBool(col("m.allowLesMills")).as("allow_les_mills"),
        SC.safeBool(col("m.allowsCancellationByApp"))
          .as("allows_cancellation_by_app"),
        SC.safeBool(col("m.signedTerms")).as("signed_terms"),
        SC.safeBool(col("m.limitless")).as("limitless"),
        SC.safeInt(col("m.weeklyLimit")).as("weekly_limit"),
        SC.safeInt(col("m.bioimpedanceAmount")).as("bioimpedance_amount"),
        SC.safeInt(col("m.concludedSessions")).as("concluded_sessions"),
        SC.safeInt(col("m.pendingSessions")).as("pending_sessions"),
        SC.safeInt(col("m.scheduledSessions")).as("scheduled_sessions"),
        SC.safeInt(col("m.pendingRepositions")).as("pending_repositions"),
        SC.safeInt(col("m.repositionsTotal")).as("repositions_total"),
        SC.safeInt(col("m.bonusSessions")).as("bonus_sessions"),
        SC.safeInt(col("m.numberSuspensionTimes"))
          .as("number_suspension_times"),
        SC.safeInt(col("m.maxSuspensionDays")).as("max_suspension_days"),
        SC.safeInt(col("m.minimumSuspensionDays"))
          .as("minimum_suspension_days"),
        SC.safeInt(col("m.disponibleSuspensionDays"))
          .as("disponible_suspension_days"),
        SC.safeInt(col("m.disponibleSuspensionTimes"))
          .as("disponible_suspension_times"),
        SC.safeInt(col("m.daysLeftToFreeze")).as("days_left_to_freeze"),
        SC.safeText(col("m.contractPrinting")).as("contract_printing"),
        rawAt("freezes").as("freezes"),
        rawAt("sessions").as("sessions"),
        col("run_id").as("_source_run_id"),
        col("_loaded_at"), col("_updated_at"))
  }

  /** core.evo_member_contacts (E2, evo_schemas.sql:404-414). */
  def memberContacts(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, memberSchema)
    df.select(
      SC.safeLong(col("p.idMember")).as("member_id"),
      explode(JsonOps.arrayOrEmpty(col("p.contacts"))).as("c"),
      col("run_id"), col("_loaded_at"), col("_updated_at"))
      .select(
        SC.safeLong(col("c.idPhone")).as("phone_id"),
        col("member_id"),
        SC.safeLong(col("c.idContactType")).as("contact_type_id"),
        SC.safeText(col("c.typeDescription")).as("contact_type"),
        SC.safeText(col("c.ddi")).as("ddi"),
        SC.safeText(col("c.description")).as("description"),
        col("run_id").as("_source_run_id"),
        col("_loaded_at"), col("_updated_at"))
  }

  // ---------------------------------------------------------------- sales

  private val saleItemsT =
    "ARRAY<STRUCT<idSaleItem: STRING, description: STRING, item: STRING, " +
      "itemValue: STRING, saleValue: STRING, saleValueWithoutCredit: STRING, " +
      "saleValueWithoutCreditValue: STRING, " +
      "quantity: STRING, discount: STRING, corporateDiscount: STRING, " +
      "tax: STRING, valueNextMonth: STRING, idMembership: STRING, " +
      "idMembershipRenewed: STRING, " +
      "idMemberMembership: STRING, idProduct: STRING, idService: STRING, " +
      "coporatePartnershipId: STRING, idCorporatePartnership: STRING, " +
      "corporatePartnershipName: STRING, nameCorporatePartnership: STRING, " +
      "membershipStartDate: STRING, numMembers: STRING, " +
      "voucher: STRING, accountingCode: STRING, " +
      "municipalServiceCode: STRING, " +
      "flReceiptOnly: STRING, flSwimming: STRING, flAllowLocker: STRING, " +
      "idSaleItemMigration: STRING>>"

  private val receivablesT =
    "ARRAY<STRUCT<idReceivable: STRING, registrationDate: STRING, " +
      "dueDate: STRING, receivingDate: STRING, cancellationDate: STRING, " +
      "updateDate: STRING, amount: STRING, ammountPaid: STRING, " +
      "status: STRUCT<id: STRING, name: STRING>, " +
      "currentInstallment: STRING, totalInstallments: STRING, " +
      "paymentType: STRUCT<idPaymentType: STRING, name: STRING>, " +
      "authorization: STRING, tid: STRING, nsu: STRING, cardFlag: STRING, " +
      "transactionToken: STRING>>"

  val saleSchema: String =
    "idSale STRING, idMember STRING, idProspect STRING, idEmployee STRING, " +
      "idEmployeeSale STRING, nameEmployeeSale STRING, idPersonal STRING, " +
      "idBranch STRING, saleDate STRING, saleDateServer STRING, " +
      "updateDate STRING, saleSource STRING, observations STRING, " +
      "idCorporatePartnership STRING, coporatePartnershipId STRING, " +
      "nameCorporatePartnership STRING, corporatePartnershipName STRING, " +
      "idSaleRecurrency STRING, idEmployeeRemoval STRING, " +
      "removed STRING, removalDate STRING, " +
      "saleMigrationId STRING, idSaleMigration STRING, " +
      "cartToken STRING, idCartToken STRING, " +
      s"saleItens $saleItemsT, receivables $receivablesT"

  /** core.evo_sales (evo_schemas.sql:191-219). */
  def sales(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, saleSchema)
    df.select(Seq(
      SC.safeLong(col("p.idSale")).as("sale_id"),
      SC.safeLong(col("p.idMember")).as("member_id"),
      SC.safeLong(col("p.idProspect")).as("prospect_id"),
      SC.safeLong(col("p.idEmployee")).as("employee_id"),
      SC.safeLong(col("p.idEmployeeSale")).as("employee_sale_id"),
      SC.safeText(col("p.nameEmployeeSale")).as("employee_sale_name"),
      SC.safeLong(col("p.idPersonal")).as("personal_id"),
      SC.safeLong(col("p.idBranch")).as("branch_id"),
      SC.safeTimestamp(col("p.saleDate")).as("sale_date"),
      SC.safeTimestamp(col("p.saleDateServer")).as("sale_date_server"),
      SC.safeTimestamp(col("p.updateDate")).as("update_date"),
      SC.safeInt(col("p.saleSource")).as("sale_source"),
      SC.safeText(col("p.observations")).as("observations"),
      // v1/v2 API key drift (normalize_evo_sales.py:115 spells it
      // `coporatePartnershipId`; v2 uses idCorporatePartnership)
      coalesce(SC.safeLong(col("p.idCorporatePartnership")),
        SC.safeLong(col("p.coporatePartnershipId")))
        .as("corporate_partnership_id"),
      coalesce(SC.safeText(col("p.nameCorporatePartnership")),
        SC.safeText(col("p.corporatePartnershipName")))
        .as("corporate_partnership_name"),
      SC.safeLong(col("p.idSaleRecurrency")).as("sale_recurrency_id"),
      SC.boolOrFalse(col("p.removed")).as("removed"),
      SC.safeTimestamp(col("p.removalDate")).as("removal_date"),
      SC.safeLong(col("p.idEmployeeRemoval")).as("employee_removal_id"),
      // v1/v2 key drift (SURVEY.md §7.3 hard-point 5); TEXT verbatim —
      // the reference column is TEXT (evo_schemas.sql:211), so
      // non-numeric migration ids must survive
      coalesce(SC.safeText(col("p.saleMigrationId")),
        SC.safeText(col("p.idSaleMigration"))).as("sale_migration_id"),
      coalesce(SC.safeText(col("p.cartToken")),
        SC.safeText(col("p.idCartToken"))).as("cart_token")) ++ audit(df): _*)
  }

  /** core.evo_sale_items (E3; source key is misspelled `saleItens`). */
  def saleItems(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, saleSchema)
    df.select(
      SC.safeLong(col("p.idSale")).as("sale_id"),
      explode(JsonOps.arrayOrEmpty(col("p.saleItens"))).as("i"),
      col("run_id"), col("_loaded_at"), col("_updated_at"))
      // WHERE (item->>'idSaleItem') IS NOT NULL (normalize_evo_sales.py:214)
      .filter(col("i.idSaleItem").isNotNull)
      .select(
        SC.safeLong(col("i.idSaleItem")).as("sale_item_id"),
        col("sale_id"),
        SC.safeText(col("i.description")).as("description"),
        SC.safeText(col("i.item")).as("item"),
        SC.safeDecimal(col("i.itemValue")).as("item_value"),
        SC.safeDecimal(col("i.saleValue")).as("sale_value"),
        // v1 spells the source key `saleValueWithoutCreditValue`
        // (normalize_evo_sales.py:181); v2 drops the suffix
        coalesce(SC.safeDecimal(col("i.saleValueWithoutCredit")),
          SC.safeDecimal(col("i.saleValueWithoutCreditValue")))
          .as("sale_value_without_credit"),
        SC.safeInt(col("i.quantity")).as("quantity"),
        SC.safeDecimal(col("i.discount")).as("discount"),
        SC.safeDecimal(col("i.corporateDiscount")).as("corporate_discount"),
        SC.safeDecimal(col("i.tax")).as("tax"),
        SC.safeDecimal(col("i.valueNextMonth")).as("value_next_month"),
        SC.safeLong(col("i.idMembership")).as("membership_id"),
        SC.safeLong(col("i.idMembershipRenewed")).as("membership_renewed_id"),
        SC.safeLong(col("i.idMemberMembership")).as("member_membership_id"),
        SC.safeLong(col("i.idProduct")).as("product_id"),
        SC.safeLong(col("i.idService")).as("service_id"),
        coalesce(SC.safeLong(col("i.idCorporatePartnership")),
          SC.safeLong(col("i.coporatePartnershipId")))
          .as("corporate_partnership_id"),
        coalesce(SC.safeText(col("i.nameCorporatePartnership")),
          SC.safeText(col("i.corporatePartnershipName")))
          .as("corporate_partnership_name"),
        SC.safeTimestamp(col("i.membershipStartDate"))
          .as("membership_start_date"),
        SC.safeInt(col("i.numMembers")).as("num_members"),
        SC.safeText(col("i.voucher")).as("voucher"),
        SC.safeText(col("i.accountingCode")).as("accounting_code"),
        SC.safeText(col("i.municipalServiceCode"))
          .as("municipal_service_code"),
        SC.boolOrFalse(col("i.flReceiptOnly")).as("fl_receipt_only"),
        SC.boolOrFalse(col("i.flSwimming")).as("fl_swimming"),
        SC.boolOrFalse(col("i.flAllowLocker")).as("fl_allow_locker"),
        SC.safeText(col("i.idSaleItemMigration"))
          .as("sale_item_migration_id"),
        col("run_id").as("_source_run_id"),
        col("_loaded_at"), col("_updated_at"))
  }

  /** core.evo_receivables (E4, nested status/paymentType access P3). */
  def receivables(silver: DataFrame): DataFrame = {
    val df = withParsed(silver, saleSchema)
    df.select(
      SC.safeLong(col("p.idSale")).as("sale_id"),
      explode(JsonOps.arrayOrEmpty(col("p.receivables"))).as("r"),
      col("run_id"), col("_loaded_at"), col("_updated_at"))
      .select(
        SC.safeLong(col("r.idReceivable")).as("receivable_id"),
        col("sale_id"),
        SC.safeTimestamp(col("r.registrationDate")).as("registration_date"),
        SC.safeTimestamp(col("r.dueDate")).as("due_date"),
        SC.safeTimestamp(col("r.receivingDate")).as("receiving_date"),
        SC.safeTimestamp(col("r.cancellationDate")).as("cancellation_date"),
        SC.safeTimestamp(col("r.updateDate")).as("update_date"),
        SC.safeDecimal(col("r.amount"), 18, 2).as("amount"),
        // source field is misspelled `ammountPaid` — part of the contract
        SC.safeDecimal(col("r.ammountPaid"), 18, 2).as("amount_paid"),
        SC.safeLong(col("r.status.id")).as("status_id"),
        SC.safeText(col("r.status.name")).as("status_name"),
        SC.safeInt(col("r.currentInstallment")).as("current_installment"),
        SC.safeInt(col("r.totalInstallments")).as("total_installments"),
        SC.safeLong(col("r.paymentType.idPaymentType")).as("payment_type_id"),
        SC.safeText(col("r.paymentType.name")).as("payment_type_name"),
        SC.safeText(col("r.authorization")).as("authorization"),
        SC.safeText(col("r.tid")).as("tid"),
        SC.safeText(col("r.nsu")).as("nsu"),
        SC.safeText(col("r.cardFlag")).as("card_flag"),
        SC.safeText(col("r.transactionToken")).as("transaction_token"),
        col("run_id").as("_source_run_id"),
        col("_loaded_at"), col("_updated_at"))
  }

  // ---------------------------------------------------------------- entries

  val entrySchema: String =
    "date STRING, dateTurn STRING, timeZone STRING, idMember STRING, " +
      "nameMember STRING, idProspect STRING, nameProspect STRING, " +
      "idEmployee STRING, nameEmployee STRING, idBranch STRING, " +
      "entryType STRING, entryAction STRING, device STRING, " +
      "blockReason STRING, releasesByID STRING, idMigration STRING"

  /** core.evo_entries (year-partitioned, evo_schemas.sql:417-462) with
    * the deterministic MD5 surrogate id (K6). */
  def entries(silver: DataFrame): DataFrame = {
    val df = silver.withColumn("p",
      graft.functions.JsonOps.parse(col("raw_data"), entrySchema))
      .filter(col("p.date").isNotNull) // K5: no date -> dropped
    df.select(Seq(
      Keys.entryId(col("p.date"), col("p.idMember"), col("p.idProspect"),
        col("p.idEmployee"), col("p.idBranch"), col("p.device"),
        col("p.entryAction")).as("entry_id"),
      SC.safeTimestamp(col("p.date")).as("entry_date"),
      year(SC.safeTimestamp(col("p.date"))).as("entry_year"),
      SC.safeText(col("p.timeZone")).as("time_zone"),
      SC.safeLong(col("p.idMember")).as("member_id"),
      SC.safeText(col("p.nameMember")).as("member_name"),
      SC.safeLong(col("p.idProspect")).as("prospect_id"),
      SC.safeText(col("p.nameProspect")).as("prospect_name"),
      SC.safeLong(col("p.idEmployee")).as("employee_id"),
      SC.safeText(col("p.nameEmployee")).as("employee_name"),
      SC.safeLong(col("p.idBranch")).as("branch_id"),
      SC.safeText(col("p.entryType")).as("entry_type"),
      SC.safeText(col("p.entryAction")).as("entry_action"),
      SC.safeText(col("p.device")).as("device"),
      SC.safeText(col("p.blockReason")).as("block_reason"),
      SC.safeLong(col("p.releasesByID")).as("releases_by_id"),
      SC.safeLong(col("p.idMigration")).as("migration_id")) ++ audit(df): _*)
  }

  // ---------------------------------------------------------------- prospects

  val prospectSchema: String =
    "idProspect STRING, idBranch STRING, branchName STRING, " +
      "firstName STRING, lastName STRING, document STRING, email STRING, " +
      "cellphone STRING, gender STRING, birthDate STRING, address STRING, " +
      "number STRING, complement STRING, neighborhood STRING, " +
      "city STRING, state STRING, " +
      "country STRING, zipCode STRING, signupType STRING, " +
      "mktChannel STRING, currentStep STRING, gympassId STRING, " +
      "conversionDate STRING, idMember STRING, registerDate STRING, " +
      "financiallyResponsibles ARRAY<STRUCT<name: STRING, cpf: STRING, " +
      "financialResponsible: STRING>>, " +
      "interests ARRAY<STRING>, notes STRING, temperature STRING"

  /** core.evo_prospects (evo_schemas.sql:153-188; E7 element-0 access,
    * P8 conditional JSON, generated is_converted). */
  def prospects(silver: DataFrame): DataFrame = {
    val df = silver.withColumn("p",
      graft.functions.JsonOps.parse(col("raw_data"), prospectSchema))
    df.select(Seq(
      SC.safeLong(col("p.idProspect")).as("prospect_id"),
      SC.safeLong(col("p.idBranch")).as("branch_id"),
      SC.safeText(col("p.branchName")).as("branch_name"),
      SC.safeText(col("p.firstName")).as("first_name"),
      SC.safeText(col("p.lastName")).as("last_name"),
      trim(concat_ws(" ", coalesce(col("p.firstName"), lit("")),
        coalesce(col("p.lastName"), lit("")))).as("full_name"),
      SC.safeText(col("p.document")).as("document"),
      SC.safeText(col("p.email")).as("email"),
      SC.safeText(col("p.cellphone")).as("cellphone"),
      SC.safeText(col("p.gender")).as("gender"),
      SC.safeDate(col("p.birthDate")).as("birth_date"),
      SC.safeText(col("p.address")).as("address"),
      SC.safeText(col("p.number")).as("address_number"),
      SC.safeText(col("p.complement")).as("complement"),
      SC.safeText(col("p.neighborhood")).as("neighborhood"),
      SC.safeText(col("p.city")).as("city"),
      SC.safeText(col("p.state")).as("state"),
      SC.safeText(col("p.country")).as("country"),
      SC.safeText(col("p.zipCode")).as("zip_code"),
      SC.safeText(col("p.signupType")).as("signup_type"),
      SC.safeText(col("p.mktChannel")).as("mkt_channel"),
      SC.safeText(col("p.currentStep")).as("current_step"),
      SC.safeText(col("p.gympassId")).as("gympass_id"),
      SC.safeTimestamp(col("p.conversionDate")).as("conversion_date"),
      SC.safeLong(col("p.idMember")).as("member_id"),
      // generated column (evo_schemas.sql:179)
      SC.safeLong(col("p.idMember")).isNotNull.as("is_converted"),
      // E7: first financially-responsible
      get(col("p.financiallyResponsibles"), lit(0)).getField("name")
        .as("responsible_name"),
      get(col("p.financiallyResponsibles"), lit(0)).getField("cpf")
        .as("responsible_document"),
      SC.safeBool(get(col("p.financiallyResponsibles"), lit(0))
        .getField("financialResponsible")).as("responsible_is_financial"),
      SC.safeTimestamp(col("p.registerDate")).as("register_date"),
      // P8: conditional JSON construction — the reference calls this
      // residual `custom_fields` (normalize_evo_prospects.py:153-158)
      JsonOps.jsonWhen(col("p.interests").isNotNull,
        "interests" -> col("p.interests"),
        "notes" -> col("p.notes"),
        "temperature" -> col("p.temperature")).as("custom_fields"))
      ++ audit(df): _*)
  }
}
