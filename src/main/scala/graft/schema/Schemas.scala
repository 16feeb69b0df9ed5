package graft.schema

import org.apache.spark.sql.types._

/** Full declared schemas for the 12 RSBSA target tables, transcribed
  * from the reference DDL (`services/etlService.js:244-591`) with the
  * MySQL→Spark type mapping of SURVEY.md §1.2:
  * INT→Integer, TINYINT(1)→Boolean, wider TINYINT→Byte,
  * ZEROFILL ints→Integer (display padding applied on export via
  * `Normalize.zeroPad`), VARCHAR/TEXT/ENUM→String (+ domains listed in
  * [[Schemas.enumDomains]] for validation), DECIMAL preserved,
  * FLOAT(10,0)→Float, DATE→Date, DATETIME→TimestampNTZ,
  * TIMESTAMP→Timestamp, POLYGON/POINT→Binary (WKB pass-through).
  * AUTO_INCREMENT surrogate keys are sink concerns and omitted.
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def b(n: String) = StructField(n, BooleanType)
  private def by(n: String) = StructField(n, ByteType)
  private def d(n: String) = StructField(n, DateType)
  private def ts(n: String) = StructField(n, TimestampType)
  private def dt(n: String) = StructField(n, TimestampNTZType)
  private def dec(n: String, p: Int, sc: Int) = StructField(n, DecimalType(p, sc))
  private def f(n: String) = StructField(n, FloatType)
  private def bin(n: String) = StructField(n, BinaryType)

  /** ENUM column domains (no Spark enum type — enforced by an
    * `isin` validation stage, SURVEY.md §1.2).
    */
  val enumDomains: Map[String, Seq[String]] = Map(
    "data_source" -> Seq("FFRS", "NFFIS", "NCFRSS", "NIA", "FISHR"),
    "deceased" -> Seq("1", "0"),
    "ch_occupation" -> Seq("active", "inactive"),
    "duplicated" -> Seq("1", "0"),
    "validated" -> Seq("1", "0", "2"),
    "submitted" -> Seq("1", "0"),
    "rfo_validated" -> Seq("1", "0"),
    "online_applicant" -> Seq("1", "0"),
    "checked" -> Seq("1", "0"),
    "validity_file" -> Seq("1", "0", "2"),
    "active" -> Seq("1", "0"),
    "intercrop" -> Seq("1", "2"),
  )

  /** `farmers_kyc1` (`etlService.js:244-301`). */
  val farmersKyc1: StructType = StructType(Seq(
    s("farmerID"), s("philsys_trn"), s("philsys_pcn"), i("sequence"),
    s("rsbsa_no"), s("source_rsbsa_no"), s("data_source"),
    s("other_sys_gen_id"), s("other_sys_id"), s("enrollment"),
    s("file_picture"), s("control_no"), s("first_name"), s("middle_name"),
    s("surname"), s("ext_name"), s("mother_maiden_name"),
    s("spouse_rsbsa_no"), s("maiden_fname"), s("maiden_mname"),
    s("maiden_lname"), s("maiden_extname"), b("sex"), d("birthday"),
    s("birth_place"), s("birth_prv"), s("birth_prv_mun"), s("house_no"),
    s("street"), i("brgy1"), i("mun1"), i("prv1"), i("reg1"),
    s("geo_code"), s("geocode"), i("brgy"), i("mun"), i("prv"), i("reg"),
    i("ncr_brgy"), i("ncr_mun"), i("ncr_prv"), i("ncr_reg"),
    s("ncr_house_no"), s("ncr_street"), dt("c_date"), s("clone_by_id"),
    s("clone_by_fullname"), ts("date_cloned"), b("v1_v2"),
  ))

  /** `farmers_kyc2` (`etlService.js:303-344`). */
  val farmersKyc2: StructType = StructType(Seq(
    s("rsbsa_no"), s("contact_num"), b("contact_num_question"),
    s("mob_number_fname"), s("mob_number_mname"), s("mob_number_lname"),
    s("mob_number_extname"), s("landline_num"), b("education"), b("pwd"),
    s("religion"), b("civil_status"), s("spouse"), s("spouse_fname"),
    s("spouse_mname"), s("spouse_lname"), s("spouse_extname"),
    s("spouse_rsbsa_no"), b("beneficiary_4ps"), b("ind_ans"), s("ind_id"),
    b("gov_ans"), s("gov_id"), s("gov_id_num"), b("hh_head"),
    s("hh_head_name"), s("hh_relationship"), i("hh_no_members"),
    i("hh_no_male"), i("hh_no_female"), b("fca_ans"), s("fca_id"),
    s("emergency_name"), s("emergency_contact"),
  ))

  /** `farmers_kyc3` (`etlService.js:346-362`). */
  val farmersKyc3: StructType = StructType(Seq(
    s("rsbsa_no"), i("no_farm_parcels"), b("arb"),
    dec("gross_income_farming", 10, 2), dec("gross_income_nonfarming", 10, 2),
    d("vtc_date"), s("vtc_bgy_chair"), s("vtc_agri_office"),
    s("vtc_mafc_chair"),
  ))

  /** `farmers_kyc4` (`etlService.js:364-416`). */
  val farmersKyc4: StructType = StructType(Seq(
    s("rsbsa_no"), s("encoder_agency"), s("encoder_id"),
    s("encoder_fullname"), s("encoder_id_updated"),
    s("encoder_fullname_updated"), ts("date_created"), ts("date_updated"),
    s("deceased"), s("deceased_reason"), s("ch_occupation"),
    s("ch_occupation_reason"), s("duplicated"), s("duplicated_reason"),
    s("duplicated_rsbsa_no"), by("rffa2_cashout"), s("validated"),
    s("unvalidated_reason"), s("validator_by_id"), s("validator_fullname"),
    dt("date_validated"), s("submitted"), dt("date_submitted"),
    s("submitted_by_id"), s("submitted_by_fullname"), s("rfo_validated"),
    dt("rfo_date_validated"), s("rfo_validated_id"),
    s("rfo_validated_fullname"), s("online_applicant"), dt("checked_date"),
    s("checked"), s("checked_by_id"), s("checked_fullname"),
    s("complete_cloned_by_fullname"), s("complete_cloned_by_id"),
    ts("date_cloned_completed"), i("rsbsa_liveness_verified"),
    dt("rsbsa_last_liveness_date"), s("rsbsa_last_user_id_liveness"),
    s("rsbsa_last_user_fullname_liveness"), i("philsys_liveness_verified"),
    dt("philsys_last_liveness_date"), s("philsys_last_user_id_liveness"),
    s("philsys_last_user_fullname_liveness"),
  ))

  /** `farmers_attachments` (`etlService.js:418-433`). */
  val farmersAttachments: StructType = StructType(Seq(
    s("rsbsa_no"), s("filename"), s("validity_file"), ts("date_created"),
    s("active"), s("encoder_agency"), s("encoder_id"), s("encoder_fullname"),
  ))

  /** `farmers_fca` (`etlService.js:435-450`). */
  val farmersFca: StructType = StructType(Seq(
    s("rsbsa_no"), s("fca_id"), s("fca_name"), ts("date_created"),
    s("active"), s("encoder_agency"), s("encoder_id"), s("encoder_fullname"),
  ))

  /** `farmers_form_attachments` (`etlService.js:452-466`). */
  val farmersFormAttachments: StructType = StructType(Seq(
    s("rsbsa_no"), s("filename"), ts("date_created"), s("active"),
    s("encoder_agency"), s("encoder_id"), s("encoder_fullname"),
  ))

  /** `farmers_livelihood` (`etlService.js:468-480`). */
  val farmersLivelihood: StructType = StructType(Seq(
    s("rsbsa_no"), s("livelihood"), s("activity_work"), s("specify"),
    s("active"),
  ))

  /** `farmparcelactivity` (`etlService.js:482-509`). */
  val farmparcelActivity: StructType = StructType(Seq(
    s("parcel_id"), s("rsbsa_no"), i("crop_id"), dec("size", 10, 4),
    dec("temp_size", 10, 4), dec("orig", 10, 4), i("no_heads"),
    b("farm_type"), b("organic"), s("active"), s("encoder_agency"),
    s("encoder_id"), s("encoder_fullname"), ts("date_created"),
    by("slip_b_update"), by("from_slip_b_update"), s("intercrop"),
    by("crop_date_start"), by("crop_date_end"), s("gpx_id"),
  ))

  /** `farmparcelattachments` (`etlService.js:511-528`). */
  val farmparcelAttachments: StructType = StructType(Seq(
    s("parcel_id"), s("rsbsa_no"), s("file_name"), s("active"),
    s("encoder_agency"), s("encoder_id"), s("encoder_fullname"),
    ts("date_created"),
  ))

  /** `farmparcel` (`etlService.js:530-573`) — keyed by `parcel_id`;
    * `long` is a deliberate reserved-word column; geometry is WKB
    * pass-through (never computed on).
    */
  val farmparcel: StructType = StructType(Seq(
    StructField("parcel_id", StringType, nullable = false),
    by("parcel_no"), by("arb"), by("ancestral"),
    i("bgy1"), i("mun1"), i("prv1"), i("reg1"), s("geo_code"),
    i("bgy"), i("mun"), i("prv"), i("reg"), s("desc_location"),
    bin("parcel_geo_pol"), bin("parcel_geo_point"), f("lat"), f("long"),
    dec("farm_area", 10, 4), dec("temp_farm_area", 10, 4),
    s("unit_measure"), by("own_doc"), s("own_doc_no"), b("type"),
    s("owner_firstname"), s("owner_lastname"), s("owner_extname"),
    b("owner_ans"), s("owner_rsbsa_no"), s("farmers_rotation_fullname"),
    s("farmers_rotation_rsbsa_no"), s("remarks"), s("attachment"),
    s("active"), ts("date_created"), by("slip_b_update"),
    by("from_slip_b_update"),
  ))

  /** `farmparcelownership` (`etlService.js:575-591`). */
  val farmparcelOwnership: StructType = StructType(Seq(
    s("parcel_id"), s("rsbsa_no"), s("own_status"), ts("date_created"),
    s("active"), s("encoder_agency"), s("encoder_id"), s("encoder_fullname"),
  ))

  /** Lookup by table name (K4 ensure-schema surface). */
  val byName: Map[String, StructType] = Map(
    "farmers_kyc1" -> farmersKyc1,
    "farmers_kyc2" -> farmersKyc2,
    "farmers_kyc3" -> farmersKyc3,
    "farmers_kyc4" -> farmersKyc4,
    "farmers_attachments" -> farmersAttachments,
    "farmers_fca" -> farmersFca,
    "farmers_form_attachments" -> farmersFormAttachments,
    "farmers_livelihood" -> farmersLivelihood,
    "farmparcelactivity" -> farmparcelActivity,
    "farmparcelattachments" -> farmparcelAttachments,
    "farmparcel" -> farmparcel,
    "farmparcelownership" -> farmparcelOwnership,
  )
}
