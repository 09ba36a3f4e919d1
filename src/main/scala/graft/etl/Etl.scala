package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Config, Schemas}

/** The reference's Beam ETL graph (`dataflow/pipelines/healthcare_etl_pipeline.py`)
  * re-expressed as pure `DataFrame => DataFrame` stages, composable with
  * `.transform(...)` and identical under batch (`spark.read`) and Structured
  * Streaming (`spark.readStream`) — SURVEY §2.9 R4.
  *
  * Every Beam `DoFn` here becomes native Catalyst column expressions
  * (SURVEY §2.10): the whole chain is one narrow, shuffle-free,
  * whole-stage-codegen'd pipeline — which is what makes it scale linearly
  * to 100 TB: no state, no exchange, pure map fusion.
  */
object Etl {

  /** Parse stage (`healthcare_etl_pipeline.py:49-75`, S2): JSON decode with
    * a dead-letter channel instead of crashing, plus `processed_at` /
    * `pipeline_version` metadata stamps. Input: one string column `value`.
    *
    * Reference behavior reproduced:
    *  - malformed JSON → `error='invalid_json'`, original kept in `raw_message`;
    *  - missing required fields per type → `error='processing_error'`
    *    (the `_validate_*` ValueError path, lines 77-107);
    *  - range anomalies → `*_anomaly` flags (lines 84-100).
    */
  def parse(cfg: Config = Config.default)(raw: DataFrame): DataFrame = {
    // `explode(array(...))` is a one-row generator BARRIER around the
    // parse: downstream references see a plain attribute, not the
    // JsonToStructs expression — without it, Catalyst's JSON schema
    // pruning rewrites EVERY `msg.<field>` reference into its own
    // single-field from_json (29 copies of the parse per row in this
    // pipeline's physical plan, 4× the whole chain's cost; pruning
    // only wins when a plan touches a FEW fields, not ~all of them).
    val parsed = raw
      .withColumn("msg", explode(array(from_json(col("value"), Schemas.messageEnvelope))))
      .withColumn("processed_at", lit(cfg.asOf))
      .withColumn("pipeline_version", lit("1.0.0"))

    // from_json yields null (or an all-null struct) on corrupt input
    val invalidJson = col("msg").isNull ||
      (col("msg.data_type").isNull && col("msg.patient_id").isNull && col("msg.record_id").isNull)

    val dt = coalesce(col("msg.data_type"), lit("unknown"))

    def missingAny(fields: String*): Column =
      fields.map(f => col(s"msg.$f").isNull).reduce(_ || _)

    // Required-field validation per type (P1; lines 77-107)
    val processingError =
      (dt === "patient_vitals" && missingAny("patient_id", "heart_rate", "temperature", "timestamp")) ||
        (dt === "insurance_claim" && missingAny("claim_id", "patient_id", "total_amount", "service_date")) ||
        (dt === "ehr_record" && missingAny("record_id", "patient_id", "visit_date", "diagnosis"))

    parsed
      .withColumn("error",
        when(invalidJson, lit("invalid_json"))
          .when(processingError, lit("processing_error")))
      .withColumn("raw_message", when(col("error").isNotNull, col("value")))
      // Range-anomaly flags (P2; lines 84-100). Beam only sets the key when
      // anomalous; we model absent-or-false as null/false — the filter and
      // score stages treat them identically.
      .withColumn("heart_rate_anomaly",
        dt === "patient_vitals" && col("msg.heart_rate").isNotNull &&
          !col("msg.heart_rate").between(cfg.etlHeartRateMin, cfg.etlHeartRateMax))
      .withColumn("temperature_anomaly",
        dt === "patient_vitals" && col("msg.temperature").isNotNull &&
          !col("msg.temperature").between(cfg.etlTemperatureMin, cfg.etlTemperatureMax))
      .withColumn("amount_anomaly",
        dt === "insurance_claim" && coalesce(col("msg.total_amount"), lit(0.0)) <= 0.0)
      .select(col("msg.*"), col("processed_at"), col("pipeline_version"),
        col("error"), col("raw_message"),
        col("heart_rate_anomaly"), col("temperature_anomaly"), col("amount_anomaly"))
  }

  /** DataQualityFilter's predicate (P3;
    * `healthcare_etl_pipeline.py:109-121`): records carrying an error
    * or any truthy anomaly flag drop.
    */
  private def qualityCondition: Column =
    col("error").isNull &&
      !coalesce(col("heart_rate_anomaly"), lit(false)) &&
      !coalesce(col("temperature_anomaly"), lit(false)) &&
      !coalesce(col("amount_anomaly"), lit(false))

  def qualityFilter(df: DataFrame): DataFrame = df.filter(qualityCondition)


  /** Data-quality score (A11; `healthcare_etl_pipeline.py:143-159`) as a
    * single folded column expression: start at 1.0, −0.2 per missing
    * `patient_id`/`timestamp`, −0.3 per truthy anomaly flag, clamped ≥ 0.
    * Note: claims/EHR messages carry no `timestamp` field, so their score
    * baselines at 0.8 — reproduced faithfully.
    */
  def qualityScore: Column = {
    val missingPenalty =
      when(col("patient_id").isNull || col("patient_id") === "", 0.2).otherwise(0.0) +
        when(col("timestamp").isNull || col("timestamp") === "", 0.2).otherwise(0.0)
    val anomalyPenalty = Seq("heart_rate_anomaly", "temperature_anomaly", "amount_anomaly")
      .map(f => when(coalesce(col(f), lit(false)), 0.3).otherwise(0.0))
      .reduce(_ + _)
    greatest(lit(0.0), lit(1.0) - missingPenalty - anomalyPenalty)
  }

  /** DataEnricher (`healthcare_etl_pipeline.py:123-208`): common
    * `enriched_at` + quality score, then type-specific derived columns.
    */
  def enrich(cfg: Config = Config.default)(df: DataFrame): DataFrame = {
    val ts = to_timestamp(col("timestamp"))
    df
      .withColumn("enriched_at", lit(cfg.asOf))
      .withColumn("data_quality_score", qualityScore)
      // vitals (lines 161-178)
      .withColumn("heart_rate_category",
        when(col("data_type") =!= "patient_vitals", lit(null).cast("string"))
          .when(col("heart_rate") > cfg.highHeartRate, "elevated")
          .when(col("heart_rate") < cfg.lowHeartRate, "low")
          .otherwise("normal"))
      .withColumn("hour_of_day",
        when(col("data_type") === "patient_vitals", hour(ts)))
      .withColumn("day_of_week",
        when(col("data_type") === "patient_vitals", date_format(ts, "EEEE")))
      // claims (lines 180-196)
      .withColumn("processing_days",
        when(col("data_type") === "insurance_claim",
          datediff(to_date(col("submission_date")), to_date(col("service_date")))))
      .withColumn("amount_category",
        when(col("data_type") =!= "insurance_claim", lit(null).cast("string"))
          .when(col("total_amount") < 100, "low")
          .when(col("total_amount") < 1000, "medium")
          .otherwise("high"))
      // EHR (lines 198-208)
      .withColumn("medication_count",
        when(col("data_type") === "ehr_record", size(col("medications"))))
      .withColumn("lab_test_count",
        when(col("data_type") === "ehr_record", size(col("lab_results"))))
  }

  /** Full parse→filter→enrich chain (the pipeline graph, lines 270-287). */
  def pipeline(cfg: Config = Config.default)(raw: DataFrame): DataFrame =
    raw.transform(parse(cfg)).transform(qualityFilter).transform(enrich(cfg))

  // ---- DataPartitioner (R1; lines 210-223) + sink projections (S3) ----
  // One projection per BigQuery sink schema (lines 300-305, 316-320,
  // 331-335). Arrays flatten to comma-joined strings and lab_results to a
  // JSON string, reproducing "arrays stored as strings in BigQuery"
  // (stg_insurance_claims.sql:36-38).

  /** `processed.patient_vitals` sink schema (lines 300-305). */
  def routeVitals(df: DataFrame): DataFrame =
    df.filter(col("data_type") === "patient_vitals").select(
      col("patient_id"),
      to_timestamp(col("timestamp")).as("timestamp"),
      col("heart_rate"), col("blood_pressure_systolic"), col("blood_pressure_diastolic"),
      col("temperature"), col("oxygen_saturation"), col("respiratory_rate"),
      col("device_id"), col("location"), col("processed_at"),
      col("heart_rate_category"), col("hour_of_day"), col("day_of_week"),
      col("data_quality_score"))

  /** `processed.insurance_claims` sink schema (lines 316-320). */
  def routeClaims(df: DataFrame): DataFrame =
    df.filter(col("data_type") === "insurance_claim").select(
      col("claim_id"), col("patient_id"), col("provider_id"),
      to_date(col("service_date")).as("service_date"),
      array_join(col("diagnosis_codes"), ",").as("diagnosis_codes"),
      array_join(col("procedure_codes"), ",").as("procedure_codes"),
      col("total_amount"), col("insurance_type"), col("claim_status"),
      to_date(col("submission_date")).as("submission_date"),
      col("processed_at"), col("processing_days"), col("amount_category"),
      col("data_quality_score"))

  /** `processed.ehr_records` sink schema (lines 331-335). */
  def routeEhr(df: DataFrame): DataFrame =
    df.filter(col("data_type") === "ehr_record").select(
      col("record_id"), col("patient_id"),
      to_date(col("visit_date")).as("visit_date"),
      col("provider_id"), col("diagnosis"), col("treatment"),
      array_join(col("medications"), ",").as("medications"),
      to_json(col("lab_results")).as("lab_results"),
      col("notes"), col("processed_at"), col("medication_count"),
      col("lab_test_count"), col("data_quality_score"))

  /** Dead-letter channel (S4; lines 341-348): anything that is neither of
    * the three known types — written as JSON text by the runner.
    */
  def routeUnknown(df: DataFrame): DataFrame =
    df.filter(!col("data_type").isin("patient_vitals", "insurance_claim", "ehr_record") ||
      col("data_type").isNull)
}
