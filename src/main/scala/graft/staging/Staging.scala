package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Config

/** The dbt staging layer (`dbt/models/staging/`) as view-producing
  * `DataFrame => DataFrame` transforms. Staging models are *views* in the
  * reference (`dbt_project.yml:25-26`) — we keep them unmaterialized so
  * Catalyst inlines them and pushes fact-layer filters down to the Parquet
  * scans (SURVEY §4).
  */
object Staging {

  /** `data_quality_score` bucketing shared by all three models
    * (`stg_patient_vitals.sql:138-144`, `stg_insurance_claims.sql:153-159`).
    */
  def qualityCategory(score: Column): Column =
    when(score >= 0.9, "excellent")
      .when(score >= 0.7, "good")
      .when(score >= 0.5, "fair")
      .otherwise("poor")

  /** BigQuery's `CASE WHEN cond THEN TRUE ELSE FALSE END` — NULL input
    * falls through to FALSE, matching `when(cond, true).otherwise(false)`.
    */
  private def flag(cond: Column): Column = when(cond, true).otherwise(false)

  /** `stg_patient_vitals` (`dbt/models/staging/stg_patient_vitals.sql`):
    * rename timestamps, range-validate vitals to NULL (P5), alert flags,
    * derived metrics (pulse pressure, rate-pressure product), time and
    * quality categorizations; NOT NULL grain filter (P4, lines 107-108).
    */
  def stgPatientVitals(cfg: Config = Config.default)(vitals: DataFrame): DataFrame = {
    def validated(c: String, lo: Double, hi: Double): Column =
      when(col(c).between(lo, hi), col(c))

    vitals
      .filter(col("patient_id").isNotNull && col("timestamp").isNotNull)
      .select(
        col("patient_id"), col("device_id"), col("location"),
        col("timestamp").as("measurement_timestamp"),
        col("processed_at").as("processed_timestamp"),
        validated("heart_rate", cfg.heartRateMin, cfg.heartRateMax).as("heart_rate"),
        validated("blood_pressure_systolic", cfg.systolicMin, cfg.systolicMax).as("blood_pressure_systolic"),
        validated("blood_pressure_diastolic", cfg.diastolicMin, cfg.diastolicMax).as("blood_pressure_diastolic"),
        validated("temperature", cfg.temperatureMin, cfg.temperatureMax).as("temperature"),
        validated("oxygen_saturation", cfg.oxygenMin, cfg.oxygenMax).as("oxygen_saturation"),
        validated("respiratory_rate", cfg.respiratoryMin, cfg.respiratoryMax).as("respiratory_rate"),
        col("heart_rate_category"), col("hour_of_day"), col("day_of_week"),
        col("data_quality_score"),
        // anomaly/alert flags computed on the RAW (pre-validation) columns,
        // exactly as the SQL does (stg_patient_vitals.sql:69-104)
        flag(!col("heart_rate").between(cfg.heartRateMin, cfg.heartRateMax)).as("heart_rate_anomaly"),
        flag(!col("temperature").between(cfg.temperatureMin, cfg.temperatureMax)).as("temperature_anomaly"),
        flag(col("oxygen_saturation") < cfg.lowOxygenThreshold).as("low_oxygen_alert"),
        flag(col("heart_rate") > cfg.highHeartRate).as("elevated_heart_rate_alert"),
        flag(col("heart_rate") < cfg.lowHeartRate).as("low_heart_rate_alert"),
        flag(col("temperature") > cfg.feverThreshold).as("fever_alert"))
      // final CTE (lines 111-147): derived metrics over the validated columns
      .withColumn("pulse_pressure",
        when(col("blood_pressure_systolic").isNotNull && col("blood_pressure_diastolic").isNotNull,
          col("blood_pressure_systolic") - col("blood_pressure_diastolic")))
      .withColumn("rate_pressure_product",
        when(col("heart_rate").isNotNull && col("blood_pressure_systolic").isNotNull,
          col("heart_rate") * col("blood_pressure_systolic") / 100))
      .withColumn("shift_category",
        when(col("hour_of_day").between(6, 18), "day_shift").otherwise("night_shift"))
      .withColumn("day_category",
        when(col("day_of_week").isin("Saturday", "Sunday"), "weekend").otherwise("weekday"))
      .withColumn("quality_category", qualityCategory(col("data_quality_score")))
  }

  /** `stg_insurance_claims` (`dbt/models/staging/stg_insurance_claims.sql`):
    * amount validation to NULL, business/anomaly flags, comma-split array
    * counts (the string-round-trip of F15), efficiency / value / insurance /
    * lifecycle categorizations; NOT NULL grain filter (lines 92-94).
    */
  def stgInsuranceClaims(cfg: Config = Config.default)(claims: DataFrame): DataFrame =
    claims
      .filter(col("claim_id").isNotNull && col("patient_id").isNotNull && col("service_date").isNotNull)
      .select(
        col("claim_id"), col("patient_id"), col("provider_id"),
        col("service_date"), col("submission_date"),
        col("processed_at").as("processed_timestamp"),
        when(col("total_amount").between(cfg.amountMin, cfg.amountMax), col("total_amount")).as("total_amount"),
        col("insurance_type"), col("claim_status"), col("amount_category"),
        col("diagnosis_codes"), col("procedure_codes"),
        col("processing_days"), col("data_quality_score"),
        flag(!col("total_amount").between(cfg.amountMin, cfg.amountMax)).as("amount_anomaly"),
        flag(col("processing_days") < 0).as("negative_processing_days"),
        flag(col("processing_days") > 365).as("excessive_processing_days"),
        flag(col("total_amount") > cfg.highValueClaimThreshold).as("high_value_claim"),
        flag(col("claim_status") === "Denied").as("denied_claim"),
        flag(col("claim_status") === "Paid").as("paid_claim"),
        flag(col("claim_status").isin("Submitted", "Under Review")).as("pending_claim"))
      .withColumn("daily_claim_value",
        when(col("total_amount").isNotNull && col("processing_days") > 0,
          col("total_amount") / col("processing_days")))
      .withColumn("diagnosis_count",
        when(col("diagnosis_codes").isNotNull, size(split(col("diagnosis_codes"), ","))).otherwise(0))
      .withColumn("procedure_count",
        when(col("procedure_codes").isNotNull, size(split(col("procedure_codes"), ","))).otherwise(0))
      .withColumn("processing_efficiency",
        when(col("processing_days") <= 7, "excellent")
          .when(col("processing_days") <= 30, "good")
          .when(col("processing_days") <= 90, "fair")
          .otherwise("poor"))
      .withColumn("value_category",
        when(col("total_amount") < 100, "low_value")
          .when(col("total_amount") < 1000, "medium_value")
          .when(col("total_amount") < 10000, "high_value")
          .otherwise("very_high_value"))
      .withColumn("insurance_category",
        when(col("insurance_type").isin("Medicare", "Medicaid"), "government")
          .when(col("insurance_type") === "Private", "private")
          .otherwise("self_pay"))
      .withColumn("lifecycle_stage",
        when(col("claim_status") === "Submitted", "submitted")
          .when(col("claim_status") === "Under Review", "reviewing")
          .when(col("claim_status") === "Approved", "approved")
          .when(col("claim_status") === "Denied", "denied")
          .when(col("claim_status") === "Paid", "paid")
          .otherwise("unknown"))
      .withColumn("quality_category", qualityCategory(col("data_quality_score")))

  /** `stg_ehr_records` — referenced by the fact model
    * (`fact_patient_encounters.sql:76`) but **absent from the reference**
    * (SURVEY gap list). Inferred by analogy with the two existing staging
    * models over the EHR sink schema (`healthcare_etl_pipeline.py:331-335`):
    * NOT NULL grain filter on the key columns, pass-through of the 11
    * columns the fact model consumes (`fact_patient_encounters.sql:64-75`),
    * plus the standard quality categorization.
    */
  def stgEhrRecords(cfg: Config = Config.default)(ehr: DataFrame): DataFrame =
    ehr
      .filter(col("record_id").isNotNull && col("patient_id").isNotNull && col("visit_date").isNotNull)
      .select(
        col("record_id"), col("patient_id"), col("visit_date"), col("provider_id"),
        col("diagnosis"), col("treatment"), col("medications"), col("lab_results"),
        col("medication_count"), col("lab_test_count"), col("notes"),
        col("processed_at").as("processed_timestamp"),
        col("data_quality_score"))
      .withColumn("quality_category", qualityCategory(col("data_quality_score")))
}
