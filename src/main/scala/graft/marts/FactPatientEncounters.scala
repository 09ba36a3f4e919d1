package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Config

/** The mart layer: `dbt/models/marts/fact_patient_encounters.sql`.
  *
  * Dataflow (SURVEY §3, entry point 2): three lookback-filtered staging
  * scans → proximity band LEFT JOIN vitals↔claims (J1) with ROW_NUMBER
  * proximity rank (W1) → proximity band LEFT JOIN ↔EHR (J2, W2) → wide
  * GROUP BY with mixed/conditional aggregates, complexity score, risk and
  * encounter-type categorization (A1-A3).
  *
  * Scale notes (SURVEY §7.4): the equi-part of each join is
  * `patient_id`, so both joins shuffle on the same key and the windows
  * (partitioned by `patient_id, measurement_timestamp`) reuse that
  * clustering — Catalyst inserts no extra exchange, only sorts. The ±7-day
  * band predicate stays a join residual, which is correct and cheap as
  * long as per-patient claim/EHR counts inside the lookback window are
  * bounded (they are: events per patient per 30 days). At extreme skew,
  * `graft.operators.BandJoin` provides the bucketed equi-join rewrite.
  * `CURRENT_TIMESTAMP()`/`CURRENT_DATE()` are parameterized via
  * `cfg.asOf` so results are deterministic (SURVEY §7.4).
  */
object FactPatientEncounters {

  def build(cfg: Config = Config.default)(
      stgVitals: DataFrame, stgClaims: DataFrame, stgEhr: DataFrame): DataFrame = {

    val asOfTs = lit(cfg.asOf)
    val asOfDate = to_date(asOfTs)

    // vitals CTE (fact_patient_encounters.sql:8-33): 30-day lookback (P6)
    val vitals = stgVitals
      .filter(col("measurement_timestamp") >= asOfTs - expr(s"INTERVAL ${cfg.lookbackDays} DAYS"))
      .select("patient_id", "measurement_timestamp", "device_id", "location",
        "heart_rate", "blood_pressure_systolic", "blood_pressure_diastolic",
        "temperature", "oxygen_saturation", "respiratory_rate",
        "heart_rate_category", "pulse_pressure", "rate_pressure_product",
        "shift_category", "day_category", "quality_category",
        "low_oxygen_alert", "elevated_heart_rate_alert", "low_heart_rate_alert", "fever_alert")
      .alias("v")

    // claims CTE (lines 35-61)
    val claims = stgClaims
      .filter(col("service_date") >= date_sub(asOfDate, cfg.lookbackDays))
      .select("patient_id", "claim_id", "service_date", "submission_date", "provider_id",
        "total_amount", "insurance_type", "insurance_category", "claim_status",
        "lifecycle_stage", "amount_category", "value_category", "processing_days",
        "processing_efficiency", "diagnosis_count", "procedure_count", "daily_claim_value",
        "denied_claim", "paid_claim", "pending_claim", "high_value_claim")
      .alias("c")

    // ehr CTE (lines 63-78)
    val ehr = stgEhr
      .filter(col("visit_date") >= date_sub(asOfDate, cfg.lookbackDays))
      .select("patient_id", "record_id", "visit_date", "provider_id", "diagnosis",
        "treatment", "medications", "lab_results", "medication_count", "lab_test_count", "notes")
      .alias("e")

    // vitals_with_claims (lines 81-115): J1 equi on patient_id + ±7-day band
    // residual, then W1 proximity rank over the vitals grain.
    val claimDayDist = abs(datediff(to_date(col("v.measurement_timestamp")), col("c.service_date")))
    val vitalsWithClaims = vitals
      .join(claims,
        col("v.patient_id") === col("c.patient_id") && claimDayDist <= cfg.proximityDays,
        "left")
      .select(
        col("v.*"),
        col("c.claim_id"), col("c.service_date"), col("c.submission_date"),
        col("c.provider_id").as("claim_provider_id"),
        col("c.total_amount"), col("c.insurance_type"), col("c.insurance_category"),
        col("c.claim_status"), col("c.lifecycle_stage"), col("c.amount_category"),
        col("c.value_category"), col("c.processing_days"), col("c.processing_efficiency"),
        col("c.diagnosis_count"), col("c.procedure_count"), col("c.daily_claim_value"),
        col("c.denied_claim"), col("c.paid_claim"), col("c.pending_claim"), col("c.high_value_claim"),
        datediff(to_date(col("v.measurement_timestamp")), col("c.service_date")).as("days_from_service"),
        row_number().over(
          Window.partitionBy(col("v.patient_id"), col("v.measurement_timestamp"))
            .orderBy(claimDayDist)).as("claim_proximity_rank"))
      .alias("vc")

    // encounters (lines 118-142): J2 + W2 against EHR
    val ehrDayDist = abs(datediff(to_date(col("vc.measurement_timestamp")), col("e.visit_date")))
    val encounters = vitalsWithClaims
      .join(ehr,
        col("vc.patient_id") === col("e.patient_id") && ehrDayDist <= cfg.proximityDays,
        "left")
      .select(
        col("vc.*"),
        col("e.record_id"), col("e.visit_date"),
        col("e.provider_id").as("ehr_provider_id"),
        col("e.diagnosis"), col("e.treatment"), col("e.medications"), col("e.lab_results"),
        col("e.medication_count"), col("e.lab_test_count"), col("e.notes"),
        datediff(to_date(col("vc.measurement_timestamp")), col("e.visit_date")).as("days_from_visit"),
        row_number().over(
          Window.partitionBy(col("vc.patient_id"), col("vc.measurement_timestamp"))
            .orderBy(ehrDayDist)).as("ehr_proximity_rank"))

    // encounter_metrics (lines 145-239): wide GROUP BY over the full grain
    // (34 columns incl. the proximity ranks and joined ids — reproduced
    // as-is for parity, SURVEY A1 note), mixed + conditional aggregates.
    val grain = Seq(
      "patient_id", "measurement_timestamp", "device_id", "location",
      "heart_rate", "blood_pressure_systolic", "blood_pressure_diastolic",
      "temperature", "oxygen_saturation", "respiratory_rate", "heart_rate_category",
      "pulse_pressure", "rate_pressure_product", "shift_category", "day_category",
      "quality_category", "low_oxygen_alert", "elevated_heart_rate_alert",
      "low_heart_rate_alert", "fever_alert", "claim_proximity_rank", "ehr_proximity_rank",
      "claim_id", "service_date", "total_amount", "insurance_type", "claim_status",
      "processing_days", "record_id", "visit_date", "diagnosis", "treatment",
      "medication_count", "lab_test_count")

    def cnt(flagCol: String): org.apache.spark.sql.Column =
      sum(when(col(flagCol), 1).otherwise(0))

    val aggregated = encounters
      .groupBy(grain.map(col): _*)
      .agg(
        countDistinct(col("claim_id")).as("total_claims"),
        countDistinct(col("record_id")).as("total_ehr_records"),
        sum(col("total_amount")).as("total_claim_value"),
        avg(col("processing_days")).as("avg_processing_days"),
        cnt("denied_claim").as("denied_claims_count"),
        cnt("paid_claim").as("paid_claims_count"),
        cnt("pending_claim").as("pending_claims_count"),
        cnt("high_value_claim").as("high_value_claims_count"),
        // Weighted composite (A3, lines 199-205)
        (coalesce(countDistinct(col("claim_id")), lit(0)) * 0.3 +
          coalesce(countDistinct(col("record_id")), lit(0)) * 0.2 +
          coalesce(sum(col("diagnosis_count")), lit(0)) * 0.2 +
          coalesce(sum(col("procedure_count")), lit(0)) * 0.2 +
          coalesce(sum(col("medication_count")), lit(0)) * 0.1).as("encounter_complexity_score"))

    aggregated
      // closest-match projection (lines 173-186): rank=1 keeps the
      // temporally nearest claim/EHR per vitals row (J3/O2)
      .withColumn("primary_claim_id", when(col("claim_proximity_rank") === 1, col("claim_id")))
      .withColumn("primary_service_date", when(col("claim_proximity_rank") === 1, col("service_date")))
      .withColumn("primary_claim_amount", when(col("claim_proximity_rank") === 1, col("total_amount")))
      .withColumn("primary_insurance_type", when(col("claim_proximity_rank") === 1, col("insurance_type")))
      .withColumn("primary_claim_status", when(col("claim_proximity_rank") === 1, col("claim_status")))
      .withColumn("primary_processing_days", when(col("claim_proximity_rank") === 1, col("processing_days")))
      .withColumn("primary_ehr_record_id", when(col("ehr_proximity_rank") === 1, col("record_id")))
      .withColumn("primary_visit_date", when(col("ehr_proximity_rank") === 1, col("visit_date")))
      .withColumn("primary_diagnosis", when(col("ehr_proximity_rank") === 1, col("diagnosis")))
      .withColumn("primary_treatment", when(col("ehr_proximity_rank") === 1, col("treatment")))
      .withColumn("primary_medication_count", when(col("ehr_proximity_rank") === 1, col("medication_count")))
      .withColumn("primary_lab_test_count", when(col("ehr_proximity_rank") === 1, col("lab_test_count")))
      // risk (lines 208-214) — BigQuery NULL semantics: NULL conditions fall through
      .withColumn("risk_level",
        when(col("low_oxygen_alert") || col("elevated_heart_rate_alert") ||
          col("low_heart_rate_alert") || col("fever_alert"), "high_risk")
          .when(col("heart_rate_category") =!= "normal" || col("temperature") > 37.5, "medium_risk")
          .otherwise("low_risk"))
      // encounter type (lines 217-222) — lateral references to the agg aliases
      .withColumn("encounter_type",
        when(col("total_claims") > 0 && col("total_ehr_records") > 0, "comprehensive")
          .when(col("total_claims") > 0, "claims_only")
          .when(col("total_ehr_records") > 0, "ehr_only")
          .otherwise("vitals_only"))
      .withColumn("created_at", asOfTs)
      .withColumn("updated_at", asOfTs)
      // final column list (lines 148-227): the grain's join/rank columns are
      // grouped on but not exposed
      .select(
        col("patient_id"), col("measurement_timestamp"), col("device_id"), col("location"),
        col("heart_rate"), col("blood_pressure_systolic"), col("blood_pressure_diastolic"),
        col("temperature"), col("oxygen_saturation"), col("respiratory_rate"),
        col("heart_rate_category"), col("pulse_pressure"), col("rate_pressure_product"),
        col("shift_category"), col("day_category"), col("quality_category"),
        col("low_oxygen_alert"), col("elevated_heart_rate_alert"),
        col("low_heart_rate_alert"), col("fever_alert"),
        col("primary_claim_id"), col("primary_service_date"), col("primary_claim_amount"),
        col("primary_insurance_type"), col("primary_claim_status"), col("primary_processing_days"),
        col("primary_ehr_record_id"), col("primary_visit_date"), col("primary_diagnosis"),
        col("primary_treatment"), col("primary_medication_count"), col("primary_lab_test_count"),
        col("total_claims"), col("total_ehr_records"), col("total_claim_value"),
        col("avg_processing_days"), col("denied_claims_count"), col("paid_claims_count"),
        col("pending_claims_count"), col("high_value_claims_count"),
        col("encounter_complexity_score"), col("risk_level"), col("encounter_type"),
        col("created_at"), col("updated_at"))
  }
}
