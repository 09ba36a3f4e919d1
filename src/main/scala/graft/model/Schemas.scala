package graft.model

import org.apache.spark.sql.types._

/** Schema contracts for the three record types and their processed tables.
  *
  * Derived from the reference's BigQuery sink schemas
  * (`dataflow/pipelines/healthcare_etl_pipeline.py:300-305` vitals,
  * `316-320` claims, `331-335` EHR) and the generator dataclasses
  * (`ingestion/data_generators/healthcare_data_generator.py:17-56`).
  * We declare fixed StructTypes at the ingestion boundary — `from_json`
  * replaces the reference's schemaless dict parsing — and stay statically
  * typed from there (SURVEY §1.2).
  */
object Schemas {

  /** Raw patient-vitals message as published
    * (`healthcare_data_generator.py:100-134`). Timestamps arrive as
    * ISO-8601 strings; parsing happens in the ETL, not here, so malformed
    * values can be routed to the dead-letter channel instead of crashing.
    */
  val rawVitals: StructType = StructType(Seq(
    StructField("patient_id", StringType),
    StructField("timestamp", StringType),
    StructField("heart_rate", IntegerType),
    StructField("blood_pressure_systolic", IntegerType),
    StructField("blood_pressure_diastolic", IntegerType),
    StructField("temperature", DoubleType),
    StructField("oxygen_saturation", IntegerType),
    StructField("respiratory_rate", IntegerType),
    StructField("device_id", StringType),
    StructField("location", StringType)
  ))

  /** Raw insurance-claim message (`healthcare_data_generator.py:136-166`).
    * Arrays are genuine arrays in flight; they are flattened to
    * comma-joined strings at the sink to reproduce the reference's
    * "arrays stored as strings" behavior
    * (`healthcare_etl_pipeline.py:317`, `stg_insurance_claims.sql:36-38`).
    */
  val rawClaims: StructType = StructType(Seq(
    StructField("claim_id", StringType),
    StructField("patient_id", StringType),
    StructField("provider_id", StringType),
    StructField("service_date", StringType),
    StructField("diagnosis_codes", ArrayType(StringType)),
    StructField("procedure_codes", ArrayType(StringType)),
    StructField("total_amount", DoubleType),
    StructField("insurance_type", StringType),
    StructField("claim_status", StringType),
    StructField("submission_date", StringType)
  ))

  /** Raw EHR message (`healthcare_data_generator.py:168-209`).
    * `lab_results` is a map test-name → struct (value/unit/normal_range)
    * per `healthcare_data_generator.py:176-193`.
    */
  val labResultType: StructType = StructType(Seq(
    StructField("value", DoubleType),
    StructField("unit", StringType),
    StructField("normal_range", StringType)
  ))

  val rawEhr: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("patient_id", StringType),
    StructField("provider_id", StringType),
    StructField("visit_date", StringType),
    StructField("diagnosis", StringType),
    StructField("treatment", StringType),
    StructField("medications", ArrayType(StringType)),
    StructField("lab_results", MapType(StringType, labResultType)),
    StructField("notes", StringType)
  ))

  /** The envelope every published message carries: payload fields plus a
    * `data_type` discriminator (`pubsub_publisher.py:105-117`). We parse
    * the union of all three payload schemas; per-type routing picks the
    * relevant columns (SURVEY §2.9 R1).
    */
  val messageEnvelope: StructType = {
    val merged = (rawVitals.fields ++ rawClaims.fields ++ rawEhr.fields)
      .foldLeft(Vector.empty[StructField]) { (acc, f) =>
        if (acc.exists(_.name == f.name)) acc else acc :+ f
      }
    StructType(StructField("data_type", StringType) +: merged)
  }
}

/** All tunable thresholds of the reference in one place, mirroring the dbt
  * vars block (`dbt/dbt_project.yml:120-142`) plus the ETL-side anomaly
  * ranges (`healthcare_etl_pipeline.py:84-100`). Constant-folded by
  * Catalyst once inlined into column expressions (SURVEY §4).
  *
  * `asOf` parameterizes every `CURRENT_TIMESTAMP()`/`CURRENT_DATE()` in the
  * reference SQL so golden tests are deterministic (SURVEY §7.4).
  */
final case class Config(
    // ETL anomaly ranges (healthcare_etl_pipeline.py:84-100)
    etlHeartRateMin: Int = 40,
    etlHeartRateMax: Int = 200,
    etlTemperatureMin: Double = 35.0,
    etlTemperatureMax: Double = 42.0,
    // Staging validation ranges (dbt_project.yml:125-131)
    heartRateMin: Int = 40,
    heartRateMax: Int = 200,
    systolicMin: Int = 70,
    systolicMax: Int = 250,
    diastolicMin: Int = 40,
    diastolicMax: Int = 150,
    temperatureMin: Double = 35.0,
    temperatureMax: Double = 42.0,
    oxygenMin: Int = 70,
    oxygenMax: Int = 100,
    respiratoryMin: Int = 8,
    respiratoryMax: Int = 40,
    amountMin: Double = 0.01,
    amountMax: Double = 100000.0,
    // Alert thresholds (stg_patient_vitals.sql:70-104, dbt_project.yml:133-137)
    feverThreshold: Double = 38.0,
    lowOxygenThreshold: Int = 95,
    highHeartRate: Int = 100,
    lowHeartRate: Int = 60,
    highValueClaimThreshold: Double = 1000.0,
    // Fact model (dbt_project.yml:140)
    lookbackDays: Int = 30,
    proximityDays: Int = 7,
    // Quality gates (healthcare_data_pipeline_dag.py:178-200, 303-328)
    minQualityScore: Double = 0.8,
    stalenessMinutes: Int = 30,
    highRiskAlertsPerHour: Int = 10,
    // Deterministic "now" for every CURRENT_TIMESTAMP in reference SQL
    asOf: java.sql.Timestamp = java.sql.Timestamp.valueOf("2026-08-12 00:00:00")
)

object Config { val default: Config = Config() }
