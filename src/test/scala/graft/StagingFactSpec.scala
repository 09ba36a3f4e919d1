package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.marts.FactPatientEncounters
import graft.model.Config
import graft.staging.Staging

/** Staging derived-column semantics (P4-P5, F13, F15, F17-F22) and the
  * fact model's band-join/rank/aggregation behavior (J1-J3, W1-W2, A1-A3)
  * on hand-built rows with hand-computed expectations.
  */
class StagingFactSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config.default
  private val ts = Timestamp.valueOf("2026-08-11 14:00:00")
  private val pts = Timestamp.valueOf("2026-08-11 14:05:00")

  private def vitalsRow(
      hr: Integer = 72, sys: Integer = 120, dia: Integer = 80, temp: java.lang.Double = 36.8,
      o2: Integer = 98, rr: Integer = 16, score: Double = 1.0, hour: Integer = 14,
      dow: String = "Tuesday", patient: String = "P000001", at: Timestamp = ts) =
    (patient, at, hr, sys, dia, temp, o2, rr, "DEV0001", "ICU", pts, "normal", hour, dow, score, "1.0.0")

  private val vitalsCols = Seq("patient_id", "timestamp", "heart_rate",
    "blood_pressure_systolic", "blood_pressure_diastolic", "temperature",
    "oxygen_saturation", "respiratory_rate", "device_id", "location",
    "processed_at", "heart_rate_category", "hour_of_day", "day_of_week",
    "data_quality_score", "pipeline_version")

  private def vitalsDf(rows: Seq[(String, Timestamp, Integer, Integer, Integer, java.lang.Double, Integer, Integer, String, String, Timestamp, String, Integer, String, Double, String)]): DataFrame =
    rows.toDF(vitalsCols: _*)

  test("stg vitals: out-of-range values null out, flags on raw values (P5)") {
    val out = vitalsDf(Seq(
      vitalsRow(),
      vitalsRow(hr = 300, temp = 43.5, o2 = 60, sys = 260, dia = 30, rr = 50)))
      .transform(Staging.stgPatientVitals(cfg))
    val bad = out.filter($"heart_rate_anomaly").head()
    assert(bad.getAs[Integer]("heart_rate") == null)
    assert(bad.getAs[java.lang.Double]("temperature") == null)
    assert(bad.getAs[Integer]("oxygen_saturation") == null)
    assert(bad.getAs[Integer]("blood_pressure_systolic") == null)
    assert(bad.getAs[Integer]("blood_pressure_diastolic") == null)
    assert(bad.getAs[Integer]("respiratory_rate") == null)
    assert(bad.getAs[Boolean]("temperature_anomaly"))
    val good = out.filter(!$"heart_rate_anomaly").head()
    assert(good.getAs[Int]("heart_rate") == 72)
    assert(good.getAs[Int]("pulse_pressure") == 40)
    assert(good.getAs[Double]("rate_pressure_product") == 72.0 * 120 / 100)
  }

  test("stg vitals: alert flags and shift/day/quality categories (F17-F22)") {
    val out = vitalsDf(Seq(
      vitalsRow(hr = 110, temp = 38.5, o2 = 92, hour = 3, dow = "Saturday", score = 0.65)))
      .transform(Staging.stgPatientVitals(cfg))
    val r = out.head()
    assert(r.getAs[Boolean]("elevated_heart_rate_alert"))
    assert(r.getAs[Boolean]("fever_alert"))
    assert(r.getAs[Boolean]("low_oxygen_alert"))
    assert(!r.getAs[Boolean]("low_heart_rate_alert"))
    assert(r.getAs[String]("shift_category") == "night_shift")
    assert(r.getAs[String]("day_category") == "weekend")
    assert(r.getAs[String]("quality_category") == "fair")
  }

  test("stg vitals: NOT NULL grain filter drops null patient/timestamp rows (P4)") {
    val out = vitalsDf(Seq(vitalsRow(), vitalsRow(patient = null)))
      .transform(Staging.stgPatientVitals(cfg))
    assert(out.count() == 1)
  }

  private def claimRow(claim: String = "CLM000001", patient: String = "P000001",
      amount: java.lang.Double = 250.5, status: String = "Paid", insurance: String = "Medicare",
      procDays: Integer = 4, service: Date = Date.valueOf("2026-08-01"),
      diag: String = "I10,E11.9", proc: String = "99213") =
    (claim, patient, "DR0001", service, diag, proc, amount, insurance, status,
      Date.valueOf("2026-08-05"), pts, procDays, "medium", 0.8, "1.0.0")

  private val claimCols = Seq("claim_id", "patient_id", "provider_id", "service_date",
    "diagnosis_codes", "procedure_codes", "total_amount", "insurance_type", "claim_status",
    "submission_date", "processed_at", "processing_days", "amount_category",
    "data_quality_score", "pipeline_version")

  test("stg claims: flags, splits, categorizations, daily value (F15, F22)") {
    val out = Seq(
      claimRow(),
      claimRow(claim = "CLM000002", amount = 150000.0, status = "Denied",
        insurance = "Self-Pay", procDays = 400, diag = "I10"))
      .toDF(claimCols: _*)
      .transform(Staging.stgInsuranceClaims(cfg))
    val ok = out.filter($"claim_id" === "CLM000001").head()
    assert(ok.getAs[Boolean]("paid_claim") && !ok.getAs[Boolean]("denied_claim"))
    assert(ok.getAs[Int]("diagnosis_count") == 2 && ok.getAs[Int]("procedure_count") == 1)
    assert(ok.getAs[String]("processing_efficiency") == "excellent")
    assert(ok.getAs[String]("value_category") == "medium_value")
    assert(ok.getAs[String]("insurance_category") == "government")
    assert(ok.getAs[String]("lifecycle_stage") == "paid")
    assert(math.abs(ok.getAs[Double]("daily_claim_value") - 250.5 / 4) < 1e-9)
    val bad = out.filter($"claim_id" === "CLM000002").head()
    assert(bad.getAs[java.lang.Double]("total_amount") == null) // out of range → NULL
    assert(bad.getAs[Boolean]("amount_anomaly"))
    assert(bad.getAs[Boolean]("excessive_processing_days"))
    assert(bad.getAs[String]("insurance_category") == "self_pay")
    // BigQuery CASE semantics: NULL total_amount falls to very_high_value ELSE
    assert(bad.getAs[String]("value_category") == "very_high_value")
  }

  test("fact: closest claim wins rank 1; aggregates and categorizations (J1-J3, A1-A3)") {
    val stgV = vitalsDf(Seq(vitalsRow())).transform(Staging.stgPatientVitals(cfg))
    // claims: 3 days away (rank 1), 6 days away (rank 2), 41 days away (outside band)
    val stgC = Seq(
      claimRow(claim = "NEAR", service = Date.valueOf("2026-08-08")),
      claimRow(claim = "FAR", service = Date.valueOf("2026-08-05"), status = "Denied"),
      claimRow(claim = "OUT", service = Date.valueOf("2026-07-01")))
      .toDF(claimCols: _*).transform(Staging.stgInsuranceClaims(cfg))
    val stgE = Seq(
      ("EHR1", "P000001", Date.valueOf("2026-08-10"), "DR0002", "stable", "rest",
        "Aspirin", "{}", 1, 1, "ok", pts, 0.8))
      .toDF("record_id", "patient_id", "visit_date", "provider_id", "diagnosis",
        "treatment", "medications", "lab_results", "medication_count", "lab_test_count",
        "notes", "processed_at", "data_quality_score")
      .transform(Staging.stgEhrRecords(cfg))

    val fact = FactPatientEncounters.build(cfg)(stgV, stgC, stgE)
    // grain: one vitals row × {NEAR(rank1), FAR(rank2)} × {EHR1(rank1)} = 2 rows
    assert(fact.count() == 2)
    val r1 = fact.filter($"primary_claim_id" === "NEAR").head()
    assert(r1.getAs[String]("primary_ehr_record_id") == "EHR1")
    assert(r1.getAs[Long]("total_claims") == 1)
    assert(r1.getAs[String]("encounter_type") == "comprehensive")
    assert(r1.getAs[String]("risk_level") == "low_risk")
    // rank-2 row: CASE rank=1 nulls the primary columns
    val r2 = fact.filter($"primary_claim_id".isNull).head()
    assert(r2.getAs[Long]("denied_claims_count") == 1)
    // complexity: 1 claim*0.3 + 1 ehr*0.2 + 2 diag*0.2 + 1 proc*0.2 + 1 med*0.1
    assert(math.abs(r1.getAs[Double]("encounter_complexity_score") -
      (0.3 + 0.2 + 2 * 0.2 + 0.2 + 0.1)) < 1e-9)
  }

  test("fact: lookback filter excludes old vitals; vitals-only rows survive the left joins (P6)") {
    val old = vitalsRow(at = Timestamp.valueOf("2026-06-01 00:00:00"))
    val lonely = vitalsRow(patient = "P000999")
    val stgV = vitalsDf(Seq(old, lonely)).transform(Staging.stgPatientVitals(cfg))
    val stgC = Seq.empty[(String, String, String, Date, String, String, java.lang.Double, String, String, Date, Timestamp, Integer, String, Double, String)].toDF(claimCols: _*)
      .transform(Staging.stgInsuranceClaims(cfg))
    val stgE = spark.emptyDataFrame
      .withColumn("record_id", lit(null).cast("string"))
      .withColumn("patient_id", lit(null).cast("string"))
      .withColumn("visit_date", lit(null).cast("date"))
      .withColumn("provider_id", lit(null).cast("string"))
      .withColumn("diagnosis", lit(null).cast("string"))
      .withColumn("treatment", lit(null).cast("string"))
      .withColumn("medications", lit(null).cast("string"))
      .withColumn("lab_results", lit(null).cast("string"))
      .withColumn("medication_count", lit(null).cast("int"))
      .withColumn("lab_test_count", lit(null).cast("int"))
      .withColumn("notes", lit(null).cast("string"))
      .withColumn("processed_at", lit(null).cast("timestamp"))
      .withColumn("data_quality_score", lit(null).cast("double"))
      .transform(Staging.stgEhrRecords(cfg))
    val fact = FactPatientEncounters.build(cfg)(stgV, stgC, stgE)
    val rows = fact.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("patient_id") == "P000999")
    assert(rows.head.getAs[String]("encounter_type") == "vitals_only")
  }
}
