package graft

import org.apache.spark.sql.functions._

import graft.etl.Etl
import graft.model.Config

/** ETL stage semantics (SURVEY S2, P1-P3, A11, F1-F24, R1) against
  * hand-built fixtures with hand-computed expectations.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config.default

  private def run(msgs: Seq[String]) =
    msgs.toDF("value").transform(Etl.parse(cfg))

  val goodVitals =
    """{"data_type":"patient_vitals","patient_id":"P000001","timestamp":"2026-08-11T10:30:00",
      |"heart_rate":72,"blood_pressure_systolic":120,"blood_pressure_diastolic":80,
      |"temperature":36.8,"oxygen_saturation":98,"respiratory_rate":16,
      |"device_id":"DEV0001","location":"ICU"}""".stripMargin.replaceAll("\n", "")

  val goodClaim =
    """{"data_type":"insurance_claim","claim_id":"CLM123456","patient_id":"P000002",
      |"provider_id":"DR0001","service_date":"2026-08-01","diagnosis_codes":["I10","E11.9"],
      |"procedure_codes":["99213"],"total_amount":250.5,"insurance_type":"Medicare",
      |"claim_status":"Paid","submission_date":"2026-08-05"}""".stripMargin.replaceAll("\n", "")

  val goodEhr =
    """{"data_type":"ehr_record","record_id":"EHR100001","patient_id":"P000003",
      |"visit_date":"2026-08-02","provider_id":"DR0002","diagnosis":"stable",
      |"treatment":"rest","medications":["Aspirin","Metformin"],
      |"lab_results":{"CBC":{"value":5000.0,"unit":"cells/uL","normal_range":"4000.0-11000.0"}},
      |"notes":"ok"}""".stripMargin.replaceAll("\n", "")

  test("malformed JSON becomes an invalid_json error record, not a crash (S2)") {
    val out = run(Seq("{not json at all", goodVitals))
    val errs = out.filter($"error" === "invalid_json").collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("raw_message") == "{not json at all")
    assert(out.filter($"error".isNull).count() == 1)
  }

  test("missing required fields per type yield processing_error (P1)") {
    val noHr = """{"data_type":"patient_vitals","patient_id":"P1","timestamp":"2026-08-11T00:00:00","temperature":37.0}"""
    val noAmount = """{"data_type":"insurance_claim","claim_id":"C1","patient_id":"P1","service_date":"2026-08-01"}"""
    val noDiag = """{"data_type":"ehr_record","record_id":"E1","patient_id":"P1","visit_date":"2026-08-01"}"""
    val out = run(Seq(noHr, noAmount, noDiag, goodVitals, goodClaim, goodEhr))
    assert(out.filter($"error" === "processing_error").count() == 3)
    assert(out.filter($"error".isNull).count() == 3)
  }

  test("range anomalies are flagged, not dropped, at parse (P2)") {
    val hotHr = goodVitals.replace("\"heart_rate\":72", "\"heart_rate\":250")
    val coldTemp = goodVitals.replace("\"temperature\":36.8", "\"temperature\":30.1")
    val freeClaim = goodClaim.replace("\"total_amount\":250.5", "\"total_amount\":0.0")
    val out = run(Seq(hotHr, coldTemp, freeClaim, goodVitals))
    assert(out.filter($"heart_rate_anomaly").count() == 1)
    assert(out.filter($"temperature_anomaly").count() == 1)
    assert(out.filter($"amount_anomaly").count() == 1)
    assert(out.filter($"error".isNotNull).count() == 0)
  }

  test("quality filter drops errors and anomalies (P3)") {
    val hotHr = goodVitals.replace("\"heart_rate\":72", "\"heart_rate\":250")
    val out = run(Seq("junk", hotHr, goodVitals, goodClaim)).transform(Etl.qualityFilter)
    assert(out.count() == 2)
  }

  test("quality score: vitals 1.0 baseline, claims/EHR 0.8 (no timestamp field) — A11") {
    val out = run(Seq(goodVitals, goodClaim, goodEhr)).transform(Etl.qualityFilter)
      .transform(Etl.enrich(cfg))
    val scores = out.select($"data_type", $"data_quality_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("patient_vitals") == 1.0)
    assert(math.abs(scores("insurance_claim") - 0.8) < 1e-9)
    assert(math.abs(scores("ehr_record") - 0.8) < 1e-9)
  }

  test("enrichment: categories, hour/day, processing days, counts (F8,F9,F11,F16,F22)") {
    val out = run(Seq(goodVitals, goodClaim, goodEhr)).transform(Etl.qualityFilter)
      .transform(Etl.enrich(cfg))
    val v = out.filter($"data_type" === "patient_vitals").head()
    assert(v.getAs[String]("heart_rate_category") == "normal")
    assert(v.getAs[Int]("hour_of_day") == 10)
    assert(v.getAs[String]("day_of_week") == "Tuesday") // 2026-08-11
    val c = out.filter($"data_type" === "insurance_claim").head()
    assert(c.getAs[Int]("processing_days") == 4)
    assert(c.getAs[String]("amount_category") == "medium")
    val e = out.filter($"data_type" === "ehr_record").head()
    assert(e.getAs[Int]("medication_count") == 2)
    assert(e.getAs[Int]("lab_test_count") == 1)
  }

  test("routing fans out by type with sink schemas; arrays flatten to strings (R1, S3)") {
    val enrichedDf = run(Seq(goodVitals, goodClaim, goodEhr,
      """{"data_type":"weird","patient_id":"P9"}"""))
      .transform(Etl.qualityFilter).transform(Etl.enrich(cfg))
    assert(Etl.routeVitals(enrichedDf).count() == 1)
    val claims = Etl.routeClaims(enrichedDf).head()
    assert(claims.getAs[String]("diagnosis_codes") == "I10,E11.9")
    assert(claims.getAs[java.sql.Date]("service_date").toString == "2026-08-01")
    val ehr = Etl.routeEhr(enrichedDf).head()
    assert(ehr.getAs[String]("medications") == "Aspirin,Metformin")
    assert(ehr.getAs[String]("lab_results").contains("\"CBC\""))
    assert(Etl.routeUnknown(enrichedDf).count() == 1)
  }

  test("elevated and low heart-rate categories (F22 thresholds)") {
    val hi = goodVitals.replace("\"heart_rate\":72", "\"heart_rate\":110")
    val lo = goodVitals.replace("\"heart_rate\":72", "\"heart_rate\":50")
    val out = run(Seq(hi, lo)).transform(Etl.qualityFilter).transform(Etl.enrich(cfg))
    val cats = out.select($"heart_rate", $"heart_rate_category").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(cats(110) == "elevated" && cats(50) == "low")
  }
}
