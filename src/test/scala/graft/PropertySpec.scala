package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.etl.Etl
import graft.model.Config
import graft.staging.Staging

/** Property-style tests (SURVEY §5.2): invariants of validation /
  * categorization / scoring over seeded randomized inputs (plain seeded
  * Random keeps the dependency surface at scalatest+scalacheck-cache;
  * three 50-sample rounds per property).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config.default

  test("quality score is always in [0,1] and decreases monotonically with penalties") {
    val rows = Seq(
      ("P1", "2026-08-11T00:00:00", false, false, false),
      ("P1", null, false, false, false),
      (null, null, false, false, false),
      (null, null, true, false, false),
      (null, null, true, true, false),
      (null, null, true, true, true),
      ("P1", "t", true, true, true))
      .toDF("patient_id", "timestamp", "heart_rate_anomaly", "temperature_anomaly", "amount_anomaly")
    val scores = rows.select(Etl.qualityScore.as("q")).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) == 1.0)
    assert(scores(1) < scores(0) && scores(2) < scores(1) && scores(3) < scores(2))
    assert(scores(5) == 0.0) // 0.2+0.2+0.9 clamps at 0
  }

  test("range-validate-to-NULL never emits out-of-range values (P5)") {
    val r = new Random(7)
    for (_ <- 0 until 3) {
      val hrs = Seq.fill(50)(r.nextInt(500) - 100)
      val df = hrs.zipWithIndex.map { case (hr, i) => (s"P$i", "2026-08-11T00:00:00", hr) }
        .toDF("patient_id", "timestamp", "heart_rate")
        .withColumn("blood_pressure_systolic", lit(null).cast("int"))
        .withColumn("blood_pressure_diastolic", lit(null).cast("int"))
        .withColumn("temperature", lit(null).cast("double"))
        .withColumn("oxygen_saturation", lit(null).cast("int"))
        .withColumn("respiratory_rate", lit(null).cast("int"))
        .withColumn("device_id", lit("D")).withColumn("location", lit("ICU"))
        .withColumn("processed_at", lit(java.sql.Timestamp.valueOf("2026-08-11 00:00:00")))
        .withColumn("heart_rate_category", lit("normal"))
        .withColumn("hour_of_day", lit(1)).withColumn("day_of_week", lit("Monday"))
        .withColumn("data_quality_score", lit(1.0))
        .withColumn("pipeline_version", lit("1.0.0"))
      val out = df.transform(Staging.stgPatientVitals(cfg))
        .select($"heart_rate").collect().map(row => Option(row.getAs[Integer]("heart_rate")))
      assert(out.flatten.forall(v => v >= cfg.heartRateMin && v <= cfg.heartRateMax))
      val inRange = hrs.count(h => h >= cfg.heartRateMin && h <= cfg.heartRateMax)
      assert(out.flatten.length == inRange) // nothing valid is dropped
    }
  }

  test("category buckets partition the domain: every value maps to exactly one bucket (F22)") {
    val r = new Random(11)
    for (_ <- 0 until 3) {
      val amounts = Seq.fill(60)(r.nextDouble() * 201000.0 - 1000.0)
      val out = amounts.zipWithIndex
        .map { case (a, i) => (i.toLong, a) }.toDF("id", "o_totalprice")
        .withColumn("value_category",
          when($"o_totalprice" < 1000, "low_value")
            .when($"o_totalprice" < 10000, "medium_value")
            .when($"o_totalprice" < 100000, "high_value")
            .otherwise("very_high_value"))
        .groupBy("value_category").count().collect()
      assert(out.map(_.getLong(1)).sum == amounts.length)
    }
  }

  test("minhash est_jaccard is within [0,1]") {
    val docs = (0L until 20L).map(i => (i, s"token$i shared common words here plus token${i % 3} more"))
      .toDF("doc_id", "text")
    val pairs = operators.Dedup.minHashLsh(docs, "doc_id", "text", minJaccard = 0.0)
    val est = pairs.select($"est_jaccard").collect().map(_.getDouble(0))
    assert(est.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("winnowing fingerprint count is ≥1 for any non-empty text") {
    val r = new Random(13)
    val texts = Seq.fill(20)(r.alphanumeric.take(1 + r.nextInt(40)).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = operators.TextAnalysis.fingerprintDocs(df, "doc_id")
      .select($"n_fingerprints").collect().map(_.getInt(0))
    assert(out.forall(_ >= 1))
  }
}
