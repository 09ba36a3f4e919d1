package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Config

/** The dimension models named (but not implemented) by the reference's
  * architecture doc (`docs/architecture/technical_architecture.md:92-93`:
  * `dim_patients`, `dim_providers`) — built from the processed tables by
  * analogy with the mart layer (SURVEY gap list / §7.4 optional).
  *
  * Both are one-shuffle grouped aggregations over their natural keys;
  * at scale they broadcast into fact joins (small dimensions by
  * construction: 1k patients / 100 providers per generator pools).
  */
object Dimensions {

  /** Per-patient profile: activity span, encounter volumes, vitals
    * baselines, claims exposure. Inputs: the three processed tables.
    */
  def dimPatients(cfg: Config = Config.default)(
      vitals: DataFrame, claims: DataFrame, ehr: DataFrame): DataFrame = {
    val v = vitals.groupBy(col("patient_id")).agg(
      count(lit(1)).as("vitals_count"),
      min(col("timestamp")).as("first_measurement"),
      max(col("timestamp")).as("last_measurement"),
      avg(col("heart_rate")).as("avg_heart_rate"),
      avg(col("temperature")).as("avg_temperature"),
      avg(col("data_quality_score")).as("avg_quality_score"))
    val c = claims.groupBy(col("patient_id")).agg(
      count(lit(1)).as("claims_count"),
      sum(col("total_amount")).as("lifetime_claim_value"),
      max(col("service_date")).as("last_service_date"))
    val e = ehr.groupBy(col("patient_id")).agg(
      count(lit(1)).as("ehr_count"),
      max(col("visit_date")).as("last_visit_date"))
    v.join(c, Seq("patient_id"), "full_outer")
      .join(e, Seq("patient_id"), "full_outer")
      .withColumn("created_at", lit(cfg.asOf))
  }

  /** Per-provider profile from claims + EHR activity. */
  def dimProviders(cfg: Config = Config.default)(
      claims: DataFrame, ehr: DataFrame): DataFrame = {
    val c = claims.groupBy(col("provider_id")).agg(
      count(lit(1)).as("claims_count"),
      sum(col("total_amount")).as("total_billed"),
      avg(col("processing_days")).as("avg_processing_days"),
      count(when(col("claim_status") === "Denied", 1)).as("denied_count"))
    val e = ehr.groupBy(col("provider_id")).agg(
      count(lit(1)).as("ehr_count"),
      avg(col("medication_count")).as("avg_medications"))
    c.join(e, Seq("provider_id"), "full_outer")
      .withColumn("denial_rate",
        when(col("claims_count") > 0, col("denied_count").cast("double") / col("claims_count")))
      .withColumn("created_at", lit(cfg.asOf))
  }
}
