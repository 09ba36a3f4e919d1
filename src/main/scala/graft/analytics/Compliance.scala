package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Config

/** The data-level subset of the reference's HIPAA compliance checker
  * (`security/compliance/hipaa_compliance_checker.py`) — the checks whose
  * semantics are queries rather than cloud-infrastructure metadata
  * (encryption/IAM inspection stays out of query-engine scope, SURVEY S6).
  */
object Compliance {

  /** Data-retention check (checker lines 106-140 intent; `retention_days:
    * 2555` = 7 years, `dbt_project.yml:142`): rows older than the
    * retention horizon must not exist in the curated zone.
    */
  def retentionCheck(cfg: Config = Config.default, retentionDays: Int = 2555)(
      fact: DataFrame): DataFrame = {
    val horizon = date_sub(to_date(lit(cfg.asOf)), retentionDays)
    fact.agg(
      count(lit(1)).as("total_rows"),
      count(when(to_date(col("measurement_timestamp")) < horizon, 1)).as("rows_past_retention"),
      min(col("measurement_timestamp")).as("oldest_measurement"))
  }

  /** Audit-trail page (checker lines 166-214 / SURVEY O3): most recent
    * audit entries, newest first, one page. Input: any table with a
    * `processed_at` audit column.
    */
  def auditTrail(table: DataFrame, pageSize: Int = 10): DataFrame =
    table
      .orderBy(col("processed_at").desc, col("patient_id").asc)
      .limit(pageSize)

  /** PHI-minimization projection: the checker's "minimum necessary"
    * principle as an operator — strip direct identifiers and re-key with
    * a salted hash, keeping analytics columns. The salt is a deployment
    * secret; a stable pseudonym enables longitudinal joins without PHI.
    */
  def deidentify(df: DataFrame, idCols: Seq[String], salt: String): DataFrame =
    idCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, sha2(concat_ws("|", lit(salt), col(c)), 256))
    }
}
