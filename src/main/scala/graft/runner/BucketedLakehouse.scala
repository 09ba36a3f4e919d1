package graft.runner

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Config

/** Bucketed-table layout for the processed zone — the co-located-join
  * strategy for 100 TB (SURVEY §4 / the brief's "bucketing for
  * co-located joins").
  *
  * The fact model joins vitals⟕claims⟕ehr on `patient_id` and windows
  * on the same key. With all three processed tables written
  * `bucketBy(N, patient_id)`, Spark reads each side already hash-
  * partitioned on the join key: the band joins plan as SortMergeJoin
  * with ZERO Exchange on either side (only sorts), and the proximity
  * windows reuse the same clustering. At 100 TB that removes the three
  * largest shuffles of the pipeline entirely — each nightly fact build
  * pays no repartitioning, only a streaming merge per bucket.
  *
  * Bucketed writes require the table catalog (`saveAsTable`); the
  * warehouse lives under the lakehouse root. Bucket count is a
  * deployment parameter: pick ≥ cluster cores and high enough that one
  * bucket of the largest table fits executor memory (e.g. 4096 buckets
  * × ~25 GB at 100 TB).
  */
final class BucketedLakehouse(spark: SparkSession, dbName: String, buckets: Int = 8,
    cfg: Config = Config.default) {

  def init(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbName")

  private def writeBucketed(df: DataFrame, table: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "patient_id")
      .sortBy("patient_id")
      .format("parquet")
      .saveAsTable(s"$dbName.$table")

  /** Write the three processed tables bucketed on the join key. */
  def writeProcessed(vitals: DataFrame, claims: DataFrame, ehr: DataFrame): Unit = {
    init()
    writeBucketed(vitals, "patient_vitals")
    writeBucketed(claims, "insurance_claims")
    writeBucketed(ehr, "ehr_records")
  }

  def vitals: DataFrame = spark.table(s"$dbName.patient_vitals")
  def claims: DataFrame = spark.table(s"$dbName.insurance_claims")
  def ehr: DataFrame = spark.table(s"$dbName.ehr_records")

  /** The fact build over bucketed inputs — same logical model, shuffle-
    * free physical joins (assert via `.explain`: no Exchange above the
    * bucketed scans).
    */
  def buildFact(): DataFrame =
    graft.marts.FactPatientEncounters.build(cfg)(
      vitals.transform(graft.staging.Staging.stgPatientVitals(cfg)),
      claims.transform(graft.staging.Staging.stgInsuranceClaims(cfg)),
      ehr.transform(graft.staging.Staging.stgEhrRecords(cfg)))
}
