package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raw-zone ingest variants (SURVEY S1/S6): the reference lands JSON
  * messages in the raw GCS bucket (`terraform/main.tf:118-142`) and the
  * Beam pipeline re-parses them; real lakehouses also receive batch
  * extracts as CSV. Both ingest paths here produce schema'd DataFrames
  * with a DEAD-LETTER column instead of dropped/crashed rows — the same
  * contract as `Etl.parse` (S2): a corrupt line never kills the job and
  * never silently disappears.
  *
  * Scale notes: both readers are splittable narrow scans (line-JSON and
  * CSV split on newlines), schema is declared — never inferred (schema
  * inference is a full extra pass over 100 TB) — and corrupt-record
  * capture is per-row, shuffle-free.
  */
object Ingest {

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("_corrupt_record", StringType, nullable = true))

  /** Line-JSON ingest with explicit schema + corrupt-record channel.
    * Well-formed rows have `_corrupt_record` null; malformed lines keep
    * their raw text there (PERMISSIVE mode) for a dead-letter sink.
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV ingest with explicit schema, header, and the same corrupt-record
    * contract (type-mismatched or ragged rows land in `_corrupt_record`).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Split an ingested frame into (clean rows without the corrupt column,
    * dead-letter rows as raw text) — the S4 channel for batch ingest.
    * The input is cached: Spark refuses corrupt-column-only queries
    * against a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    * both outputs share one parse pass this way; callers unpersist via
    * the returned frames' `sparkSession` when the split is consumed.
    */
  def routeCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val clean = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val dead = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_record"))
    (clean, dead)
  }

  /** Re-wrap any schema'd frame as the one-string-column `value` stream
    * the ETL consumes (`Etl.parse` input contract) — lets a CSV batch
    * extract replay through the exact same pipeline as the JSON stream.
    */
  def asMessages(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
