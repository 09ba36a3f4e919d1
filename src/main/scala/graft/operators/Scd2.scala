package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** dbt snapshot semantics (timestamp strategy, SCD type 2) — configured
  * but unused in the reference (`dbt/dbt_project.yml:105-111`:
  * `strategy: timestamp`, `updated_at: updated_at`, `unique_key: id`).
  * Implemented as a MERGE-style Parquet rewrite (SURVEY §7.4 optional).
  *
  * Contract (matching dbt's snapshot behavior):
  *  - first run: every source row becomes current
  *    (`valid_from = updated_at`, `valid_to = null`);
  *  - subsequent runs: a source row with a newer `updated_at` than the
  *    current version closes it (`valid_to = new updated_at`) and opens
  *    a new current version; unchanged/older rows leave history alone;
  *  - rows never seen before are inserted as current.
  *
  * Scale: one full-outer-style pass — current versions join updates on
  * the key (one shuffle), closed history is appended untouched. For
  * petabyte snapshots the same logic runs per key-bucket partition.
  */
object Scd2 {

  /** Apply one snapshot pass in memory: returns the new full history
    * DataFrame given the existing history (may be empty with matching
    * schema) and the update batch.
    */
  def snapshot(history: DataFrame, updates: DataFrame,
      key: String, updatedAt: String): DataFrame = {
    val histCols = updates.columns
    val closed = history.filter(col("valid_to").isNotNull)
    val current = history.filter(col("valid_to").isNull)

    // one version per key per batch (dbt's assumption): keep the latest
    val latest = updates
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(key))
          .orderBy(col(updatedAt).desc)))
      .filter(col("__rn") === 1).drop("__rn")

    val u = latest.alias("u")
    val c = current.alias("c")

    // current versions that receive a strictly newer update → close them
    val closing = c.join(u,
      col(s"c.$key") === col(s"u.$key") &&
        col(s"u.$updatedAt") > col(s"c.$updatedAt"))
      .select(histCols.map(n => col(s"c.$n")) :+
        col(s"c.valid_from") :+ col(s"u.$updatedAt").as("valid_to"): _*)

    // current versions without a newer update → unchanged
    val keptCurrent = c.join(
      u.filter(lit(true)).select(col(s"u.$key").as("__k"), col(s"u.$updatedAt").as("__ts")),
      col(s"c.$key") === col("__k") && col("__ts") > col(s"c.$updatedAt"),
      "left_anti")
      .select(histCols.map(col) :+ col("valid_from") :+ col("valid_to"): _*)

    // updates that are genuinely new versions (newer than current) or
    // brand-new keys → open as current
    val newerThanCurrent = u.join(
      c.select(col(s"c.$key").as("__k"), col(s"c.$updatedAt").as("__ts")),
      col(s"u.$key") === col("__k"), "left")
      .filter(col("__k").isNull || col(s"u.$updatedAt") > col("__ts"))
      .select(histCols.map(n => col(s"u.$n")): _*)
      .withColumn("valid_from", col(updatedAt))
      .withColumn("valid_to", lit(null).cast(updates.schema(updatedAt).dataType))

    closed.unionByName(closing).unionByName(keptCurrent).unionByName(newerThanCurrent)
  }

  /** Empty history with the snapshot schema for a given update schema. */
  def emptyHistory(spark: SparkSession, updates: DataFrame, updatedAt: String): DataFrame = {
    val tsType = updates.schema(updatedAt).dataType
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      updates.schema
        .add("valid_from", tsType)
        .add("valid_to", tsType))
  }

  /** Durable snapshot table: read-modify-write a Parquet path (the local
    * stand-in for a lakehouse MERGE; swap for Delta/Iceberg MERGE INTO in
    * prod — same logical plan).
    */
  def snapshotTable(spark: SparkSession, path: String, updates: DataFrame,
      key: String, updatedAt: String): DataFrame = {
    val history =
      if (new java.io.File(path).exists()) spark.read.parquet(path)
      else emptyHistory(spark, updates, updatedAt)
    val next = snapshot(history, updates, key, updatedAt).cache()
    next.count() // materialize before overwriting the input path
    next.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }
}
