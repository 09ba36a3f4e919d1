package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Reports
import graft.etl.Etl
import graft.marts.FactPatientEncounters
import graft.model.Config
import graft.operators.TableVersions
import graft.staging.Staging

/** The lakehouse pipeline RUNNING ON the versioned table format: the
  * processed and curated zones are [[TableVersions]] tables instead of
  * plain parquet directories, which is the Spark-native equivalent of
  * the reference's managed BigQuery tables BEING its zones
  * (`healthcare_etl_pipeline.py:296-339` WRITE_APPEND into dataset
  * tables; `dbt_project.yml:27-30` materializing marts as tables).
  * [[Lakehouse]] keeps the plain-directory zones for pluggable
  * [[ZoneSink]] formats; this runner is what a single-format parquet
  * deployment should use, because the format upgrades every zone write
  * from "directory of files" to an audited transaction:
  *
  *  - **exactly-once ingest**: each ETL batch lands in the three
  *    processed tables via `appendTxn(app, batchId)` — a foreachBatch
  *    replay after a crash re-commits nothing, so the at-least-once
  *    caveat on [[Lakehouse.refreshFactIncremental]] disappears by
  *    construction;
  *  - **atomic fact refresh**: the affected date partitions swap in ONE
  *    commit ([[TableVersions.replacePartitions]]) with the same batch
  *    id, so reports never observe a half-refreshed fact and a replayed
  *    refresh is a no-op end-to-end;
  *  - **time travel + audit**: every refresh is a version; a bad batch
  *    rolls back with [[TableVersions.restore]] instead of a rebuild;
  *  - **downstream change feed**: consumers tail the fact with
  *    [[TableVersions.readChanges]] (see [[graft.operators.ChangeFeed]])
  *    instead of re-scanning the table per cycle.
  *
  * Scale: identical data motion to [[Lakehouse]] — the fact stays
  * partitioned by `measurement_date` (partition tuples live in commit
  * metadata, so report-window reads plan from the commit without
  * directory listings), refreshes rewrite only affected dates, and
  * every commit is O(metadata) on top of the batch write itself.
  */
final class VersionedLakehouse(spark: SparkSession, root: String, cfg: Config = Config.default) {

  val vitalsRoot = s"$root/processed/patient_vitals"
  val claimsRoot = s"$root/processed/insurance_claims"
  val ehrRoot = s"$root/processed/ehr_records"
  val factRoot = s"$root/curated/fact_patient_encounters"

  /** One ETL batch into the three processed tables, exactly-once per
    * `batchId` (separate txn app ids per table: a crash between the
    * vitals and claims commits replays into "vitals no-op, claims
    * applies" — each table exactly-once, jointly idempotent).
    */
  def runEtl(raw: DataFrame, batchId: Long): Unit = {
    val enriched = raw.transform(Etl.pipeline(cfg)).cache()
    try { appendRoutes(enriched, batchId) }
    finally { enriched.unpersist(); () }
  }

  /** The three processed-table appends of one ETL batch. The tables are
    * independent, so the three commits run CONCURRENTLY — the batch's
    * wall time is the ETL materialization plus the SLOWEST route write,
    * not their sum (on a real cluster these are three separate jobs the
    * scheduler interleaves anyway). The cache is materialized once
    * up-front so the racing routes read columnar cache instead of
    * racing to compute the same blocks.
    */
  private def appendRoutes(enriched: DataFrame, batchId: Long): Unit = {
    // replay fast path: when every table already recorded this batch,
    // skip the materialization and the route scans entirely — a crash
    // REPLAY pays metadata reads, not a second ETL pass
    val apps = Seq(vitalsRoot -> "etl_vitals", claimsRoot -> "etl_claims",
      ehrRoot -> "etl_ehr")
    if (apps.forall { case (r, a) =>
        TableVersions.lastTxn(spark, r, a).exists(_ >= batchId) }) return
    TableVersions.timedOp("etl.materialize") { enriched.count() }
    val routes: Seq[() => Unit] = Seq(
      () => { TableVersions.appendTxn(spark, vitalsRoot,
        Etl.routeVitals(enriched), "etl_vitals", batchId); () },
      () => { TableVersions.appendTxn(spark, claimsRoot,
        Etl.routeClaims(enriched), "etl_claims", batchId); () },
      () => { TableVersions.appendTxn(spark, ehrRoot,
        Etl.routeEhr(enriched), "etl_ehr", batchId); () })
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = routes.map(r => new Thread(() =>
      try r() catch { case t: Throwable => errs.add(t); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  def processedVitals: DataFrame = TableVersions.read(spark, vitalsRoot)
  def processedClaims: DataFrame = TableVersions.read(spark, claimsRoot)
  def processedEhr: DataFrame = TableVersions.read(spark, ehrRoot)

  def stgVitals: DataFrame = processedVitals.transform(Staging.stgPatientVitals(cfg))
  def stgClaims: DataFrame = processedClaims.transform(Staging.stgInsuranceClaims(cfg))
  def stgEhr: DataFrame = processedEhr.transform(Staging.stgEhrRecords(cfg))

  private def factFrame(stgV: DataFrame,
      stgC: DataFrame = stgClaims, stgE: DataFrame = stgEhr): DataFrame =
    FactPatientEncounters.build(cfg)(stgV, stgC, stgE)
      .withColumn("measurement_date", to_date(col("measurement_timestamp")))

  /** Full fact rebuild as one atomic versioned overwrite. */
  def buildFact(): Long =
    TableVersions.overwrite(spark, factRoot, factFrame(stgVitals),
      partitionBy = Seq("measurement_date"))

  def fact: DataFrame = TableVersions.read(spark, factRoot).drop("measurement_date")

  /** Exactly-once incremental refresh: appends the batch to the
    * processed tables and swaps the affected fact date-partitions in
    * one transactional commit, all keyed by `batchId` — replaying the
    * whole call after a crash at ANY point re-commits nothing. Affected
    * = new-vitals dates ∪ (new-claims/EHR dates ± the proximity band),
    * the same dependency rule as [[Lakehouse.refreshFactIncremental]];
    * the rebuilt partitions read FULL staging history for those dates
    * (band context complete), only the swap is incremental.
    */
  def refreshFactIncremental(raw: DataFrame, batchId: Long): Seq[java.sql.Date] = {
    // FULL-REPLAY fast path: when all four tables already recorded the
    // batch, the swap is done — serve the affected dates from the
    // marker written at swap time instead of re-running the batch's
    // ETL parse. (A crash between the swap and the marker write is the
    // only window where a full replay still pays the recompute below.)
    if (TableVersions.lastTxn(spark, factRoot, "fact_refresh").exists(_ >= batchId) &&
        Seq("etl_vitals" -> vitalsRoot, "etl_claims" -> claimsRoot, "etl_ehr" -> ehrRoot)
          .forall { case (a, r) => TableVersions.lastTxn(spark, r, a).exists(_ >= batchId) })
      readAffectedMarker(batchId) match {
        case Some(dates) => return dates
        case None => // marker lost to the crash window: recompute below
      }
    val enriched = raw.transform(Etl.pipeline(cfg)).cache()
    try {
      appendRoutes(enriched, batchId)

      val band = cfg.proximityDays
      val vDates = Etl.routeVitals(enriched).select(to_date(col("timestamp")).as("d"))
      val cDates = Etl.routeClaims(enriched)
        .select(explode(sequence(date_sub(col("service_date"), band),
          date_add(col("service_date"), band))).as("d"))
      val eDates = Etl.routeEhr(enriched)
        .select(explode(sequence(date_sub(col("visit_date"), band),
          date_add(col("visit_date"), band))).as("d"))
      val affected = vDates.unionByName(cDates).unionByName(eDates)
        .distinct().collect().map(_.getDate(0)).sortBy(_.getTime).toSeq

      val stgV = stgVitals.filter(to_date(col("measurement_timestamp"))
        .isin(affected.map(d => lit(d)): _*))
      // the claims/EHR legs attach ONLY through the ±band join residual
      // (|datediff| <= proximityDays, FactPatientEncounters), so rows
      // outside affected±band cannot reach a rebuilt partition — prune
      // both scans to that window (exact same candidate set per vitals
      // row; at scale the refresh reads O(window), not O(history))
      val expanded = affected.flatMap(d => (-band to band)
        .map(o => java.sql.Date.valueOf(d.toLocalDate.plusDays(o.toLong)))).distinct
      val stgC = stgClaims.filter(col("service_date").isin(expanded.map(d => lit(d)): _*))
      val stgE = stgEhr.filter(col("visit_date").isin(expanded.map(d => lit(d)): _*))
      if (TableVersions.currentVersion(spark, factRoot).isEmpty) // refresh before any build
        TableVersions.appendTxn(spark, factRoot, factFrame(stgV, stgC, stgE),
          "fact_refresh", batchId, partitionBy = Seq("measurement_date"))
      else
        TableVersions.replacePartitions(spark, factRoot, factFrame(stgV, stgC, stgE),
          txn = Some("fact_refresh" -> batchId))
      writeAffectedMarker(batchId, affected)
      affected
    } finally { enriched.unpersist(); () }
  }

  private def affectedMarkerPath(batchId: Long) =
    new org.apache.hadoop.fs.Path(factRoot, s"_refresh/b$batchId.dates")

  private def writeAffectedMarker(batchId: Long, dates: Seq[java.sql.Date]): Unit = {
    val p = affectedMarkerPath(batchId)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(dates.map(_.toString).sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readAffectedMarker(batchId: Long): Option[Seq[java.sql.Date]] = {
    val p = affectedMarkerPath(batchId)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(txt.split("\n").filter(_.nonEmpty).map(java.sql.Date.valueOf).toSeq)
    }
  }

  /** Health gates over the versioned snapshots. */
  def gates(): Seq[Reports.HealthAlert] =
    Reports.evaluateGates(cfg)(processedVitals, fact)
}
