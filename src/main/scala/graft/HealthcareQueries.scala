package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Reports
import graft.etl.Etl
import graft.gen.HealthcareGenerator
import graft.marts.FactPatientEncounters
import graft.model.Config
import graft.staging.Staging

/** End-to-end healthcare pipeline queries over the seeded generator —
  * the reference-parity surface (generator → ETL → staging → fact →
  * reports) runnable without external input. Deterministic: seed 42,
  * fixed asOf. These back the `hc_*` entries in [[SparkEntry.queries]].
  */
object HealthcareQueries {

  private val cfg = Config.default
  private def gen = new HealthcareGenerator(42L, cfg.asOf.toLocalDateTime.toLocalDate)

  /** Materialization memo, keyed per SparkSession. The reference builds
    * its lakehouse incrementally: the ETL output and the dbt fact table
    * are materialized ONCE per run, and every report queries the
    * materialized table. Spark's cache manager can't provide that reuse
    * here by plan-matching alone — the generator's `map` lambdas make
    * each invocation's logical plan non-equal — so we memoize the cached
    * DataFrame explicitly. Derived queries (reports, dims, staging) all
    * share one generation + ETL + fact build per session.
    */
  // NOT a WeakHashMap: the cached DataFrame values strongly reference
  // their SparkSession key (Dataset holds sparkSession), which per
  // WeakHashMap's documented pitfall would pin every entry forever.
  // Instead entries for stopped sessions are purged eagerly on each
  // access — the map only ever holds a handful of live sessions.
  private val memo =
    new java.util.HashMap[SparkSession, scala.collection.concurrent.TrieMap[(String, Long), DataFrame]]()
  private def memoized(spark: SparkSession, key: String, n: Long)(build: => DataFrame): DataFrame = {
    val perSession = memo.synchronized {
      val it = memo.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = memo.get(spark)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; memo.put(spark, m) }
      m
    }
    perSession.getOrElseUpdate((key, n), build.cache())
  }

  /** Enriched ETL output for n generated messages (parse→filter→enrich). */
  def enriched(spark: SparkSession, n: Long): DataFrame =
    memoized(spark, "enriched", n)(enrichedFresh(spark, n))

  /** Non-memoized, non-cached variant: plan-assertion tests need a plan
    * the cache manager can't substitute (the generator's fresh lambdas
    * make it canonically unequal to any cached plan).
    */
  def enrichedFresh(spark: SparkSession, n: Long): DataFrame =
    gen.messagesJson(spark, n).toDF("value").transform(Etl.pipeline(cfg))

  def processedVitals(spark: SparkSession, n: Long): DataFrame =
    enriched(spark, n).transform(Etl.routeVitals)
  def processedClaims(spark: SparkSession, n: Long): DataFrame =
    enriched(spark, n).transform(Etl.routeClaims)
  def processedEhr(spark: SparkSession, n: Long): DataFrame =
    enriched(spark, n).transform(Etl.routeEhr)

  def stgVitals(spark: SparkSession, n: Long): DataFrame =
    processedVitals(spark, n).transform(Staging.stgPatientVitals(cfg))
  def stgClaims(spark: SparkSession, n: Long): DataFrame =
    processedClaims(spark, n).transform(Staging.stgInsuranceClaims(cfg))
  def stgEhr(spark: SparkSession, n: Long): DataFrame =
    processedEhr(spark, n).transform(Staging.stgEhrRecords(cfg))

  def factEncounters(spark: SparkSession, n: Long): DataFrame =
    memoized(spark, "fact", n) {
      val e = enriched(spark, n)
      FactPatientEncounters.build(cfg)(
        Etl.routeVitals(e).transform(Staging.stgPatientVitals(cfg)),
        Etl.routeClaims(e).transform(Staging.stgInsuranceClaims(cfg)),
        Etl.routeEhr(e).transform(Staging.stgEhrRecords(cfg)))
    }

  def dailyMonitoring(spark: SparkSession, n: Long): DataFrame =
    Reports.patientMonitoringReport(cfg)(factEncounters(spark, n))

  def claimsReport(spark: SparkSession, n: Long): DataFrame =
    Reports.claimsProcessingReport(cfg)(factEncounters(spark, n))

  /** Dimension models (architecture-doc gap, SURVEY §7.4 optional). */
  def dimPatients(spark: SparkSession, n: Long): DataFrame = {
    val e = enriched(spark, n)
    graft.marts.Dimensions.dimPatients(cfg)(
      Etl.routeVitals(e), Etl.routeClaims(e), Etl.routeEhr(e))
      .orderBy("patient_id")
  }

  def dimProviders(spark: SparkSession, n: Long): DataFrame = {
    val e = enriched(spark, n)
    graft.marts.Dimensions.dimProviders(cfg)(Etl.routeClaims(e), Etl.routeEhr(e))
      .orderBy("provider_id")
  }

  /** Streaming ETL demo: replay n generated messages through the
    * Structured Streaming pipeline (AvailableNow trigger), then report
    * per-table row counts from the streamed sinks. Exercises R1-R4
    * end-to-end; rows > 0 proves the stream ran and fanned out.
    */
  def streamEtl(spark: SparkSession, n: Long): DataFrame = memoized(spark, "stream", n) {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    gen.messagesJson(spark, n).toDF("value")
      .coalesce(4).write.mode("overwrite").text(s"$root/in")
    val q = graft.streaming.StreamingEtl.start(spark, s"$root/in", root,
      cfg, org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val counts = Seq("patient_vitals", "insurance_claims", "ehr_records").map { t =>
      (t, spark.read.parquet(s"$root/processed/$t").count())
    } :+ (("unknown_deadletter", spark.read.text(s"$root/errors/unknown_data").count()))
    import spark.implicits._
    counts.toDF("table", "rows").orderBy("table")
  }
}
