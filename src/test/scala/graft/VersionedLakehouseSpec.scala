package graft

import org.apache.spark.sql.functions._

import graft.gen.HealthcareGenerator
import graft.model.Config
import graft.operators.{ChangeFeed, TableVersions}
import graft.runner.{Lakehouse, VersionedLakehouse}

/** The lakehouse pipeline running ON the versioned table format:
  * incremental refresh through [[TableVersions.replacePartitions]]
  * equals a full rebuild, the whole refresh replays as a no-op
  * (exactly-once via txn records), the fact's output matches the
  * plain-parquet [[Lakehouse]] bit-for-bit, and a downstream summary
  * fed purely from the fact's change feed equals its one-shot twin
  * across restarts.
  */
class VersionedLakehouseSpec extends SparkSpec {

  private val cfg = Config.default
  private def gen = new HealthcareGenerator(42L, cfg.asOf.toLocalDateTime.toLocalDate)

  test("versioned refresh equals full rebuild; crash-replay is a no-op; matches plain lakehouse") {
    val g = gen
    val rootA = java.nio.file.Files.createTempDirectory("vlake_a_").toString
    val lakeA = new VersionedLakehouse(spark, rootA, cfg)
    lakeA.runEtl(g.messagesJson(spark, 2000).toDF("value"), batchId = 0L)
    lakeA.buildFact()
    val affected = lakeA.refreshFactIncremental(
      g.messagesJson(spark, 1000, offset = 2000).toDF("value"), batchId = 1L)
    assert(affected.nonEmpty)

    // crash-replay: the identical batch re-commits NOTHING on any table
    val versionsBefore = Seq(lakeA.vitalsRoot, lakeA.claimsRoot, lakeA.ehrRoot, lakeA.factRoot)
      .map(r => TableVersions.currentVersion(spark, r).get)
    val affected2 = lakeA.refreshFactIncremental(
      g.messagesJson(spark, 1000, offset = 2000).toDF("value"), batchId = 1L)
    assert(affected2 === affected)
    val versionsAfter = Seq(lakeA.vitalsRoot, lakeA.claimsRoot, lakeA.ehrRoot, lakeA.factRoot)
      .map(r => TableVersions.currentVersion(spark, r).get)
    assert(versionsAfter === versionsBefore, "replayed batch must commit no new versions")

    // one full build over both batches — versioned and plain twins
    val rootB = java.nio.file.Files.createTempDirectory("vlake_b_").toString
    val lakeB = new VersionedLakehouse(spark, rootB, cfg)
    lakeB.runEtl(g.messagesJson(spark, 3000).toDF("value"), batchId = 0L)
    lakeB.buildFact()
    val rootP = java.nio.file.Files.createTempDirectory("vlake_p_").toString
    val lakeP = new Lakehouse(spark, rootP, cfg)
    lakeP.runEtl(g.messagesJson(spark, 3000).toDF("value"))
    lakeP.buildFact()

    val a = lakeA.fact
    assert(a.count() === lakeB.fact.count())
    assert(a.exceptAll(lakeB.fact).isEmpty && lakeB.fact.exceptAll(a).isEmpty,
      "incremental versioned refresh must equal the versioned full rebuild")
    val p = lakeP.fact.select(a.columns.map(col).toIndexedSeq: _*)
    assert(a.exceptAll(p).isEmpty && p.exceptAll(a).isEmpty,
      "versioned fact must match the plain-parquet lakehouse fact")

    // health gates evaluate off the versioned snapshots
    assert(lakeA.gates() != null)

    // the refresh is an audited commit: CDF over the fact shows changes
    // confined to the affected dates
    val factV = TableVersions.currentVersion(spark, lakeA.factRoot).get
    val cdf = TableVersions.readChanges(spark, lakeA.factRoot, factV - 1, factV)
    val changedDates = cdf.select(col("measurement_date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(changedDates.nonEmpty)
    assert(changedDates.subsetOf(affected.map(_.toString).toSet),
      "refresh must only touch affected date partitions")
  }

  test("streaming incremental fact on versioned zones: stream equals rebuild, replay commits nothing") {
    val g = gen
    // stream side: seeded versioned lakehouse, then 2 message files
    // replayed one per micro-batch through the txn-keyed refresh
    val rootS = java.nio.file.Files.createTempDirectory("vlake_s_").toString
    val lakeS = new VersionedLakehouse(spark, rootS, cfg)
    lakeS.runEtl(g.messagesJson(spark, 1500).toDF("value"), batchId = -1L)
    lakeS.buildFact()
    g.messagesJson(spark, 800, offset = 1500).toDF("value")
      .coalesce(1).write.mode("overwrite").text(s"$rootS/in/b1")
    g.messagesJson(spark, 700, offset = 2300).toDF("value")
      .coalesce(1).write.mode("overwrite").text(s"$rootS/in/b2")
    val q = graft.streaming.StreamingEtl.startIncrementalFact(spark,
      graft.streaming.StreamingEtl.FileSource(s"$rootS/in/*", maxFilesPerTrigger = 1),
      lakeS, s"$rootS/_ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()

    // forced replay of the last streaming batch (crash between the
    // table commits and the checkpoint write): nothing re-commits on
    // any of the four tables
    val roots = Seq(lakeS.vitalsRoot, lakeS.claimsRoot, lakeS.ehrRoot, lakeS.factRoot)
    val lastBatch = TableVersions.lastTxn(spark, lakeS.vitalsRoot, "etl_vitals").get
    assert(lastBatch >= 0L, "streaming batches committed with their engine batch ids")
    val versionsBefore = roots.map(r => TableVersions.currentVersion(spark, r).get)
    lakeS.refreshFactIncremental(
      g.messagesJson(spark, 700, offset = 2300).toDF("value"), lastBatch)
    val versionsAfter = roots.map(r => TableVersions.currentVersion(spark, r).get)
    assert(versionsAfter === versionsBefore,
      "replayed streaming batch must commit no new versions end-to-end")

    // batch side: one full versioned build over all 3000 messages
    val rootB = java.nio.file.Files.createTempDirectory("vlake_sb_").toString
    val lakeB = new VersionedLakehouse(spark, rootB, cfg)
    lakeB.runEtl(g.messagesJson(spark, 3000).toDF("value"), batchId = 0L)
    lakeB.buildFact()

    val s = lakeS.fact
    val b = lakeB.fact
    assert(s.count() === b.count() && s.count() > 0)
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
      "stream-maintained versioned fact must equal the full rebuild")
  }

  test("change-feed-fed daily summary equals its one-shot twin across restarts") {
    val g = gen
    val root = java.nio.file.Files.createTempDirectory("vlake_cdf_").toString
    val lake = new VersionedLakehouse(spark, root, cfg)
    lake.runEtl(g.messagesJson(spark, 1500).toDF("value"), batchId = 0L)
    lake.buildFact()

    val summaryRoot = s"$root/curated/daily_summary"
    val ckpt = s"$root/_summary_ckpt"
    def summarize(fact: org.apache.spark.sql.DataFrame) =
      fact.groupBy("measurement_date")
        .agg(count(lit(1)).as("n_encounters"),
          round(avg("heart_rate"), 4).as("avg_hr"))

    // consumer catches up to the initial build
    val applied1 = ChangeFeed.refreshPartitionsFrom(spark, lake.factRoot, summaryRoot,
      ckpt, "daily_summary", "measurement_date")(summarize)
    assert(applied1.nonEmpty)

    // two incremental refreshes land two more fact versions
    lake.refreshFactIncremental(g.messagesJson(spark, 600, offset = 1500).toDF("value"), 1L)
    lake.refreshFactIncremental(g.messagesJson(spark, 500, offset = 2100).toDF("value"), 2L)

    // "restart": a fresh catch-up applies both, then a replayed catch-up
    // (same checkpoint) applies nothing
    val applied2 = ChangeFeed.refreshPartitionsFrom(spark, lake.factRoot, summaryRoot,
      ckpt, "daily_summary", "measurement_date")(summarize)
    assert(applied2.size === 2)
    assert(ChangeFeed.refreshPartitionsFrom(spark, lake.factRoot, summaryRoot,
      ckpt, "daily_summary", "measurement_date")(summarize).isEmpty)

    // crash between apply and marker: rewind the marker one version —
    // the replayed version re-commits nothing (txn = consumer, version)
    val dstBefore = TableVersions.currentVersion(spark, summaryRoot).get
    val lastV = applied2.max
    val mp = new org.apache.hadoop.fs.Path(ckpt, "cdf_progress")
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = mfs.create(mp, true)
    try out.write((lastV - 1).toString.getBytes) finally out.close()
    val replayed = ChangeFeed.refreshPartitionsFrom(spark, lake.factRoot, summaryRoot,
      ckpt, "daily_summary", "measurement_date")(summarize)
    assert(replayed === Seq(lastV))
    assert(TableVersions.currentVersion(spark, summaryRoot).get === dstBefore,
      "replayed in-flight version must re-commit nothing downstream")

    // the CDF-fed summary equals a one-shot summary over the final fact
    val fed = TableVersions.read(spark, summaryRoot)
    val oneShot = summarize(TableVersions.read(spark, lake.factRoot))
      .select(fed.columns.map(col).toIndexedSeq: _*)
    assert(fed.count() === oneShot.count() && fed.count() > 0)
    assert(fed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fed).isEmpty)
  }
}
