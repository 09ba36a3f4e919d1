package graft

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.model.Config
import graft.runner.Lakehouse

/** End-to-end zone layout + partition pruning on the curated fact. */
class LakehouseSpec extends SparkSpec {

  test("lakehouse runAll: zones materialize, gates healthy, fact partition-pruned") {
    val root = java.nio.file.Files.createTempDirectory("lake_").toString
    val lake = new Lakehouse(spark, root, Config.default)
    val alerts = lake.runAll(messages = 3000)
    assert(!alerts.exists(a => a.check == "freshness" || a.check == "health"))

    assert(lake.processedVitals.count() > 1000)
    assert(lake.fact.count() > 0)

    // partition pruning: generated vitals span one day, so extend the
    // curated table with a copy shifted 3 days back (second partition),
    // then factSince must read only the recent partition
    import org.apache.spark.sql.functions._
    val root2 = java.nio.file.Files.createTempDirectory("lake2_").toString
    val recent = lake.fact
    val shifted = recent
      .withColumn("measurement_timestamp", col("measurement_timestamp") - expr("INTERVAL 3 DAYS"))
    recent.unionByName(shifted)
      .withColumn("measurement_date", to_date(col("measurement_timestamp")))
      .write.partitionBy("measurement_date")
      .parquet(s"$root2/curated/fact_patient_encounters")
    val lake2 = new Lakehouse(spark, root2, Config.default)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val since = java.sql.Timestamp.valueOf("2026-08-11 00:00:00")
      val pruned = lake2.factSince(since)
      val scan = pruned.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.partitionFilters.nonEmpty,
        s"expected partition filters, got: ${scan.partitionFilters}")
      val prunedPartitions = scan.relation.location.listFiles(scan.partitionFilters, Nil).length
      val allPartitions = scan.relation.location.listFiles(Nil, Nil).length
      assert(prunedPartitions < allPartitions,
        s"pruning ineffective: $prunedPartitions of $allPartitions partitions")
      // parity with the unpruned logical filter
      val expected = lake2.fact.filter(col("measurement_timestamp") >= lit(since)).count()
      assert(pruned.count() == expected)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
