package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The DataSource V2 generator table: determinism across parallelism,
  * equivalence with the Dataset-API generator, and the two optimizer
  * handles — column pruning visible in the scan's readSchema and filter
  * pushdown leaving NO Spark-side Filter node.
  */
class HealthcareSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(tpe: String, n: Long, partitions: Int = 4) =
    spark.read.format("healthcare-gen")
      .option("type", tpe).option("n", n).option("seed", 42).option("partitions", partitions)
      .load()

  test("vitals table equals the Dataset-API generator, under any partitioning") {
    val fromDs = new graft.gen.HealthcareGenerator(42L).vitalsDs(spark, 500).toDF()
    val p1 = read("vitals", 500, 1)
    val p7 = read("vitals", 500, 7)
    assert(p1.exceptAll(fromDs).isEmpty && fromDs.exceptAll(p1).isEmpty)
    assert(p7.exceptAll(fromDs).isEmpty && fromDs.exceptAll(p7).isEmpty)
  }

  test("claims and ehr schemas and row counts") {
    assert(read("claims", 200).count() == 200)
    val ehr = read("ehr", 100)
    assert(ehr.count() == 100)
    assert(ehr.schema.fieldNames.contains("lab_results"))
  }

  test("column pruning reaches the scan (readSchema narrows)") {
    val df = read("vitals", 100).select("patient_id", "heart_rate")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("patient_id", "heart_rate"))
  }

  test("supported filters push down: no Spark-side Filter node, same rows as post-filter") {
    val pushed = read("vitals", 2000).filter(col("heart_rate") > 100 && col("location") === "ICU")
    val plan = pushed.queryExecution.executedPlan
    assert(plan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty,
      s"expected no residual FilterExec:\n$plan")
    val unpushed = read("vitals", 2000).collect()
      .filter(r => r.getInt(r.fieldIndex("heart_rate")) > 100 &&
        r.getString(r.fieldIndex("location")) == "ICU")
    assert(pushed.count() == unpushed.length && pushed.count() > 0)
  }

  test("unsupported filters stay Spark-side (residual) and still evaluate correctly") {
    // length() is not a V1 Filter shape — must remain a Spark Filter
    val df = read("claims", 500).filter(length(col("claim_id")) === 9)
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }.nonEmpty)
    assert(df.count() == 500) // CLM + 6 digits
  }
}
