package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** The versioned table as a first-class Spark batch source: the
  * `graft-table` format (and `TableVersions.read` underneath) plans
  * through a commit-backed FileIndex, so the CONSUMING QUERY's pushed
  * filters prune files from commit stats during physical planning —
  * no explicit bounds argument, no footer reads, no directory
  * listings.
  */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("gts").toString + "/tbl"

  /** Files the executed scan actually read (the planning-time prune's
    * observable result).
    */
  private def filesRead(df: DataFrame): Long = {
    df.collect() // metrics fill on execution
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in:\n" + df.queryExecution.executedPlan))
    scan.metrics("numFiles").value
  }

  test("format('graft-table'): snapshot + time travel equal TableVersions.read") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root,
      (1L to 1000L).toDF("k").withColumn("v", col("k") * 2).repartition(4))
    TableVersions.append(spark, root,
      (1001L to 1500L).toDF("k").withColumn("v", col("k") * 2).repartition(2))
    val cur = spark.read.format("graft-table").load(root)
    assert(cur.count() === 1500)
    assert(cur.agg(sum("v")).head().getLong(0) ===
      TableVersions.read(spark, root).agg(sum("v")).head().getLong(0))
    val old = spark.read.format("graft-table").option("versionAsOf", v0).load(root)
    assert(old.count() === 1000)
    // SQL over a temp view — the format IS the integration
    cur.createOrReplaceTempView("gt")
    assert(spark.sql("SELECT count(*) FROM gt WHERE k > 1400").head().getLong(0) === 100)
  }

  test("pushed filters prune files from commit stats at planning time") {
    val root = newRoot()
    // 10 files with disjoint k-ranges (repartitionByRange keeps them sorted)
    val df = (1L to 10000L).toDF("k")
      .withColumn("s", format_string("s%05d", col("k")))
    TableVersions.append(spark, root, df.repartitionByRange(10, col("k")))
    val t = TableVersions.read(spark, root)
    assert(filesRead(t) === 10, "unfiltered read scans everything")
    assert(filesRead(t.filter(col("k") === 5L)) === 1, "point lookup hits one file")
    val ranged = t.filter(col("k") >= 2000L && col("k") < 4100L)
    assert(filesRead(ranged) <= 4, "range scan prunes to intersecting files")
    assert(ranged.count() === 2100)
    // string stats prune too (ASCII bounds)
    assert(filesRead(t.filter(col("s") === "s00007")) === 1)
    // IN-lists prune to the union of point lookups
    assert(filesRead(t.filter(col("k").isin(5L, 9995L))) === 2)
    // the plan is a regular parquet scan: pushdown + codegen intact
    val plan = t.filter(col("k") === 5L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
  }

  test("IS NULL prunes to the files that recorded nulls") {
    val root = newRoot()
    // file 0: v null for odd k (sparse column present here only);
    // files 1-2: v fully populated
    TableVersions.append(spark, root, (1L to 100L).toDF("k")
      .withColumn("v", when(col("k") % 2 === 0, col("k") * 10)).coalesce(1))
    TableVersions.append(spark, root, (101L to 200L).toDF("k")
      .withColumn("v", col("k") * 10).coalesce(1))
    TableVersions.append(spark, root, (201L to 300L).toDF("k")
      .withColumn("v", col("k") * 10).coalesce(1))
    val t = TableVersions.read(spark, root)
    assert(filesRead(t) === 3)
    val nulls = t.filter(col("v").isNull)
    assert(filesRead(nulls) === 1, "zero-null files must be skipped for IS NULL")
    assert(nulls.count() === 50)
    assert(t.filter(col("v").isNotNull).count() === 250)
  }

  test("partition-value filters prune partition-pure files") {
    val root = newRoot()
    val df = Seq.tabulate(300)(i => (i.toLong, s"p${i % 3}")).toDF("k", "p")
    TableVersions.append(spark, root, df, partitionBy = Seq("p"))
    val t = TableVersions.read(spark, root)
    val total = filesRead(t)
    assert(total >= 3)
    assert(filesRead(t.filter(col("p") === "p1")) < total,
      "a partition filter must not scan the other partitions' files")
    assert(t.filter(col("p") === "p1").count() === 100)
  }

  test("write surface: save modes are transactional commits, not directory drops") {
    val root = newRoot()
    val d1 = (1L to 100L).map(i => (i, s"p${i % 2}")).toDF("k", "p")
    d1.write.format("graft-table").option("partitionBy", "p")
      .mode("append").save(root)
    assert(TableVersions.commitState(spark, root).partCols === Seq("p"))
    (101L to 150L).map(i => (i, s"p${i % 2}")).toDF("k", "p")
      .write.format("graft-table").mode("append").save(root)
    assert(spark.read.format("graft-table").load(root).count() === 150)
    // overwrite commits a new version; the old one stays time-travelable
    val vBefore = TableVersions.currentVersion(spark, root).get
    (1L to 10L).map(i => (i, "p0")).toDF("k", "p")
      .write.format("graft-table").mode("overwrite").save(root)
    assert(spark.read.format("graft-table").load(root).count() === 10)
    assert(spark.read.format("graft-table").option("versionAsOf", vBefore)
      .load(root).count() === 150)
    // ErrorIfExists honors its contract; Ignore is a no-op
    intercept[IllegalArgumentException] {
      d1.write.format("graft-table").mode("errorifexists").save(root)
    }
    d1.write.format("graft-table").mode("ignore").save(root)
    assert(spark.read.format("graft-table").load(root).count() === 10)
  }

  test("deletion-vector snapshots read through the format surface, equal to read()") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 1000L).toDF("k").withColumn("v", col("k") * 3).repartition(2))
    val Some(v1) = TableVersions.deleteWhere(spark, root,
      col("k").isin(3L, 7L, 500L), maxDvFraction = 0.5): @unchecked
    val fmt = spark.read.format("graft-table").load(root)
    assert(fmt.count() === 997)
    assert(fmt.filter(col("k") === 3L).count() === 0, "tombstoned rows excluded")
    assert(fmt.orderBy("k").collect() ===
      TableVersions.read(spark, root).orderBy("k").collect(),
      "format read must equal TableVersions.read on a DV-carrying snapshot")
    // SQL over a view, aggregation, projection — the full relation surface
    fmt.createOrReplaceTempView("gt_dv")
    assert(spark.sql("SELECT sum(v) FROM gt_dv WHERE k <= 10").head().getLong(0) ===
      (1L to 10L).filterNot(Set(3L, 7L)).map(_ * 3).sum)
    // time travel: the pre-delete snapshot still reads DV-free and full
    assert(spark.read.format("graft-table").option("versionAsOf", v1 - 1)
      .load(root).count() === 1000)
  }

  test("DV scan still prunes files from commit stats: non-candidate files never open") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 9000L).toDF("k").repartitionByRange(3, col("k")))
    val Some(_) = TableVersions.deleteWhere(spark, root,
      col("k").isin(10L, 20L), maxDvFraction = 0.5): @unchecked
    val st = TableVersions.commitState(spark, root)
    assert(st.files.size === 3)
    // corrupt the file holding the HIGH range: a filtered format read
    // of the low range only succeeds if planning pruned that file from
    // the scan using commit stats alone
    val hi = st.files.maxBy(_.stats("k").minNum.get).path
    val f = new org.apache.hadoop.fs.Path(hi)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(hi), true)
    try out.write(Array.fill[Byte](64)(0x42)) finally out.close()
    TableVersions.clearStateCache()
    val lowMax = st.files.map(_.stats("k").maxNum.get).sorted.apply(0)
    val low = spark.read.format("graft-table").load(root)
      .filter(col("k") <= lowMax.toLong)
    assert(low.count() === lowMax.toLong - 2,
      "low-range read succeeds despite the corrupted high file — and excludes tombstones")
  }
}
