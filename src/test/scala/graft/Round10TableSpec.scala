package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.operators.{IndexTombstones, TableVersions}

/** Round-10 hardening contracts: the change feed refuses ranges that
  * precede retained history (instead of silently re-emitting the whole
  * snapshot as inserts), legacy no-schema chains survive removal-only
  * rewrite steps, first-append partitioning races abort the loser, and
  * tombstone-dir cleanup never recursively deletes concurrent work.
  */
class Round10TableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tv10").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("readChanges throws past the vacuum horizon; in-range reads unchanged") {
    val root = newRoot()
    val vs = (0 until 4).map { i =>
      TableVersions.append(spark, root,
        ((i * 10L) until ((i + 1) * 10L)).toDF("k").coalesce(1))
    }
    // full-history read works before vacuum
    assert(TableVersions.readChanges(spark, root, -1L, vs.last).count() === 40)
    TableVersions.vacuum(spark, root, keepVersions = 2) // retains v2, v3 only
    // the step into v2 needs v1's listing — gone; must throw, not emit
    // v2's full 30-row snapshot as inserts
    val ex = intercept[IllegalStateException] {
      TableVersions.readChanges(spark, root, vs(0), vs.last).count()
    }
    assert(ex.getMessage.contains("precedes retained history"))
    intercept[IllegalStateException] {
      TableVersions.readChanges(spark, root, -1L, vs.last).count()
    }
    // a range whose predecessor IS retained still works
    val tail = TableVersions.readChanges(spark, root, vs(2), vs.last)
    assert(tail.count() === 10)
    assert(tail.select("_commit_version").distinct().head().getLong(0) === vs.last)
    // empty range stays an empty frame, not an error
    assert(TableVersions.readChanges(spark, root, vs.last, vs.last).count() === 0)
  }

  test("legacy no-schema chain: removal-only rewrite step emits deletes, not a crash") {
    val root = newRoot()
    val f = hfs(root)
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    f.mkdirs(dataDir)
    // two real parquet files, committed via hand-written LEGACY commit
    // lines (two-field, no #SCHEMA) — the pre-stats on-disk format
    val paths = (0 until 2).map { i =>
      val p = s"$root/data/legacy$i"
      ((i * 5L) until ((i + 1) * 5L)).toDF("k").coalesce(1).write.parquet(p)
      val file = f.listStatus(new org.apache.hadoop.fs.Path(p)).toSeq
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      (file.toString, f.getFileStatus(file).getLen)
    }
    def writeCommit(v: Long, files: Seq[(String, Long)]): Unit = {
      val vd = new org.apache.hadoop.fs.Path(root, "_versions")
      f.mkdirs(vd)
      val body = files.map { case (p, b) => s"$p\t$b" } :+ s"#END ${files.size}"
      val out = f.create(new org.apache.hadoop.fs.Path(vd, s"v$v.commit"), true)
      try out.write((body.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    writeCommit(0L, paths)
    writeCommit(1L, paths.take(1)) // removal-only step: drops legacy1, adds nothing
    val cdf = TableVersions.readChanges(spark, root, -1L, 1L)
    val byStep = cdf.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byStep((0L, "insert")) === 10)
    assert(byStep((1L, "delete")) === 5)
    assert(cdf.filter(col("_commit_version") === 1L).agg(min("k"), max("k"))
      .head() === org.apache.spark.sql.Row(5L, 9L))
  }

  test("concurrent first appends with different partitioning: exactly one declaration wins") {
    (0 until 3).foreach { _ =>
      val root = newRoot()
      val a = Future(scala.util.Try(TableVersions.append(spark, root,
        Seq((1L, "x"), (2L, "y")).toDF("k", "p"), partitionBy = Seq("p"))))
      val b = Future(scala.util.Try(TableVersions.append(spark, root,
        Seq((3L, "z"), (4L, "w")).toDF("k", "p"))))
      val (ra, rb) = (Await.result(a, 60.seconds), Await.result(b, 60.seconds))
      // the loser must abort (creation race or fixed-at-creation check),
      // never clobber the winner's partition declaration
      assert(ra.isSuccess || rb.isSuccess)
      val declared = TableVersions.commitState(spark, root).partCols
      val versions = (0L to TableVersions.currentVersion(spark, root).get)
      versions.foreach { v =>
        assert(TableVersions.commitState(spark, root, Some(v)).partCols === declared,
          "every commit must carry the winner's partition declaration")
      }
      if (ra.isSuccess && rb.isSuccess) {
        // both landed: B inherited A's declaration (empty partitionBy is
        // "inherit"), so the table must be partitioned by p
        assert(declared === Seq("p"))
        assert(TableVersions.read(spark, root).count() === 4)
      }
    }
  }


  test("deletion vectors: k-row delete writes O(k) bytes; reads exclude; maintenance folds") {
    val root = newRoot()
    import org.apache.spark.sql.functions.{col, lit}
    TableVersions.append(spark, root,
      (1L to 20000L).toDF("k").withColumn("v", col("k") * 7).coalesce(2))
    val dataBytes = TableVersions.listing(spark, root).map(_._2).sum
    // 10-row takedown: DV path (fraction 10/20000 well under 0.1)
    val Some(v1) = TableVersions.deleteWhere(spark, root,
      col("k").isin(5L, 6L, 7L, 100L, 101L, 9000L, 9001L, 15000L, 15001L, 19999L),
      maxDvFraction = 0.1): @unchecked
    val st1 = TableVersions.commitState(spark, root)
    assert(st1.dvs.nonEmpty, "DV delete must record sidecar references")
    assert(st1.files.map(_.path).toSet ===
      TableVersions.listing(spark, root, Some(v1 - 1)).map(_._1).toSet,
      "merge-on-read: no data file rewritten")
    val f = hfs(root)
    val dvBytes = st1.dvs.values.map(_._1).toSeq.distinct
      .map(p => f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    assert(dvBytes < dataBytes / 10, s"sidecar must be O(k) bytes, got $dvBytes of $dataBytes")
    assert(st1.dvs.values.map(_._2).sum === 10L)
    // reads exclude the rows — plain, pruned, partition, point-lookup
    val t1 = TableVersions.read(spark, root)
    assert(t1.count() === 19990)
    assert(t1.filter(col("k") === 5L).count() === 0)
    assert(TableVersions.prunedRead(spark, root, Seq("k"), Map("k" -> (1.0, 200.0)))
      .count() === 195)
    // time travel still sees them; CDF shows the DV step as deletes
    assert(TableVersions.read(spark, root, Some(v1 - 1)).count() === 20000)
    val cdf = TableVersions.readChanges(spark, root, v1 - 1, v1)
    assert(cdf.filter(col("_change_type") === "delete").count() === 10)
    assert(cdf.filter(col("_change_type") === "insert").count() === 0)
    assert(cdf.select("k").collect().map(_.getLong(0)).toSet ===
      Set(5L, 6L, 7L, 100L, 101L, 9000L, 9001L, 15000L, 15001L, 19999L))
    // second DV delete merges the file's previous tombstones forward
    val Some(v2) = TableVersions.deleteWhere(spark, root,
      col("k").isin(50L, 51L), maxDvFraction = 0.1): @unchecked
    assert(TableVersions.read(spark, root).count() === 19988)
    assert(TableVersions.read(spark, root).filter(col("k") === 5L).count() === 0,
      "first delete's tombstones must survive the second")
    val st2 = TableVersions.commitState(spark, root)
    assert(st2.dvs.values.map(_._2).sum === 12L)
    // a large delete exceeds the fraction and falls back to rewrite
    val Some(v3) = TableVersions.deleteWhere(spark, root,
      col("k") <= 10000L, bounds = Map("k" -> (1.0, 10000.0)),
      maxDvFraction = 0.1): @unchecked
    assert(TableVersions.read(spark, root).count() === 9997)
    // compaction folds the remaining DVs away
    TableVersions.compact(spark, root, targetBytes = 1L << 30)
    val stC = TableVersions.commitState(spark, root)
    assert(stC.dvs.isEmpty, "compaction must re-materialize tombstoned files")
    assert(TableVersions.read(spark, root).count() === 9997)
    assert(TableVersions.read(spark, root).filter(col("k") === 15000L).count() === 0)
    assert(v2 < v3)
  }

  test("single-job compaction: many bins, one distributed write, bins stay partition-pure") {
    val root = newRoot()
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val df = (1L to 6000L).toDF("k")
      .withColumn("g", pmod(col("k"), lit(3)).cast("string"))
    // 4 small files per partition value
    (0 until 4).foreach { i =>
      TableVersions.append(spark, root,
        df.filter(pmod(col("k"), lit(4)) === i).repartition(1), partitionBy = Seq("g"))
    }
    assert(TableVersions.commitState(spark, root).files.size === 12)
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val before = TableVersions.read(spark, root).orderBy("k").collect()
    val Some(_) = TableVersions.compact(spark, root, targetBytes = 1L << 30): @unchecked
    val st = TableVersions.commitState(spark, root)
    assert(st.files.size === 3, "one merged file per partition value")
    assert(st.files.map(_.part).toSet ===
      Set(Map("g" -> "0"), Map("g" -> "1"), Map("g" -> "2")))
    assert(TableVersions.read(spark, root).orderBy("k").collect() === before)
    // partition metadata still prunes
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "1")).count() === 2000)
  }

  test("#FORMAT header: written on new commits, tolerated when absent, higher major refused") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    val f = hfs(root)
    val vd = new org.apache.hadoop.fs.Path(root, "_versions/v0.commit")
    val in = f.open(vd)
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    assert(text.startsWith("#FORMAT 3\n"), "every new commit must lead with the format header")
    // a future-major commit must be refused loudly, not misread
    val out = f.create(vd, true)
    try out.write(("#FORMAT 99\n" + text.stripPrefix("#FORMAT 3\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    TableVersions.clearStateCache() // the rewritten commit must be re-read
    val ex = intercept[IllegalStateException] { TableVersions.read(spark, root).count() }
    assert(ex.getMessage.contains("format major 99"))
  }

  test("CHECK validation is one job per batch regardless of constraint count") {
    val root = newRoot()
    import org.apache.spark.sql.functions.col
    TableVersions.append(spark, root, (1L to 100L).toDF("k").withColumn("v", col("k") * 2))
    TableVersions.addConstraint(spark, root, "k_pos", "k > 0")
    TableVersions.addConstraint(spark, root, "v_even", "v % 2 = 0")
    TableVersions.addConstraint(spark, root, "v_big", "v >= 2")
    // violation names the exact constraint and its row count
    val ex = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root,
        Seq((101L, 203L)).toDF("k", "v"))
    }
    assert(ex.getMessage.contains("v_even") && ex.getMessage.contains("1 rows"))
    // a clean batch with 3 constraints runs ONE validation job
    val sc = spark.sparkContext
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      TableVersions.append(spark, root, Seq((102L, 204L)).toDF("k", "v"))
      Thread.sleep(2000) // listener bus is async; local bus drains well within this
    } finally sc.removeSparkListener(listener)
    // jobs: 1 validation + staging write + stats pass (+ AQE internals) —
    // the validation must not scale with constraint count: with 3
    // constraints a per-constraint design would add 3 jobs by itself
    assert(counter.get() <= 5, s"append with 3 constraints ran ${counter.get()} jobs")
  }

  test("DV plan shape: DV-free reads stay plain scans, DV'd reads add one anti-join") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 5000L).toDF("k").coalesce(1))
    val plan0 = TableVersions.read(spark, root).queryExecution.executedPlan.toString
    assert(!plan0.contains("LeftAnti"),
      "a table without deletion vectors must not pay the DV join:\n" + plan0)
    val Some(_) = TableVersions.deleteWhere(spark, root,
      col("k").isin(7L, 8L), maxDvFraction = 0.1): @unchecked
    val plan1 = TableVersions.read(spark, root).queryExecution.executedPlan.toString
    assert(plan1.contains("LeftAnti"), "tombstoned files read through the DV anti-join")
    assert(TableVersions.read(spark, root).count() === 4998)
  }

  test("merge-on-read upsert: k-key CDC batch tombstones old rows and appends, no file rewrite") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 10000L).toDF("k").withColumn("v", col("k") * 10).coalesce(2))
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    // 3-key CDC batch: 2 replacements + 1 new key
    val Some(v1) = TableVersions.upsert(spark, root,
      Seq((42L, -1L), (9999L, -2L), (20000L, -3L)).toDF("k", "v"),
      "k", maxDvFraction = 0.1): @unchecked
    val st = TableVersions.commitState(spark, root)
    assert(files0.subsetOf(st.files.map(_.path).toSet),
      "merge-on-read upsert must not rewrite existing files")
    assert(st.files.size > files0.size, "the update batch appends as new files")
    assert(st.dvs.values.map(_._2).sum === 2L, "only the replaced keys' old rows tombstone")
    val t = TableVersions.read(spark, root)
    assert(t.count() === 10001)
    assert(t.filter(col("k") === 42L).select("v").head().getLong(0) === -1L)
    assert(t.filter(col("k") === 9999L).select("v").head().getLong(0) === -2L)
    assert(t.filter(col("k") === 20000L).select("v").head().getLong(0) === -3L)
    assert(t.filter(col("k") === 41L).select("v").head().getLong(0) === 410L)
    // CDF: delete(old image) + insert(new images) in the one step
    val cdf = TableVersions.readChanges(spark, root, v1 - 1, v1)
    val byType = cdf.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("delete") === 2 && byType("insert") === 3)
    // a wide CDC batch (every odd key) falls back to the rewrite path —
    // every file is a candidate, so the rewrite also folds all DVs
    val wide = (1L to 10000L by 2).map(k => (k, k * 100)).toDF("k", "v")
    val Some(_) = TableVersions.upsert(spark, root, wide, "k", maxDvFraction = 0.1): @unchecked
    assert(TableVersions.commitState(spark, root).dvs.isEmpty,
      "the rewrite re-materializes tombstones away")
    val t2 = TableVersions.read(spark, root)
    assert(t2.count() === 10001)
    assert(t2.filter(col("k") === 41L).select("v").head().getLong(0) === 4100L)
    assert(t2.filter(col("k") === 42L).select("v").head().getLong(0) === -1L,
      "the DV-upserted value survives the rewrite")
    assert(t2.filter(col("k") === 20000L).select("v").head().getLong(0) === -3L)
  }

  test("change-feed plan flattening: N appends plan as one scan; attribution exact") {
    val root = newRoot()
    val vs = (0 until 5).map { i =>
      TableVersions.append(spark, root,
        ((i * 10L) until ((i + 1) * 10L)).toDF("k").coalesce(1))
    }
    val cdf = TableVersions.readChanges(spark, root, -1L, vs.last)
    val plan = cdf.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"5 append steps must flatten to ONE scan, saw $scans:\n$plan")
    assert(!plan.contains("Union"), "flattened feed has no per-step union")
    assert(cdf.count() === 50)
    // per-file version attribution survives the flattening
    val byV = cdf.groupBy("_commit_version")
      .agg(count(lit(1)).as("n"), min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      assert(byV(v) === ((10L, i * 10L, i * 10L + 9L)), s"step $i attribution")
    }
    assert(cdf.select("_change_type").distinct().head().getString(0) === "insert")
  }

  test("change-feed flattening falls back when a restore re-adds a path") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root, (1L to 10L).toDF("k").coalesce(1))
    // delete EVERYTHING: the rewrite removes the file and adds nothing →
    // a delete-only step
    val Some(v1) = TableVersions.deleteWhere(spark, root, lit(true)): @unchecked
    // restore re-adds the ORIGINAL path → the insert-group path→version
    // map would be ambiguous; those steps must take the per-step path
    val Some(v2) = TableVersions.restore(spark, root, v0): @unchecked
    val cdf = TableVersions.readChanges(spark, root, -1L, v2)
    val byKind = cdf.groupBy("_change_type", "_commit_version").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byKind === Map(
      ("insert", v0) -> 10L, ("delete", v1) -> 10L, ("insert", v2) -> 10L))
    assert(TableVersions.read(spark, root).count() === 10)
  }

  test("clearBatches sweeps non-recursively: a foreign subdir survives cleanup") {
    val idx = Files.createTempDirectory("tomb10").toString + "/idx"
    val tp = new org.apache.hadoop.fs.Path(IndexTombstones.tombstonePath(idx))
    val f = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(tp, "del_batch=7"))
    f.create(new org.apache.hadoop.fs.Path(tp, "_SUCCESS"), true).close()
    // a concurrently-landing partition materialized as an _-prefixed
    // temp dir: cleanup must tolerate it, never recursively delete it
    val foreign = new org.apache.hadoop.fs.Path(tp, "_landing")
    f.mkdirs(foreign)
    f.create(new org.apache.hadoop.fs.Path(foreign, "part-0"), true).close()
    IndexTombstones.clearBatches(spark, idx, Seq(7L))
    assert(!f.exists(new org.apache.hadoop.fs.Path(tp, "del_batch=7")))
    assert(f.exists(foreign), "non-recursive cleanup must not wipe concurrent work")
    assert(f.exists(new org.apache.hadoop.fs.Path(foreign, "part-0")))
  }
}
