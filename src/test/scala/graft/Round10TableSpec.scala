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
