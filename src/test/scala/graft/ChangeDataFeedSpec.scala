package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TableVersions
import graft.operators.TableVersions.{MergeDelete, MergeInsert, MergeUpdate}

/** Table properties (`#PROP`) and the exact change data feed: with
  * `enableChangeFeed=true`, upsert/merge commits write explicit
  * change-data sidecars (`#CDF`), and `readChanges(updateImages=true)`
  * serves update_preimage/update_postimage rows instead of
  * diff-derived delete+insert (the Delta `delta.enableChangeDataFeed`
  * shape). Covers both the rewrite and merge-on-read (DV) paths, the
  * type fold-back for legacy consumers, property persistence through
  * delta commits and checkpoint reconstruction, vacuum's sidecar
  * sweep, and sidecars surviving a column rename.
  */
class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tvcdf").toString + "/tbl"

  private def seed(root: String): Unit = {
    val base = (1L to 100L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "name", "amt")
    TableVersions.append(spark, root,
      base.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    TableVersions.setTableProperty(spark, root, TableVersions.ChangeFeedProp, "true")
  }

  private def changesOf(root: String, from: Long, to: Long,
      images: Boolean): Seq[(Long, String, Double, String, Long)] =
    TableVersions.readChanges(spark, root, from, to, updateImages = images)
      .select($"k", $"name", $"amt", $"_change_type", $"_commit_version")
      .as[(Long, String, Double, String, Long)]
      .collect().sortBy(r => (r._5, r._4, r._1)).toSeq

  test("table property round-trips, inherits through delta commits, and unsets") {
    val root = newRoot()
    seed(root)
    assert(TableVersions.tableProperties(spark, root) ===
      Map(TableVersions.ChangeFeedProp -> "true"))
    // a plain append renders as a delta commit; the property inherits
    TableVersions.append(spark, root, Seq((200L, "x", 1.0)).toDF("k", "name", "amt"))
    assert(TableVersions.tableProperties(spark, root)(TableVersions.ChangeFeedProp) === "true")
    // cold reconstruction (no warm cache) sees the same property
    TableVersions.clearStateCache()
    assert(TableVersions.tableProperties(spark, root)(TableVersions.ChangeFeedProp) === "true")
    // time travel: version 0 predates the property
    assert(TableVersions.tableProperties(spark, root, Some(0L)).isEmpty)
    val ops = TableVersions.history(spark, root)
      .select("operation").as[String].collect().toSeq
    assert(ops.contains("SET PROPERTY enableChangeFeed"))
    TableVersions.unsetTableProperty(spark, root, TableVersions.ChangeFeedProp)
    assert(TableVersions.tableProperties(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      TableVersions.unsetTableProperty(spark, root, "nope")
    }
  }

  test("upsert (rewrite path): exact update images and inserts from the sidecar") {
    val root = newRoot()
    seed(root) // v0 data, v1 property
    val batch = Seq((5L, "five", 555.0), (6L, "six", 666.0), (500L, "new", 1.0))
      .toDF("k", "name", "amt")
    val v = TableVersions.upsert(spark, root, batch, "k").get
    val got = changesOf(root, 1L, v, images = true)
    assert(got === Seq(
      (500L, "new", 1.0, "insert", v),
      (5L, "five", 555.0, "update_postimage", v),
      (6L, "six", 666.0, "update_postimage", v),
      (5L, "v5", 50.0, "update_preimage", v),
      (6L, "v6", 60.0, "update_preimage", v)))
    // default mode folds the images back to delete/insert
    val legacy = changesOf(root, 1L, v, images = false)
    assert(legacy === Seq(
      (5L, "v5", 50.0, "delete", v),
      (6L, "v6", 60.0, "delete", v),
      (5L, "five", 555.0, "insert", v),
      (6L, "six", 666.0, "insert", v),
      (500L, "new", 1.0, "insert", v)))
  }

  test("upsert (merge-on-read DV path): identical change rows, no file rewritten") {
    val root = newRoot()
    seed(root)
    val before = TableVersions.listing(spark, root, None).map(_._1).toSet
    val batch = Seq((5L, "five", 555.0), (500L, "new", 1.0)).toDF("k", "name", "amt")
    val v = TableVersions.upsert(spark, root, batch, "k", maxDvFraction = 0.5).get
    val after = TableVersions.listing(spark, root, None).map(_._1).toSet
    assert(before.subsetOf(after), "DV path must keep every original file")
    assert(changesOf(root, 1L, v, images = true) === Seq(
      (500L, "new", 1.0, "insert", v),
      (5L, "five", 555.0, "update_postimage", v),
      (5L, "v5", 50.0, "update_preimage", v)))
  }

  test("merge: update/delete/insert and by-source images, both paths") {
    for (dvFraction <- Seq(0.0, 0.9)) {
      val root = newRoot()
      seed(root)
      val source = Seq((5L, "U", 999.0), (6L, "D", 0.0), (500L, "I", 111.0))
        .toDF("k", "op", "newAmt")
      val v = TableVersions.merge(spark, root, source, Seq("k"),
        matched = Seq(
          MergeUpdate(Map("amt" -> "s.newAmt"), Some("s.op = 'U'")),
          MergeDelete(Some("s.op = 'D'"))),
        notMatched = Seq(MergeInsert(
          Map("k" -> "s.k", "name" -> "'new'", "amt" -> "s.newAmt"),
          Some("s.op = 'I'"))),
        maxDvFraction = dvFraction).get
      val got = changesOf(root, 1L, v, images = true)
      assert(got === Seq(
        (6L, "v6", 60.0, "delete", v),
        (500L, "new", 111.0, "insert", v),
        (5L, "v5", 999.0, "update_postimage", v),
        (5L, "v5", 50.0, "update_preimage", v)),
        s"dvFraction=$dvFraction")
    }
  }

  test("merge NOT MATCHED BY SOURCE: retention delete images") {
    val root = newRoot()
    seed(root)
    val keep = (1L to 98L).map(k => Tuple1(k)).toDF("k")
    val v = TableVersions.merge(spark, root, keep, Seq("k"),
      notMatchedBySource = Seq(MergeDelete(Some("t.k > 90")))).get
    val got = changesOf(root, 1L, v, images = true)
    assert(got === Seq(
      (99L, "v99", 990.0, "delete", v),
      (100L, "v100", 1000.0, "delete", v)))
  }

  test("mixed range: sidecar steps and diff steps union cleanly") {
    val root = newRoot()
    seed(root)
    TableVersions.append(spark, root, Seq((300L, "app", 3.0)).toDF("k", "name", "amt")) // v2: diff
    val v3 = TableVersions.upsert(spark, root,
      Seq((5L, "five", 5.5)).toDF("k", "name", "amt"), "k").get // v3: sidecar
    val got = changesOf(root, 1L, v3, images = true)
    assert(got === Seq(
      (300L, "app", 3.0, "insert", 2L),
      (5L, "five", 5.5, "update_postimage", v3),
      (5L, "v5", 50.0, "update_preimage", v3)))
  }

  test("without the property no sidecar is written; steps before it still diff") {
    val root = newRoot()
    // NOTE: no property here
    val base = (1L to 10L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "name", "amt")
    TableVersions.append(spark, root, base)
    val v = TableVersions.upsert(spark, root,
      Seq((5L, "five", 5.5)).toDF("k", "name", "amt"), "k").get
    val f = new org.apache.hadoop.fs.Path(root, "_cdf")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_cdf")))
    // updateImages=true degrades gracefully: diff-derived delete+insert
    val got = changesOf(root, 0L, v, images = true)
    assert(got.map(_._4).toSet === Set("delete", "insert"))
  }

  test("vacuum sweeps orphaned and dropped sidecars, keeps referenced ones") {
    val root = newRoot()
    seed(root)
    val v2 = TableVersions.upsert(spark, root,
      Seq((5L, "five", 5.5)).toDF("k", "name", "amt"), "k").get
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdfDir = new org.apache.hadoop.fs.Path(root, "_cdf")
    assert(f.listStatus(cdfDir).length === 1)
    // plant an orphan (a conflicted commit attempt's leftover)
    f.mkdirs(new org.apache.hadoop.fs.Path(cdfDir, "cdf-orphan"))
    TableVersions.vacuum(spark, root, keepVersions = 10, graceMs = 0L) // v2 retained
    val names = f.listStatus(cdfDir).map(_.getPath.getName).toSet
    assert(!names.contains("cdf-orphan") && names.size === 1)
    // more commits, then retention that drops the upsert step
    (1 to 3).foreach { i =>
      TableVersions.append(spark, root, Seq((600L + i, "x", 1.0)).toDF("k", "name", "amt"))
    }
    TableVersions.vacuum(spark, root, keepVersions = 2, graceMs = 0L)
    assert(f.listStatus(cdfDir).isEmpty)
    // the horizon guard still refuses a range that starts below retention
    intercept[IllegalStateException] {
      TableVersions.readChanges(spark, root, 1L, v2 + 3, updateImages = true).collect()
    }
  }

  test("sidecars survive a later column rename (physical names)") {
    val root = newRoot()
    seed(root)
    val v2 = TableVersions.upsert(spark, root,
      Seq((5L, "five", 5.5)).toDF("k", "name", "amt"), "k").get
    val v3 = TableVersions.renameColumn(spark, root, "amt", "amount")
    // a range ending at the rename serves the sidecar under the NEW
    // logical name (the sidecar stores physical names, like data files)
    val got = TableVersions.readChanges(spark, root, 1L, v3, updateImages = true)
      .select($"k", $"amount", $"_change_type")
      .as[(Long, Double, String)].collect().sortBy(_._3).toSeq
    assert(got === Seq((5L, 5.5, "update_postimage"), (5L, 50.0, "update_preimage")))
    // a range ending BEFORE the rename time-travels under the old name
    assert(TableVersions.readChanges(spark, root, 1L, v2, updateImages = true)
      .columns.contains("amt"))
  }

  test("no-op merge with the feed enabled leaves no sidecar debris") {
    val root = newRoot()
    seed(root)
    val v1 = TableVersions.currentVersion(spark, root).get
    val source = Seq((5000L, "Z", 0.0)).toDF("k", "op", "newAmt")
    val v = TableVersions.merge(spark, root, source, Seq("k"),
      matched = Seq(MergeDelete(Some("s.op = 'D'")))) // no match, no insert clause
    assert(v.contains(v1))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdfDir = new org.apache.hadoop.fs.Path(root, "_cdf")
    assert(!f.exists(cdfDir) || f.listStatus(cdfDir).isEmpty)
  }
}
