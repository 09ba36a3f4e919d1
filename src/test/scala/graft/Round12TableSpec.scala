package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Round-12 table-format regressions:
  *   - DV sidecar `file` entries resolve against the sidecar's OWNING
  *     table root, so a shallow clone of a DV-carrying table keeps its
  *     deletions (and carries them correctly through the clone's own
  *     deletes) — before the fix the anti-join keys never matched and
  *     every deleted row silently resurfaced in the clone.
  *   - moveTable's rebase sweep handles LEGACY two-field file lines
  *     (raw un-encoded paths, split at the LAST tab) without mangling
  *     '+'/'%' through enc/dec it must not apply.
  *   - vacuum's `_cdf` sweep spares recently-written unreferenced
  *     sidecar dirs (an in-flight writer stages BEFORE committing).
  */
class Round12TableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("r12").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("shallow clone of a DV-carrying table keeps deletions; its own DV deletes carry them") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4))
    TableVersions.deleteWhere(spark, root, col("k").isin(7L, 111L), maxDvFraction = 0.2)
    assert(TableVersions.commitState(spark, root).dvs.nonEmpty,
      "precondition: the delete must have taken the DV path")
    assert(TableVersions.read(spark, root).count() === 398)

    val dest = newRoot()
    TableVersions.shallowClone(spark, root, dest)
    // the clone references the SOURCE's sidecars absolutely; their
    // relative entries must resolve against the SOURCE root
    val got = TableVersions.read(spark, dest).select("k").as[Long].collect().toSet
    assert(got.size === 398 && !got(7L) && !got(111L),
      "clone must serve the source's DV deletions, not resurrect the rows")
    // the `graft-table` format reader takes the DvTableRelation path
    val viaFormat = spark.read.format("graft-table").load(dest)
      .select("k").as[Long].collect().toSet
    assert(viaFormat === got)

    // a DV delete ON THE CLONE carries the source-sidecar tombstones
    // into the clone's new sidecar (foreign files stay absolute)
    TableVersions.deleteWhere(spark, dest, col("k") === 12L, maxDvFraction = 0.2)
    val after = TableVersions.read(spark, dest).select("k").as[Long].collect().toSet
    assert(after.size === 397 && !after(7L) && !after(111L) && !after(12L),
      "carried tombstones must survive the clone's own DV delete")
    assert(TableVersions.read(spark, root).count() === 398, "source unaffected")
  }

  test("moveTable rebases legacy two-field file lines without enc/dec mangling") {
    val base = Files.createTempDirectory("r12legacy").toString
    val root = s"$base/t"
    val f = hfs(base)
    // stage one real parquet file whose NAME contains '+' and '%' —
    // the characters dec()/enc() corrupt when wrongly applied to a raw
    // legacy path
    val tmp = s"$base/stage"
    (1L to 10L).toDF("k").coalesce(1).write.parquet(tmp)
    val part = f.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    f.mkdirs(dataDir)
    val dataFile = new org.apache.hadoop.fs.Path(dataDir, "part+a+b.parquet")
    assert(f.rename(part, dataFile))
    val bytes = f.getFileStatus(dataFile).getLen
    // hand-write a LEGACY commit: raw absolute two-field line, no header
    f.mkdirs(new org.apache.hadoop.fs.Path(root, "_versions"))
    val commit = new org.apache.hadoop.fs.Path(root, "_versions/v0.commit")
    val out = f.create(commit, false)
    try out.write(s"${dataFile.toUri.getPath}\t$bytes\n#END 1\n"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, root).count() === 10, "legacy table reads pre-move")

    TableVersions.moveTable(spark, root, s"$base/moved/t")
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, s"$base/moved/t").count() === 10,
      "moved legacy table must stay readable — raw path rebased without enc/dec")
    val text = {
      val in = f.open(new org.apache.hadoop.fs.Path(s"$base/moved/t/_versions/v0.commit"))
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    }
    assert(text.startsWith("data/part+a+b.parquet\t"),
      s"legacy line must rebase to the RAW relative path, got:\n$text")
  }

  test("vacuum spares a fresh orphan DATA file; dropped-history files still sweep at once") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(1)) // v0
    TableVersions.deleteWhere(spark, root, col("k") <= 50L)               // v1 rewrite
    val f = hfs(root)
    // an in-flight writer's freshly staged batch: referenced by NOTHING
    val live = TableVersions.commitState(spark, root).files.head.path
    val orphan = new org.apache.hadoop.fs.Path(root, "data/batch-inflight/part-0.parquet")
    f.mkdirs(orphan.getParent)
    org.apache.hadoop.fs.FileUtil.copy(f, new org.apache.hadoop.fs.Path(live),
      f, orphan, false, spark.sparkContext.hadoopConfiguration)
    TableVersions.vacuum(spark, root, keepVersions = 1) // default grace
    assert(f.exists(orphan), "a fresh unreferenced staged file must survive the grace")
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v0.commit")),
      "the dropped version's commit is gone")
    // v0's files were referenced by a KNOWN (dropped) commit: swept at
    // once even under the default grace — that is the point of vacuum
    val remaining = {
      val it = f.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    assert(remaining === 2, s"live file + spared orphan only, got $remaining")
    assert(TableVersions.read(spark, root).count() === 50)
    TableVersions.vacuum(spark, root, keepVersions = 1, graceMs = 0L)
    assert(!f.exists(orphan), "grace 0 sweeps the orphan")
  }

  test("currentVersion forward-probe: tails new commits, survives root recreation") {
    val root = newRoot()
    TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "v"))
    TableVersions.append(spark, root, Seq((2L, "b")).toDF("k", "v"))
    assert(TableVersions.currentVersion(spark, root) === Some(1L))
    TableVersions.append(spark, root, Seq((3L, "c")).toDF("k", "v"))
    assert(TableVersions.currentVersion(spark, root) === Some(2L),
      "the floor probe must see commits newer than the cached floor")
    // recreate the table at the SAME root: the cached floor's commit
    // file is gone — must fall back to the listing, never lie
    hfs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    assert(TableVersions.currentVersion(spark, root) === None)
    TableVersions.append(spark, root, Seq((9L, "z")).toDF("k", "v"))
    assert(TableVersions.currentVersion(spark, root) === Some(0L))
    assert(TableVersions.read(spark, root).count() === 1)
  }

  test("vacuum spares fresh unreferenced _cdf dirs within the grace window") {
    val root = newRoot()
    TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "v"))
    TableVersions.setTableProperty(spark, root, TableVersions.ChangeFeedProp, "true")
    TableVersions.upsert(spark, root, Seq((2L, "b")).toDF("k", "v"), "k")
    val f = hfs(root)
    val cdfDir = new org.apache.hadoop.fs.Path(root, "_cdf")
    // a freshly-staged sidecar of an in-flight (not yet committed) writer
    f.mkdirs(new org.apache.hadoop.fs.Path(cdfDir, "cdf-inflight"))
    TableVersions.vacuum(spark, root, keepVersions = 10)
    assert(f.exists(new org.apache.hadoop.fs.Path(cdfDir, "cdf-inflight")),
      "default grace must spare a just-written unreferenced sidecar dir")
    TableVersions.vacuum(spark, root, keepVersions = 10, graceMs = 0L)
    assert(!f.exists(new org.apache.hadoop.fs.Path(cdfDir, "cdf-inflight")),
      "grace 0 sweeps it")
  }
}
