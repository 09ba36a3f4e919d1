package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{ChangeFeed, TableVersions}

/** Round-11 hardening contracts: a rewrite whose inputs were
  * concurrently DV-tombstoned must NOT commit (silent resurrection),
  * tables may carry columns literally named `file`/`pos` through the
  * DV paths, the change-feed progress marker survives crashes
  * atomically and fails loudly when corrupt, and an empty `drop` tuple
  * can never empty a table.
  */
class Round11TableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tv11").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commitRewrite refuses when a removed file's DV reference moved mid-flight") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(1))
    val st0 = TableVersions.commitState(spark, root)
    val fileA = st0.files.head.path
    assert(st0.dvs.isEmpty)
    // simulate a rewrite-path delete that READ its candidates under st0
    // (no DVs) and staged its survivors...
    val f = hfs(root)
    def stage(tag: String) = {
      val outDir = new org.apache.hadoop.fs.Path(root, s"data/$tag")
      TableVersions.read(spark, root, Some(0L)).filter(col("k") > 10L)
        .coalesce(1).write.parquet(outDir.toString)
      val staged = f.listStatus(outDir).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      (outDir, Seq(TableVersions.FileEntry(staged.toString,
        f.getFileStatus(staged).getLen, 90L, Map.empty, Map.empty)))
    }
    val (outDir, added) = stage("rw-race")
    // ...while a concurrent DV delete lands new tombstones on fileA
    val Some(_) = TableVersions.deleteWhere(spark, root, col("k") === 50L,
      maxDvFraction = 0.1): @unchecked
    assert(TableVersions.commitState(spark, root).dvs.contains(fileA))
    // the rewrite must see the identity change and refuse — committing
    // would drop the new sidecar reference and RESURRECT k=50
    val r = TableVersions.commitRewrite(spark, root, Set(fileA), added, outDir,
      Map(fileA -> st0.dvs.get(fileA)))
    assert(r.isEmpty, "rewrite over a concurrently-tombstoned file must conflict")
    assert(TableVersions.read(spark, root).filter(col("k") === 50L).count() === 0,
      "the concurrent delete survives")
    assert(TableVersions.read(spark, root).count() === 99)
    // with the CURRENT snapshot (and survivors re-read under it) the
    // same rewrite commits fine
    val st1 = TableVersions.commitState(spark, root)
    val outDir2 = new org.apache.hadoop.fs.Path(root, "data/rw-ok")
    TableVersions.read(spark, root).filter(col("k") > 10L)
      .coalesce(1).write.parquet(outDir2.toString)
    val staged2 = f.listStatus(outDir2).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val added2 = Seq(TableVersions.FileEntry(staged2.toString,
      f.getFileStatus(staged2).getLen, 89L, Map.empty, Map.empty))
    val r2 = TableVersions.commitRewrite(spark, root, Set(fileA), added2, outDir2,
      Map(fileA -> st1.dvs.get(fileA)))
    assert(r2.isDefined)
    assert(TableVersions.read(spark, root).count() === 89)
    assert(TableVersions.commitState(spark, root).dvs.isEmpty,
      "the committed rewrite folds the sidecar reference away")
  }

  test("tables with columns named 'file'/'pos' survive DV delete and DV upsert") {
    val root = newRoot()
    val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "file", "pos")
    TableVersions.append(spark, root, df.coalesce(1))
    // DV delete whose predicate references the TABLE's `file` column —
    // it must see data values, not _metadata paths
    val Some(_) = TableVersions.deleteWhere(spark, root, col("file") === "b",
      maxDvFraction = 0.5): @unchecked
    assert(TableVersions.commitState(spark, root).dvs.nonEmpty, "DV path exercised")
    val t1 = TableVersions.read(spark, root).orderBy("k").collect()
    assert(t1.map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    assert(t1.map(_.getString(1)).toSeq === Seq("a", "c", "d"),
      "data values of the 'file' column intact")
    assert(t1.map(_.getLong(2)).toSeq === Seq(10L, 30L, 40L),
      "data values of the 'pos' column intact")
    // DV upsert on such a table: replaced key's old row tombstones, new
    // image appends — and only that key
    val Some(_) = TableVersions.upsert(spark, root,
      Seq((3L, "cc", 33L)).toDF("k", "file", "pos"), "k", maxDvFraction = 0.5): @unchecked
    val t2 = TableVersions.read(spark, root).orderBy("k").collect()
    assert(t2.map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    assert(t2.map(_.getString(1)).toSeq === Seq("a", "cc", "d"))
    assert(t2.map(_.getLong(2)).toSeq === Seq(10L, 33L, 40L))
  }

  test("change-feed progress marker: corrupt content fails loudly; updates are atomic") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    val ckpt = Files.createTempDirectory("cdf11").toString
    // a normal follow advances the marker and leaves no temp debris
    val applied = ChangeFeed.follow(spark, root, ckpt) { (_, _) => () }
    assert(applied === Seq(0L))
    assert(ChangeFeed.progress(spark, ckpt) === 0L)
    val f = hfs(ckpt)
    val debris = f.listStatus(new org.apache.hadoop.fs.Path(ckpt)).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".cdf_progress.tmp"))
    assert(debris.isEmpty, s"marker update left temp debris: $debris")
    // a truncated/garbage marker (crash mid-write under the OLD
    // in-place scheme) must throw with the recovery path named, on
    // every read, instead of wedging with NumberFormatException or
    // silently replaying
    val marker = new org.apache.hadoop.fs.Path(ckpt, "cdf_progress")
    val out = f.create(marker, true)
    try out.write("".getBytes) finally out.close()
    val ex = intercept[IllegalStateException] { ChangeFeed.progress(spark, ckpt) }
    assert(ex.getMessage.contains("corrupt") && ex.getMessage.contains("Recovery"))
    intercept[IllegalStateException] { ChangeFeed.follow(spark, root, ckpt) { (_, _) => () } }
    // writing the last-applied version back recovers the consumer
    val out2 = f.create(marker, true)
    try out2.write("0".getBytes) finally out2.close()
    TableVersions.append(spark, root, (11L to 20L).toDF("k"))
    val applied2 = ChangeFeed.follow(spark, root, ckpt) { (v, ch) =>
      assert(ch.count() === 10)
    }
    assert(applied2 === Seq(1L))
  }

  test("skew-aware replacePartitions: a hot partition splits into parallel files, metadata exact") {
    val root = newRoot()
    val seed = Seq((0L, "hot"), (1L, "cold")).toDF("k", "g")
    TableVersions.append(spark, root, seed, partitionBy = Seq("g"))
    // skewed refresh: 5000 hot rows vs 10 cold rows, target 1000/file
    val refresh = ((1L to 5000L).map(k => (k, "hot")) ++ (1L to 10L).map(k => (k, "cold")))
      .toDF("k", "g")
    TableVersions.replacePartitions(spark, root, refresh, splitTargetRows = 1000L)
    val st = TableVersions.commitState(spark, root)
    val hotFiles = st.files.filter(_.part == Map("g" -> "hot"))
    val coldFiles = st.files.filter(_.part == Map("g" -> "cold"))
    assert(hotFiles.size === 5, s"hot partition must split ~rows/target ways, got ${hotFiles.size}")
    assert(coldFiles.size === 1, "small partitions keep one file")
    assert(hotFiles.map(_.rows).sum === 5000L, "per-file row counts stay exact")
    // partition metadata still prunes exactly
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "hot")).count() === 5000)
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "cold")).count() === 10)
    assert(TableVersions.read(spark, root).count() === 5010)
    // threshold off (default) keeps the one-file-per-tuple shape
    TableVersions.replacePartitions(spark, root,
      (1L to 3000L).map(k => (k, "hot")).toDF("k", "g"))
    val st2 = TableVersions.commitState(spark, root)
    assert(st2.files.count(_.part == Map("g" -> "hot")) === 1)
  }

  test("replacePartitions rejects an empty drop tuple instead of emptying the table") {
    val root = newRoot()
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "d")
    TableVersions.append(spark, root, df, partitionBy = Seq("d"))
    val ex = intercept[IllegalArgumentException] {
      TableVersions.replacePartitions(spark, root,
        Seq((3L, "2024-01-03")).toDF("k", "d"), drop = Seq(Map.empty))
    }
    assert(ex.getMessage.contains("empty partition tuple"))
    assert(TableVersions.read(spark, root).count() === 2, "nothing committed")
  }
}
