package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Versioned parquet tables: atomic append commits, time travel,
  * conflict handling, compaction that preserves history, vacuum, and
  * stats-pruned reads over the live listing.
  */
class TableVersionsSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tv").toString + "/tbl"

  test("appends commit as increasing versions; every retained version time-travels bit-for-bit") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root, (1L to 100L).toDF("k"))
    val v1 = TableVersions.append(spark, root, (101L to 150L).toDF("k"))
    val v2 = TableVersions.append(spark, root, (151L to 160L).toDF("k"))
    assert(Seq(v0, v1, v2) === Seq(0L, 1L, 2L))
    assert(TableVersions.read(spark, root).count() === 160)
    assert(TableVersions.read(spark, root, Some(0L)).agg(sum("k")).head().getLong(0) ===
      (1L to 100L).sum)
    assert(TableVersions.read(spark, root, Some(1L)).count() === 150)
  }

  test("commit claim is atomic: a pre-claimed version forces the append to rebase to the next") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    // simulate a concurrent winner holding v1 with the SAME listing as v0
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0Text = {
      val in = fs.open(new org.apache.hadoop.fs.Path(root, "_versions/v0.commit"))
      try new String(in.readAllBytes()) finally in.close()
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_versions/v1.commit"), false)
    out.write(v0Text.getBytes); out.close()
    val v = TableVersions.append(spark, root, (11L to 20L).toDF("k"))
    assert(v === 2L, "append must rebase past the concurrently-claimed version")
    assert(TableVersions.read(spark, root).count() === 20)
  }

  test("a torn commit (no #END sentinel) is invisible: readers stay on the last good version") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_versions/v1.commit"), false)
    out.write("file:/nonexistent.parquet\t123\n".getBytes) // crashed mid-write: no #END
    out.close()
    assert(TableVersions.currentVersion(spark, root) === Some(0L))
    assert(TableVersions.read(spark, root).count() === 10)
    // and the next append claims v2 (v1's name is burned, its content ignored)
    assert(TableVersions.append(spark, root, (11L to 12L).toDF("k")) === 2L)
    assert(TableVersions.read(spark, root).count() === 12)
  }

  test("compact merges small files into target bins; history still reads the ORIGINAL files") {
    val root = newRoot()
    (0 until 5).foreach(i => TableVersions.append(spark, root,
      (i * 100L until (i + 1) * 100L).toDF("k").coalesce(1)))
    val before = TableVersions.listing(spark, root, None)
    val Some(cv) = TableVersions.compact(spark, root, targetBytes = 1L << 20): @unchecked
    val after = TableVersions.listing(spark, root, Some(cv))
    assert(after.size < before.size, s"${before.size} -> ${after.size} files")
    assert(TableVersions.read(spark, root).agg(sum("k")).head().getLong(0) ===
      (0L until 500L).sum)
    // time travel to the pre-compaction version still sees the old layout + data
    assert(TableVersions.read(spark, root, Some(cv - 1)).count() === 500)
    assert(TableVersions.listing(spark, root, Some(cv - 1)) === before)
    // re-compacting an already-compact table is a no-op
    assert(TableVersions.compact(spark, root, 1L << 20).isEmpty)
  }

  test("vacuum deletes only unreachable files; retained versions still read") {
    val root = newRoot()
    (0 until 4).foreach(i => TableVersions.append(spark, root,
      (i * 10L until (i + 1) * 10L).toDF("k").coalesce(1)))
    TableVersions.compact(spark, root, 1L << 20) // v4 rewrites the layout
    TableVersions.vacuum(spark, root, keepVersions = 1)
    // latest still intact
    assert(TableVersions.read(spark, root).count() === 40)
    // pre-compaction versions are gone (commits dropped, their files deleted)
    intercept[IllegalArgumentException] {
      TableVersions.read(spark, root, Some(0L))
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
    var nParquet = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) nParquet += 1 }
    assert(nParquet === TableVersions.listing(spark, root, None).size,
      "vacuum must leave exactly the live files")
  }

  test("appendTxn is exactly-once: a replayed (app, batch) is a no-op even after other commits") {
    val root = newRoot()
    TableVersions.appendTxn(spark, root, (1L to 10L).toDF("k"), "ingest", 0L)
    TableVersions.appendTxn(spark, root, (11L to 20L).toDF("k"), "ingest", 1L)
    assert(TableVersions.read(spark, root).count() === 20)
    // replay of batch 1: skipped
    TableVersions.appendTxn(spark, root, (11L to 20L).toDF("k"), "ingest", 1L)
    assert(TableVersions.read(spark, root).count() === 20)
    // txn state survives an unrelated append AND a compaction...
    TableVersions.append(spark, root, (21L to 30L).toDF("k").coalesce(1))
    TableVersions.compact(spark, root, 1L << 20)
    assert(TableVersions.lastTxn(spark, root, "ingest") === Some(1L))
    TableVersions.appendTxn(spark, root, (11L to 20L).toDF("k"), "ingest", 0L)
    assert(TableVersions.read(spark, root).count() === 30, "replay after compaction must skip")
    // ...and a DIFFERENT app's batches are independent
    TableVersions.appendTxn(spark, root, (31L to 35L).toDF("k"), "backfill", 0L)
    assert(TableVersions.read(spark, root).count() === 35)
  }

  test("streaming append: a restart that replays micro-batches lands no duplicates") {
    val root = newRoot()
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Long]
    mem.addData(1L to 50L: _*)
    val cp1 = Files.createTempDirectory("tvcp").toString
    TableVersions.startAppend(mem.toDF().toDF("k"), root, cp1, app = "s1").awaitTermination()
    assert(TableVersions.read(spark, root).count() === 50)
    // fresh checkpoint, same source state: Structured Streaming REPLAYS
    // batch 0 — the txn record must make it a no-op
    val cp2 = Files.createTempDirectory("tvcp").toString
    TableVersions.startAppend(mem.toDF().toDF("k"), root, cp2, app = "s1").awaitTermination()
    assert(TableVersions.read(spark, root).count() === 50, "replayed batch must not double-append")
    // new data continues through the replacement checkpoint
    mem.addData(51L to 60L: _*)
    TableVersions.startAppend(mem.toDF().toDF("k"), root, cp2, app = "s1").awaitTermination()
    assert(TableVersions.read(spark, root).count() === 60)
  }

  test("deleteWhere: stats-pruned rewrite touches only candidate files; history keeps the rows") {
    val root = newRoot()
    // range-clustered layout: 4 files of disjoint key ranges
    TableVersions.append(spark, root,
      (1L to 4000L).toDF("k").repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val before = TableVersions.listing(spark, root, None)
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("k").between(1200L, 1400L), bounds = Map("k" -> (1200.0, 1400.0))): @unchecked
    val after = TableVersions.listing(spark, root, Some(dv))
    // only the file(s) covering [1200,1400] were rewritten; the rest are
    // carried BY REFERENCE (same path strings survive into the new listing)
    val carried = before.map(_._1).toSet.intersect(after.map(_._1).toSet)
    assert(carried.size === 3, s"expected 3 of 4 files untouched, carried=${carried.size}")
    assert(TableVersions.read(spark, root).count() === 4000 - 201)
    assert(TableVersions.read(spark, root).filter(col("k").between(1200L, 1400L)).count() === 0)
    // point-in-time read still sees the deleted rows (vacuum is the boundary)
    assert(TableVersions.read(spark, root, Some(dv - 1)).count() === 4000)
  }

  test("optimizeZOrder: layout rewrite preserves data and makes box reads prune files") {
    val root = newRoot()
    val rnd = new scala.util.Random(3)
    TableVersions.append(spark, root,
      (0 until 8000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
        .toDF("x", "y").repartition(8)) // random layout: nothing prunes
    val preFiles = TableVersions.prunedRead(spark, root, Seq("x", "y"),
      Map("x" -> (100.0, 160.0), "y" -> (700.0, 760.0))).inputFiles.length
    val Some(_) = TableVersions.optimizeZOrder(spark, root, Seq("x", "y"), numFiles = 8): @unchecked
    val pruned = TableVersions.prunedRead(spark, root, Seq("x", "y"),
      Map("x" -> (100.0, 160.0), "y" -> (700.0, 760.0)))
    assert(pruned.inputFiles.length < preFiles,
      s"Z-order must enable pruning: $preFiles -> ${pruned.inputFiles.length}")
    // the rewrite lost nothing
    assert(TableVersions.read(spark, root).count() === 8000)
    val full = TableVersions.read(spark, root)
      .filter(col("x").between(100, 160) && col("y").between(700, 760))
    assert(pruned.count() === full.count())
  }

  test("upsert: replaces by key, inserts new keys, touches only key-range candidate files") {
    val root = newRoot()
    // EVEN keys only, so odd keys are insertable INSIDE a file's range
    TableVersions.append(spark, root,
      (1L to 4000L).map(i => (i * 2, i * 10)).toDF("k", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val before = TableVersions.listing(spark, root, None)
    // one replace + one insert, both inside a single file's key range
    val updates = Seq((2200L, -1L), (2201L, -3L)).toDF("k", "v")
    val Some(uv) = TableVersions.upsert(spark, root, updates, "k"): @unchecked
    val after = TableVersions.listing(spark, root, Some(uv))
    val carried = before.map(_._1).toSet.intersect(after.map(_._1).toSet)
    assert(carried.size === 3, s"only the file covering [2200,2201] rewrites; carried=${carried.size}")
    val t = TableVersions.read(spark, root)
    assert(t.count() === 4001)
    assert(t.filter(col("k") === 2200L).head().getLong(1) === -1L, "existing key replaced")
    assert(t.filter(col("k") === 2400L).head().getLong(1) === 12000L, "untouched key intact")
    assert(t.filter(col("k") === 2201L).count() === 1, "new key inserted")
    // replay-shaped second apply of the same updates is a no-op on content
    TableVersions.upsert(spark, root, updates, "k")
    assert(TableVersions.read(spark, root).count() === 4001)
  }

  test("history and diffs: metadata audit per version; content diff pinpoints a delete exactly") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 1000L).toDF("k").repartitionByRange(2, col("k")))
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("k").between(100L, 120L), Map("k" -> (100.0, 120.0))): @unchecked
    val h = TableVersions.history(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.map(_._1).toSeq === Seq(dv, 0L), "newest first")
    val dl = TableVersions.diffListing(spark, root, 0L, dv)
      .collect().map(r => r.getString(2)).groupBy(identity).view.mapValues(_.length).toMap
    assert(dl("removed") === 1 && dl("added") >= 1, s"one file rewritten: $dl")
    val dr = TableVersions.diffRows(spark, root, 0L, dv)
    assert(dr.filter(col("change") === "added").count() === 0)
    assert(dr.filter(col("change") === "removed").count() === 21)
    assert(dr.agg(min("k"), max("k")).head() match {
      case r => r.getLong(0) == 100L && r.getLong(1) == 120L
    })
  }

  test("additive schema evolution: a widened append reads merged; old files null-fill") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    TableVersions.append(spark, root, (11L to 15L).map(i => (i, s"s$i")).toDF("k", "tag"))
    val merged = TableVersions.read(spark, root, mergeSchema = true)
    assert(merged.columns.toSeq === Seq("k", "tag"))
    assert(merged.count() === 15)
    assert(merged.filter(col("tag").isNull).count() === 10, "pre-evolution rows null-fill")
    assert(merged.filter(col("tag") === "s12").count() === 1)
  }

  test("prunedRead: stats over the live listing skip files outside the predicate box") {
    val root = newRoot()
    (0 until 4).foreach(i => TableVersions.append(spark, root,
      (i * 1000L until (i + 1) * 1000L).toDF("k").coalesce(1)))
    val pruned = TableVersions.prunedRead(spark, root, Seq("k"), Map("k" -> (1200.0, 1300.0)))
    assert(pruned.count() === 101)
    assert(pruned.inputFiles.length === 1, "only the one file covering [1200,1300] should open")
  }
}
