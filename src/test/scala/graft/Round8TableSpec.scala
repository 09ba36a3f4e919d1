package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Round-8 table-format contracts: stats persisted IN the commit (file
  * planning with zero data-file footer reads), logical partitions with
  * rebase-able (disjoint-file) concurrent maintenance, the loud
  * schema-evolution contract, the change feed, the persistent bloom
  * sidecar, SQL DELETE three-valued logic, and non-numeric upsert keys.
  */
class Round8TableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tv8").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("file planning reads the COMMIT, not footers: pruning works with non-candidate files corrupted") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 4000L).toDF("k").withColumn("v", col("k") * 10)
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    // commit carries stats for both columns — no manifest job needed
    val st = TableVersions.commitState(spark, root)
    assert(st.files.size === 4)
    assert(st.files.forall(f => f.stats.contains("k") && f.stats.contains("v") && f.rows > 0))
    assert(st.files.map(_.rows).sum === 4000)
    // no temp debris from the promote protocol
    val fs = hfs(root)
    val vdir = new org.apache.hadoop.fs.Path(root, "_versions")
    assert(!fs.listStatus(vdir).exists(_.getPath.getName.startsWith(".tmp-")))

    val pruned0 = TableVersions.prunedRead(spark, root, Seq("k"), Map("k" -> (1200.0, 1400.0)))
    assert(pruned0.inputFiles.length === 1)
    val candidate = pruned0.inputFiles.head
    // CORRUPT every non-candidate file: any footer read of them now throws,
    // so a correct plan over the box proves zero data-file footer access
    st.files.map(_.path).filterNot(p => candidate.endsWith(new org.apache.hadoop.fs.Path(p).getName))
      .foreach { p =>
        val out = fs.create(new org.apache.hadoop.fs.Path(p), true)
        out.write("not a parquet file".getBytes); out.close()
      }
    val pruned = TableVersions.prunedRead(spark, root, Seq("k"), Map("k" -> (1200.0, 1400.0)))
    assert(pruned.inputFiles.length === 1)
    assert(pruned.count() === 201)
    // deleteWhere plans from the commit too: the corrupted files are
    // carried by reference, untouched and unread
    val before = TableVersions.listing(spark, root).map(_._1).toSet
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("k").between(1200L, 1300L), Map("k" -> (1200.0, 1300.0))): @unchecked
    val after = TableVersions.listing(spark, root, Some(dv)).map(_._1).toSet
    assert((before -- after).size === 1, "only the candidate file rewritten")
    assert((after -- before).nonEmpty)
    val rewritten = (after -- before).toSeq
    assert(spark.read.parquet(rewritten: _*).filter(col("k").between(1200L, 1400L)).count() === 100)
  }

  test("partitioned table: values ride the commit; partition reads and maintenance touch only their files") {
    val root = newRoot()
    val df = (1L to 3000L).toDF("k")
      .withColumn("g", pmod(col("k"), lit(3)).cast("string"))
      .withColumn("v", col("k") * 2)
    TableVersions.append(spark, root, df.repartition(2), partitionBy = Seq("g"))
    val st = TableVersions.commitState(spark, root)
    assert(st.partCols === Seq("g"))
    assert(st.files.forall(_.part.contains("g")))
    // partition columns stay IN the data files (metadata partitioning)
    assert(TableVersions.read(spark, root).columns.contains("g"))
    assert(TableVersions.read(spark, root).count() === 3000)

    val p1 = TableVersions.readPartitions(spark, root, Map("g" -> "1"))
    assert(p1.count() === 1000)
    assert(p1.select("g").distinct().collect().map(_.getString(0)).toSeq === Seq("1"))
    val p1Files = st.files.filter(_.part("g") == "1").map(_.path).toSet
    assert(p1.inputFiles.forall(f => p1Files.exists(p => f.endsWith(new org.apache.hadoop.fs.Path(p).getName))))

    val parts = TableVersions.partitions(spark, root).collect()
    assert(parts.map(_.getString(0)).toSeq === Seq("0", "1", "2"))
    assert(parts.map(_.getLong(3)).sum === 3000)

    // appends inherit partitioning; restating different columns is rejected
    TableVersions.append(spark, root, df.filter(col("k") <= 10))
    assert(TableVersions.commitState(spark, root).files.forall(_.part.contains("g")))
    val e = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, df, partitionBy = Seq("v"))
    }
    assert(e.getMessage.contains("fixed at table creation"))

    // per-partition compaction: disjoint file sets — BOTH commit, even
    // run concurrently (the rebase rule), and other partitions' files
    // carry by reference
    val beforeC = TableVersions.listing(spark, root).map(_._1).toSet
    val fut = Future.traverse(Seq("0", "1"))(g =>
      Future(TableVersions.compact(spark, root, 8L << 20, partition = Map("g" -> g))))
    val results = Await.result(fut, 120.seconds)
    assert(results.forall(_.isDefined), s"disjoint-partition compactions must both commit: $results")
    val afterC = TableVersions.listing(spark, root).map(_._1).toSet
    val g2Files = TableVersions.commitState(spark, root).files.filter(_.part("g") == "2").map(_.path).toSet
    assert(g2Files.subsetOf(beforeC), "untouched partition carried by reference")
    assert(TableVersions.read(spark, root).count() === 3010)
    assert(afterC !== beforeC)
  }

  test("concurrent appends all commit exactly once (atomic claim-with-content promote)") {
    val root = newRoot()
    val fut = Future.traverse((0 until 4).toList)(i =>
      Future(TableVersions.append(spark, root,
        ((i * 1000L) until ((i + 1) * 1000L)).toDF("k").coalesce(1))))
    val versions = Await.result(fut, 120.seconds)
    assert(versions.toSet.size === 4, s"each append owns a distinct version: $versions")
    assert(TableVersions.read(spark, root).count() === 4000)
    assert(TableVersions.read(spark, root).agg(sum("k")).head().getLong(0) ===
      (0L until 4000L).sum)
  }

  test("schema evolution contract: drop and type-change are rejected loudly; add passes") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).map(i => (i, s"t$i")).toDF("k", "tag"))
    val dropped = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, (11L to 12L).toDF("k"))
    }
    assert(dropped.getMessage.contains("column 'tag' is missing from the append"))
    val retyped = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, (11L to 12L).map(i => (i.toInt, s"t$i")).toDF("k", "tag"))
    }
    assert(retyped.getMessage.contains("column 'k' changes type"))
    // rename = drop + add: rejected via the drop message
    val renamed = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, (11L to 12L).map(i => (i, s"t$i")).toDF("k", "label"))
    }
    assert(renamed.getMessage.contains("'tag' is missing"))
    // additive evolution still lands, and the commit schema grows
    TableVersions.append(spark, root,
      (11L to 12L).map(i => (i, s"t$i", i * 1.5)).toDF("k", "tag", "w"))
    assert(TableVersions.commitState(spark, root).schema.get.fieldNames.toSeq ===
      Seq("k", "tag", "w"))
    assert(TableVersions.read(spark, root).filter(col("w").isNull).count() === 10)
  }

  test("change feed: appends emit inserts, upsert emits delete+insert, compaction emits nothing") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root,
      (1L to 100L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    val v1 = TableVersions.append(spark, root,
      (101L to 150L).map(i => (i, i * 10)).toDF("k", "v").coalesce(1))
    // opt the upsert's rewrite staging out of the optimized write so the
    // table still holds >1 small file — the point here is that the
    // compaction STEP emits no changes, so there must be one to run
    spark.conf.set("graft.table.optimizeWrite", "false")
    val Some(v2) =
      try TableVersions.upsert(spark, root,
        Seq((50L, -1L), (999L, -2L)).toDF("k", "v"), "k")
      finally spark.conf.unset("graft.table.optimizeWrite"): @unchecked
    val Some(v3) = TableVersions.compact(spark, root, 8L << 20): @unchecked

    val cdf = TableVersions.readChanges(spark, root, fromExclusive = -1L, to = v3)
    assert(cdf.columns.toSeq ===
      Seq("k", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val byStep = cdf.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byStep((v0, "insert")) === 100)
    assert(byStep((v1, "insert")) === 50)
    assert(byStep((v2, "insert")) === 2, "replaced row's new image + fresh insert")
    assert(byStep((v2, "delete")) === 1, "replaced row's old image")
    assert(!byStep.keySet.exists(_._1 == v3), "pure layout rewrite emits no changes")
    val upd = cdf.filter(col("_commit_version") === v2 && col("_change_type") === "insert")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(upd.toSeq === Seq((50L, -1L), (999L, -2L)))
    assert(cdf.filter(col("_commit_version") === v2 && col("_change_type") === "delete")
      .head().getLong(1) === 500L)
    // incremental tail read: only the steps after v1
    val tail = TableVersions.readChanges(spark, root, fromExclusive = v1, to = v3)
    assert(tail.count() === 3)
    // empty range is an empty frame in CDF shape
    assert(TableVersions.readChanges(spark, root, v3, v3).count() === 0)
  }

  test("bloom sidecar: incremental maintenance; point lookups open only admitted files") {
    val root = newRoot()
    (0 until 3).foreach(i => TableVersions.append(spark, root,
      ((i * 1000L) until ((i + 1) * 1000L)).toDF("k").coalesce(1)))
    assert(TableVersions.maintainBloomIndex(spark, root, "k", 2000) === 3)
    assert(TableVersions.maintainBloomIndex(spark, root, "k", 2000) === 0, "up to date: no rescan")
    val hit = TableVersions.bloomPointLookup(spark, root, "k", lit(1500L))
    assert(hit.collect().map(_.getLong(0)).toSeq === Seq(1500L))
    assert(hit.inputFiles.length < 3, "bloom must prune non-admitting files")
    // a new append leaves existing entries untouched: only the new file scans
    TableVersions.append(spark, root, (3000L until 3100L).toDF("k").coalesce(1))
    assert(TableVersions.maintainBloomIndex(spark, root, "k", 2000) === 1)
    assert(TableVersions.bloomPointLookup(spark, root, "k", lit(3050L)).count() === 1)
    // files not yet indexed stay candidates (conservative), never missed
    TableVersions.append(spark, root, (5000L until 5010L).toDF("k").coalesce(1))
    assert(TableVersions.bloomPointLookup(spark, root, "k", lit(5005L)).count() === 1)
  }

  test("partitioned maintenance keeps partition metadata exact: whole-table compact, cross-partition delete/upsert, scoped zorder") {
    val root = newRoot()
    val df = (1L to 3000L).toDF("k")
      .withColumn("g", pmod(col("k"), lit(3)).cast("string"))
      .withColumn("v", col("k") * 2)
    (0 until 3).foreach(i => TableVersions.append(spark, root,
      df.filter(col("k").between(i * 500L + 1, (i + 1) * 500L)), partitionBy = Seq("g")))
    // whole-table compact of a partitioned table: bins must never span
    // partition tuples, so every file keeps a single exact tuple
    val Some(_) = TableVersions.compact(spark, root, 8L << 20): @unchecked
    val st = TableVersions.commitState(spark, root)
    assert(st.files.forall(_.part.contains("g")), "every compacted file keeps its partition tuple")
    // cross-partition delete: survivors restage WITH their tuples
    val Some(_) = TableVersions.deleteWhere(spark, root, col("k") > 500L): @unchecked
    val perPart = (0 to 2).map(g =>
      TableVersions.readPartitions(spark, root, Map("g" -> g.toString)).count())
    assert(perPart.sum === TableVersions.read(spark, root).count(),
      "partition reads must cover the whole table after cross-partition maintenance")
    // cross-partition upsert: updated rows land with their partition values
    val ups = Seq((2L, "2", -1L), (3L, "0", -2L), (5000L, "2", 1L)).toDF("k", "g", "v")
    val Some(_) = TableVersions.upsert(spark, root, ups, "k"): @unchecked
    val st2 = TableVersions.commitState(spark, root)
    assert(st2.files.forall(_.part.contains("g")))
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "2"))
      .filter(col("k") === 5000L).count() === 1, "inserted row visible through its partition")
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "0"))
      .filter(col("k") === 3L).head().getLong(2) === -2L, "updated row visible through its partition")
    // zorder: must be partition-scoped on a partitioned table
    val e = intercept[IllegalArgumentException] {
      TableVersions.optimizeZOrder(spark, root, Seq("k"), 4)
    }
    assert(e.getMessage.contains("scoped to one partition"))
    val Some(_) = TableVersions.optimizeZOrder(spark, root, Seq("k"), 2,
      partition = Map("g" -> "1")): @unchecked
    assert(TableVersions.commitState(spark, root).files.forall(_.part.contains("g")))
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "1")).count() === perPart(1))
  }

  test("commit codec survives hostile partition values: spaces, separators, unicode round-trip") {
    val root = newRoot()
    // no non-ASCII value: this box's JVM locale (sun.jnu.encoding=ASCII)
    // cannot create such paths at all — Spark's own writer fails before
    // any graft code runs; the codec itself is charset-agnostic
    // (URL-encoded UTF-8 both ways)
    val vals = Seq("a b", "x=y", "u;|~#", "100%")
    val df = vals.zipWithIndex.flatMap { case (g, i) =>
      (0 until 10).map(j => (i * 10L + j, g)) }.toDF("k", "g")
    TableVersions.append(spark, root, df.coalesce(2), partitionBy = Seq("g"))
    val st = TableVersions.commitState(spark, root)
    assert(st.files.map(_.part("g")).toSet === vals.toSet,
      s"partition values must round-trip through dir escaping + the commit codec: ${st.files.map(_.part)}")
    vals.foreach { g =>
      val p = TableVersions.readPartitions(spark, root, Map("g" -> g))
      assert(p.count() === 10, s"partition '$g' must read back")
      assert(p.select("g").distinct().head().getString(0) === g)
    }
    // a second append + a delete keep the hostile values intact
    TableVersions.append(spark, root, df.filter(col("k") < 5))
    TableVersions.deleteWhere(spark, root, col("k") === 0L)
    val st2 = TableVersions.commitState(spark, root)
    assert(st2.files.map(_.part("g")).toSet === vals.toSet)
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "x=y")).count() === 10)
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "a b")).count() === 13,
      "second append (+5 dup rows) and the k=0 delete (-2: both copies) land in 'a b'")
  }

  test("append racing a compact: both commit (appends rebase; the compact rebases through the append)") {
    val root = newRoot()
    (0 until 6).foreach(i => TableVersions.append(spark, root,
      ((i * 100L) until ((i + 1) * 100L)).toDF("k").coalesce(1)))
    val fut = Future.sequence(Seq(
      Future(Right(TableVersions.append(spark, root, (600L until 700L).toDF("k").coalesce(1)))),
      Future(Left(TableVersions.compact(spark, root, 8L << 20)))))
    val results = Await.result(fut, 120.seconds)
    val appended = results.collectFirst { case Right(v) => v }.get
    val compacted = results.collectFirst { case Left(o) => o }.get
    assert(compacted.isDefined, "compact must rebase through a concurrent append, not abort")
    assert(appended >= 6L)
    assert(TableVersions.read(spark, root).count() === 700)
    assert(TableVersions.read(spark, root).agg(sum("k")).head().getLong(0) === (0L until 700L).sum)
  }

  test("restore rolls back by committing forward; shallow clone shares files then diverges") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(1))
    TableVersions.appendTxn(spark, root, (101L to 150L).toDF("k").coalesce(1), "s", 7L)
    val Some(dv) = TableVersions.deleteWhere(spark, root, col("k") <= 50L): @unchecked
    assert(TableVersions.read(spark, root).count() === 100)
    // restore to v0: data back, history intact, txn watermark carried
    val Some(rv) = TableVersions.restore(spark, root, v0): @unchecked
    assert(rv > dv)
    assert(TableVersions.read(spark, root).count() === 100)
    assert(TableVersions.read(spark, root).agg(min("k")).head().getLong(0) === 1L)
    assert(TableVersions.read(spark, root, Some(dv)).count() === 100,
      "pre-restore history stays readable")
    assert(TableVersions.lastTxn(spark, root, "s") === Some(7L),
      "txn watermark survives the restore — replays still skip")
    TableVersions.appendTxn(spark, root, (101L to 150L).toDF("k"), "s", 7L) // replay: no-op
    assert(TableVersions.read(spark, root).count() === 100)

    // shallow clone: zero data copied, then independent evolution
    val dest = newRoot()
    TableVersions.shallowClone(spark, root, dest)
    assert(TableVersions.read(spark, dest).count() === 100)
    assert(TableVersions.listing(spark, dest).map(_._1).toSet ===
      TableVersions.listing(spark, root).map(_._1).toSet, "clone references the source's files")
    TableVersions.append(spark, dest, (1000L to 1009L).toDF("k"))
    assert(TableVersions.read(spark, dest).count() === 110)
    assert(TableVersions.read(spark, root).count() === 100, "source unaffected by clone writes")
    intercept[IllegalArgumentException] {
      TableVersions.shallowClone(spark, root, dest)
    }
  }

  test("CHECK constraints: enforced on append and upsert, validated against existing data, droppable") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq((1L, 50L), (2L, 80L)).toDF("k", "v").coalesce(1))
    // a constraint the table already violates is rejected up front
    val pre = intercept[IllegalArgumentException] {
      TableVersions.addConstraint(spark, root, "v_small", "v < 60")
    }
    assert(pre.getMessage.contains("existing table data violates CHECK constraint 'v_small'"))
    TableVersions.addConstraint(spark, root, "v_pos", "v > 0")
    TableVersions.addConstraint(spark, root, "k_not_null", "k IS NOT NULL")
    assert(TableVersions.commitState(spark, root).checks.keySet === Set("v_pos", "k_not_null"))
    // violating append rejected with the constraint named; no commit lands
    val vBefore = TableVersions.currentVersion(spark, root)
    val bad = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, Seq((3L, -5L)).toDF("k", "v"))
    }
    assert(bad.getMessage.contains("CHECK constraint 'v_pos'"))
    assert(TableVersions.currentVersion(spark, root) === vBefore)
    // NULL-evaluating checks pass (SQL CHECK semantics)...
    TableVersions.append(spark, root,
      Seq((3L, Option.empty[Long])).toDF("k", "v").coalesce(1))
    // ...NOT NULL expressed as IS NOT NULL does not
    val nn = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, Seq((Option.empty[Long], 5L)).toDF("k", "v"))
    }
    assert(nn.getMessage.contains("'k_not_null'"))
    // upsert batches are validated too
    val up = intercept[IllegalArgumentException] {
      TableVersions.upsert(spark, root, Seq((1L, -9L)).toDF("k", "v"), "k")
    }
    assert(up.getMessage.contains("'v_pos'"))
    // dropping the constraint lets the write through
    TableVersions.dropConstraint(spark, root, "v_pos")
    val Some(_) = TableVersions.upsert(spark, root, Seq((1L, -9L)).toDF("k", "v"), "k"): @unchecked
    assert(TableVersions.read(spark, root).filter(col("k") === 1L).head().getLong(1) === -9L)
  }

  test("time travel by timestamp: readAsOf resolves the version current at that instant") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root, (1L to 10L).toDF("k"))
    val v1 = TableVersions.append(spark, root, (11L to 20L).toDF("k"))
    // pin deterministic commit instants through the commit's own `#TS`
    // line — since round 14 the IN-COMMIT timestamp is the resolution
    // authority (file mtimes only serve legacy stamp-less commits)
    val fs = hfs(root)
    def stamp(v: Long, t: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(root, s"_versions/v$v.commit")
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val out = fs.create(p, true)
      try out.write(txt.split("\n").map(l =>
        if (l.startsWith("#TS ")) s"#TS $t" else l).mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.setTimes(p, t, -1)
    }
    stamp(v0, 1000000L); stamp(v1, 2000000L)
    TableVersions.clearStateCache()
    assert(TableVersions.versionAsOf(spark, root, 999999L).isEmpty)
    assert(TableVersions.versionAsOf(spark, root, 1500000L) === Some(v0))
    assert(TableVersions.readAsOf(spark, root, 1500000L).count() === 10)
    assert(TableVersions.versionAsOf(spark, root, 3000000L) === Some(v1))
    assert(TableVersions.readAsOf(spark, root, 2000000L).count() === 20)
    intercept[IllegalArgumentException] {
      TableVersions.readAsOf(spark, root, 5L)
    }
  }

  test("deleteWhere uses SQL three-valued logic: NULL-evaluating rows survive") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None))
        .toDF("k", "v").coalesce(1))
    TableVersions.deleteWhere(spark, root, col("v") > 5L)
    val left = TableVersions.read(spark, root).orderBy("k").collect().map(_.getLong(0))
    assert(left.toSeq === Seq(2L, 4L), "rows where the predicate is NULL are NOT deleted")
  }

  test("upsert with a string key falls back to all-file candidates — the batch is never dropped") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "v").coalesce(1))
    val Some(_) = TableVersions.upsert(spark, root,
      Seq(("b", -2L), ("d", 4L)).toDF("id", "v"), "id"): @unchecked
    val t = TableVersions.read(spark, root).orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(t.toSeq === Seq(("a", 1L), ("b", -2L), ("c", 3L), ("d", 4L)))
    // and an empty batch is a no-op that does not bump the version
    val v = TableVersions.currentVersion(spark, root)
    assert(TableVersions.upsert(spark, root,
      Seq.empty[(String, Long)].toDF("id", "v"), "id") === v)
  }
}
