package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Round-11 commit-log contracts: commits are O(delta) — bytes scale
  * with the batch, never the table — checkpoints + delta tails
  * reconstruct every retained version bit-for-bit (mixed-era logs
  * included), vacuum checkpoints the oldest retained version before
  * dropping the chain below it and sweeps old commits/checkpoints, and
  * semantics-changing features (deltas, deletion vectors) bump the
  * format major so a legacy reader refuses rather than misreads.
  */
class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("cl11").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitText(root: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(root, s"_versions/$name")
    val f = hfs(root)
    val in = f.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def commitLen(root: String, name: String): Long =
    hfs(root).getFileStatus(new org.apache.hadoop.fs.Path(root, s"_versions/$name")).getLen

  test("commit bytes scale with the batch, not the table") {
    val root = newRoot()
    // a 40-file table...
    TableVersions.append(spark, root, (1L to 4000L).toDF("k").repartition(40))
    assert(TableVersions.commitState(spark, root).files.size === 40)
    assert(commitText(root, "v0.commit").startsWith("#FORMAT 3\n"),
      "relative stored paths are a major-3 feature — a pre-relative reader must refuse")
    // ...then a 1-file streaming append: the commit must reference ONE
    // file, not 41
    TableVersions.appendTxn(spark, root, Seq(9001L).toDF("k").coalesce(1), "stream", 7L)
    val t1 = commitText(root, "v1.commit")
    assert(t1.startsWith("#FORMAT 3\n"),
      "a delta adding relative paths carries major 3 (deltas alone are major 2)")
    assert(t1.contains("\n#BASE 0\n"))
    assert(t1.contains("#TXN stream 7"))
    val addLines = t1.split("\n").filter(l => l.nonEmpty && !l.startsWith("#"))
    assert(addLines.length === 1, s"delta must carry only the batch's files:\n$t1")
    assert(t1.trim.endsWith("#END 1"))
    assert(commitLen(root, "v1.commit") < commitLen(root, "v0.commit") / 5,
      "O(delta) metadata: the append's commit is a fraction of the full listing")
    // the reconstructed state serves reads, txn records, and stats
    assert(TableVersions.read(spark, root).count() === 4001)
    assert(TableVersions.lastTxn(spark, root, "stream") === Some(7L))
    assert(TableVersions.commitState(spark, root).files.size === 41)
    // a replayed txn batch is still a no-op through the delta chain
    TableVersions.appendTxn(spark, root, Seq(9002L).toDF("k"), "stream", 7L)
    assert(TableVersions.read(spark, root).count() === 4001)
  }

  test("mixed-era log: checkpoint + delta tail reconstructs every version bit-for-bit") {
    val root = newRoot()
    val prev = spark.conf.getOption("graft.table.checkpointInterval")
    spark.conf.set("graft.table.checkpointInterval", "3")
    try {
      val expected = scala.collection.mutable.Map.empty[Long, Array[org.apache.spark.sql.Row]]
      def snap(v: Long): Unit =
        expected(v) = TableVersions.read(spark, root, Some(v)).orderBy("k").collect()
      // v0: full (first append); v1, v2: deltas; v3: delta + auto checkpoint;
      // v4: DV delete (DV delta); v5: metadata-only (constraint, full
      // fallback); v6: delta + checkpoint — a genuinely mixed-era log
      snap(TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(1)))
      snap(TableVersions.append(spark, root, (101L to 200L).toDF("k").coalesce(1)))
      snap(TableVersions.appendTxn(spark, root, (201L to 300L).toDF("k").coalesce(1), "etl", 1L))
      snap(TableVersions.append(spark, root, (301L to 400L).toDF("k").coalesce(1)))
      val Some(v4) = TableVersions.deleteWhere(spark, root,
        col("k").isin(5L, 150L, 250L), maxDvFraction = 0.1): @unchecked
      snap(v4)
      snap(TableVersions.addConstraint(spark, root, "k_pos", "k > 0"))
      snap(TableVersions.append(spark, root, (401L to 500L).toDF("k").coalesce(1)))
      val f = hfs(root)
      assert(f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v3.checkpoint")))
      assert(f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v6.checkpoint")))
      val ptr = commitText(root, "_last_checkpoint").trim
      assert(ptr === "6", s"_last_checkpoint hint must track the newest checkpoint, got $ptr")
      // relative-path checkpoint carries major 3 (and would carry 2 for
      // its DVs even without them — majors track semantics)
      assert(commitText(root, "v6.checkpoint").startsWith("#FORMAT 3\n"))
      // fresh reconstruction (cache dropped) of EVERY retained version
      // equals the state captured when it was current
      TableVersions.clearStateCache()
      expected.toSeq.sortBy(_._1).foreach { case (v, rows) =>
        assert(TableVersions.read(spark, root, Some(v)).orderBy("k").collect() === rows,
          s"version $v reconstructed from checkpoint+tail")
      }
      // checkpoint shortcut and pure chain walk agree field-for-field
      val viaCkpt = TableVersions.commitState(spark, root)
      f.delete(new org.apache.hadoop.fs.Path(root, "_versions/v6.checkpoint"), false)
      f.delete(new org.apache.hadoop.fs.Path(root, "_versions/v3.checkpoint"), false)
      TableVersions.clearStateCache()
      val viaChain = TableVersions.commitState(spark, root)
      assert(viaCkpt === viaChain,
        "checkpoint-reconstructed state must bit-equal the full chain replay")
      // inherited metadata flows through deltas: the constraint from v5
      // still gates appends committed as deltas after it
      val ex = intercept[IllegalArgumentException] {
        TableVersions.append(spark, root, Seq(-1L).toDF("k"))
      }
      assert(ex.getMessage.contains("k_pos"))
      assert(TableVersions.lastTxn(spark, root, "etl") === Some(1L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("graft.table.checkpointInterval", p)
        case None => spark.conf.unset("graft.table.checkpointInterval")
      }
    }
  }

  test("vacuum checkpoints the oldest retained version, then drops old commits and checkpoints") {
    val root = newRoot()
    val vs = (0 until 6).map { i =>
      TableVersions.append(spark, root,
        ((i * 10L) until ((i + 1) * 10L)).toDF("k").coalesce(1))
    }
    val f = hfs(root)
    // default interval 10: no checkpoint yet; v4 is a delta commit
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v4.checkpoint")))
    assert(commitText(root, "v4.commit").contains("#BASE 3"))
    TableVersions.vacuum(spark, root, keepVersions = 2) // retains v4, v5
    // the chain below v4 is gone — vacuum must have left a full state
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v4.checkpoint")),
      "vacuum writes a checkpoint for a delta-commit horizon before dropping its chain")
    (0 to 3).foreach { v =>
      assert(!f.exists(new org.apache.hadoop.fs.Path(root, s"_versions/v$v.commit")),
        s"commits older than retained history are swept (v$v)")
    }
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, root, Some(4L)).count() === 50)
    assert(TableVersions.read(spark, root).count() === 60)
    val tail = TableVersions.readChanges(spark, root, 4L, 5L)
    assert(tail.count() === 10)
    // past the horizon still throws (the round-10 guard, unchanged)
    intercept[IllegalStateException] {
      TableVersions.readChanges(spark, root, 2L, 5L).count()
    }
    // a later vacuum sweeps superseded checkpoints too
    val v6 = TableVersions.append(spark, root, (60L to 69L).toDF("k").coalesce(1))
    val v7 = TableVersions.append(spark, root, (70L to 79L).toDF("k").coalesce(1))
    TableVersions.vacuum(spark, root, keepVersions = 2) // retains v6, v7
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v4.checkpoint")),
      "checkpoints below retained history are swept")
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v6.checkpoint")))
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, root).count() === 80)
    assert(v6 === 6L && v7 === 7L)
  }

  test("history records the operation that produced each commit") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 200L).toDF("k").withColumn("v", col("k")))
    TableVersions.appendTxn(spark, root, (201L to 210L).toDF("k")
      .withColumn("v", col("k")).coalesce(1), "etl", 3L)
    TableVersions.deleteWhere(spark, root, col("k").isin(5L), maxDvFraction = 0.1)
    TableVersions.renameColumn(spark, root, "v", "w")
    TableVersions.addConstraint(spark, root, "k_pos", "k > 0")
    TableVersions.compact(spark, root, targetBytes = 1L << 30)
    val ops = TableVersions.history(spark, root)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(0L) === "APPEND")
    assert(ops(1L) === "APPEND txn=etl/3")
    assert(ops(2L) === "DELETE dv")
    assert(ops(3L) === "RENAME COLUMN v -> w")
    assert(ops(4L) === "ADD CONSTRAINT k_pos")
    assert(ops(5L) === "COMPACT")
  }

  test("vacuum with a torn claim at the horizon still checkpoints crossing deltas") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 10L).toDF("k").coalesce(1))
    TableVersions.append(spark, root, (11L to 20L).toDF("k").coalesce(1))
    // a legacy torn claim burns v2: the next append bases on v1, so the
    // OLDEST retained version (torn v2) is not the one whose chain
    // crosses the horizon — v3 is
    val f = hfs(root)
    val out = f.create(new org.apache.hadoop.fs.Path(root, "_versions/v2.commit"), true)
    try out.write("crashed-mid-write no END\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    TableVersions.append(spark, root, (21L to 30L).toDF("k").coalesce(1))
    assert(commitText(root, "v3.commit").contains("#BASE 1"))
    TableVersions.vacuum(spark, root, keepVersions = 2) // keepFrom = 2 (torn), retains v3
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v3.checkpoint")),
      "a retained delta whose base precedes the horizon must be checkpointed")
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v0.commit")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_versions/v1.commit")))
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, root).count() === 30)
  }

  test("randomized op sequences: every version reconstructs identically via cache, chain, and checkpoint") {
    val root = newRoot()
    val prev = spark.conf.getOption("graft.table.checkpointInterval")
    spark.conf.set("graft.table.checkpointInterval", "4")
    try {
      val rnd = new scala.util.Random(20260815L)
      var nextKey = 0L
      def batch(n: Int) = {
        val start = nextKey; nextKey += n
        (start until nextKey).map(k => (k, k * 3)).toDF("k", "v").coalesce(1 + rnd.nextInt(2))
      }
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[org.apache.spark.sql.Row])]
      def snap(): Unit = {
        val ver = TableVersions.currentVersion(spark, root).get
        expected += ver -> TableVersions.read(spark, root).orderBy("k", "v").collect()
      }
      TableVersions.append(spark, root, batch(50)); snap()
      (0 until 14).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 => TableVersions.append(spark, root, batch(10 + rnd.nextInt(40)))
          case 1 => // DV delete of a few existing keys
            val ks = Seq.fill(3)(rnd.between(0L, nextKey)).distinct
            TableVersions.deleteWhere(spark, root, col("k").isin(ks: _*), maxDvFraction = 0.5)
          case 2 => // upsert (DV when small enough, rewrite otherwise)
            val ks = Seq.fill(4)(rnd.between(0L, nextKey + 5)).distinct
            TableVersions.upsert(spark, root, ks.map(k => (k, -k)).toDF("k", "v"), "k",
              maxDvFraction = if (rnd.nextBoolean()) 0.5 else 0.0)
          case 3 => TableVersions.compact(spark, root, targetBytes = 1L << 30)
          case 4 => // rewrite delete of a range
            val lo = rnd.between(0L, nextKey)
            TableVersions.deleteWhere(spark, root, col("k").between(lo, lo + 10),
              bounds = Map("k" -> (lo.toDouble, lo.toDouble + 10)))
          case 5 => // metadata-only / restore flavors
            if (rnd.nextBoolean()) {
              TableVersions.addConstraint(spark, root, s"c$nextKey", "k IS NOT NULL")
            } else {
              val cur = TableVersions.currentVersion(spark, root).get
              if (cur > 1) TableVersions.restore(spark, root, cur - 1)
            }
        }
        snap()
      }
      // restore may have made later snapshots stale for the SAME version
      // number never happens (each op commits a NEW version); dedupe all
      // snapshots by version keeping the FIRST (the state as committed)
      val byVersion = expected.groupBy(_._1).map { case (v, s) => v -> s.head._2 }
      // 1. cached reads agree
      byVersion.foreach { case (v, rows) =>
        assert(TableVersions.read(spark, root, Some(v)).orderBy("k", "v").collect() === rows,
          s"cached read of v$v")
      }
      // 2. cold chain reads agree (cache dropped)
      TableVersions.clearStateCache()
      byVersion.toSeq.sortBy(_._1).foreach { case (v, rows) =>
        assert(TableVersions.read(spark, root, Some(v)).orderBy("k", "v").collect() === rows,
          s"cold read of v$v")
      }
      // 3. pure chain replay (checkpoints deleted) agrees field-for-field
      val f = hfs(root)
      val latest = TableVersions.currentVersion(spark, root).get
      val withCkpt = TableVersions.commitState(spark, root, Some(latest))
      f.listStatus(new org.apache.hadoop.fs.Path(root, "_versions")).toSeq
        .map(_.getPath).filter(_.getName.endsWith(".checkpoint"))
        .foreach(p => f.delete(p, false))
      TableVersions.clearStateCache()
      assert(TableVersions.commitState(spark, root, Some(latest)) === withCkpt)
      byVersion.foreach { case (v, rows) =>
        assert(TableVersions.read(spark, root, Some(v)).orderBy("k", "v").collect() === rows,
          s"chain-only read of v$v")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("graft.table.checkpointInterval", p)
        case None => spark.conf.unset("graft.table.checkpointInterval")
      }
    }
  }

  test("partitioned tables: partition metadata and pruning survive the delta codec") {
    val root = newRoot()
    val groups = Seq("a", "b", "c", "d")
    val df1 = groups.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("k", "g")
    val df2 = groups.zipWithIndex.map { case (g, i) => (10L + i, g) }.toDF("k", "g")
    TableVersions.append(spark, root, df1, partitionBy = Seq("g"))
    TableVersions.append(spark, root, df2) // delta commit with partition values
    assert(commitText(root, "v1.commit").contains("#BASE 0"))
    TableVersions.clearStateCache()
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "a"))
      .select("k").collect().map(_.getLong(0)).toSet === Set(0L, 10L))
    val parts = TableVersions.partitions(spark, root)
      .select("partition", "n_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
    // replacePartitions of ONE hot date out of many commits as a delta
    // (the incremental-materialization shape: 2 removes + 1 add against
    // 8 live files)
    TableVersions.replacePartitions(spark, root, Seq((9L, "a")).toDF("k", "g"))
    val t2 = commitText(root, "v2.commit")
    assert(t2.contains("#BASE 1") && t2.contains("#RM "), s"replace must delta-commit:\n$t2")
    TableVersions.clearStateCache()
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "a"))
      .select("k").collect().map(_.getLong(0)).toSet === Set(9L))
    assert(TableVersions.read(spark, root).count() === 7)
  }

  test("table-features matrix: commits name their features; a reader missing ONE feature " +
      "refuses naming exactly it; legacy feature-less commits read unchanged") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 20L).toDF("k"))
    TableVersions.appendTxn(spark, root, Seq(21L).toDF("k"), "s", 0L) // delta
    TableVersions.deleteWhere(spark, root, col("k") === 3L) // DV or rewrite

    // writers STAMP the features each commit actually uses
    val t0 = commitText(root, "v0.commit")
    assert(t0.contains("#FEATURES ") && t0.contains("relativePaths"),
      s"full commit with relative paths must name the feature:\n${t0.take(200)}")
    val t1 = commitText(root, "v1.commit")
    assert(t1.split("\n").exists(l => l.startsWith("#FEATURES ") && l.contains("delta")),
      "an incremental commit must name the delta feature")

    // LEGACY: a commit with no #FEATURES line (pre-features era) reads
    // unchanged under its major
    val f = hfs(root)
    val legacy = t0.split("\n").filterNot(_.startsWith("#FEATURES"))
      .mkString("", "\n", "\n")
    val p0 = new org.apache.hadoop.fs.Path(root, "_versions/v0.commit")
    val out0 = f.create(p0, true)
    try out0.write(legacy.getBytes(StandardCharsets.UTF_8)) finally out0.close()
    TableVersions.clearStateCache()
    assert(TableVersions.read(spark, root, Some(0L)).count() === 20L,
      "feature-less legacy commits must read exactly as before")

    // a reader MISSING one feature refuses, naming exactly that feature
    // (not the supported ones riding along)
    val withUnknown = legacy.replaceFirst("\n",
      "\n#FEATURES relativePaths,frobnication,delta\n")
    val out1 = f.create(p0, true)
    try out1.write(withUnknown.getBytes(StandardCharsets.UTF_8)) finally out1.close()
    TableVersions.clearStateCache()
    val e = intercept[IllegalStateException] {
      TableVersions.read(spark, root, Some(0L)).count()
    }
    assert(e.getMessage.contains("[frobnication]"),
      s"refusal must name EXACTLY the missing feature: ${e.getMessage}")
  }
}
