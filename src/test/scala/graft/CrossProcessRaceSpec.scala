package graft

import java.nio.file.Files

import graft.operators.TableVersions

/** CROSS-PROCESS commit races: two SEPARATE JVMs — each with its own
  * SparkSession, state cache, and claim attempts — write the same
  * table root concurrently (appends racing appends racing
  * compactions). At 100 TB the writers ARE separate jobs; in-process
  * race specs (CommitLogSpec, Round8TableSpec) cannot see a broken
  * claim that only a second process would expose. The contract pinned
  * here: every version number is claimed by exactly one writer, no
  * version is ever torn-visible, losers rebase or abort (never
  * overwrite), and no committed row is lost or duplicated.
  */
class CrossProcessRaceSpec extends SparkSpec {
  import spark.implicits._

  // the forked second JVM needs the same JDK17 module opens Spark needs
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs racing appends+compactions: unique claims, no torn version, no lost rows") {
    val root = Files.createTempDirectory("xrace").toString + "/tbl"
    // seed so both writers inherit one schema
    TableVersions.append(spark, root, Seq(("seed-0", "seed")).toDF("id", "writer"))

    val nBatches = 6
    val rowsPer = 40
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.RaceWriterMain", root, "ext", nBatches.toString, rowsPer.toString))
    val logFile = Files.createTempFile("xrace", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(logFile)
    val proc = pb.start()

    // the HOST writes concurrently through its own session
    (0 until nBatches).foreach { i =>
      val df = (0 until rowsPer).map(j => (s"host-$i-$j", "host")).toDF("id", "writer").coalesce(1)
      TableVersions.append(spark, root, df)
      if (i % 3 == 1) { TableVersions.compact(spark, root, 8L << 20); () }
    }
    val exited = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    val tail = scala.io.Source.fromFile(logFile)
    val log = try tail.mkString finally tail.close()
    assert(exited && proc.exitValue() === 0,
      s"external writer failed (exit ${if (exited) proc.exitValue() else "timeout"}):\n" +
        log.takeRight(3000))
    assert(log.contains("RACE_WRITER_DONE ext"))

    // no lost and no duplicated rows, across every writer
    TableVersions.clearStateCache()
    val rows = TableVersions.read(spark, root).as[(String, String)].collect()
    assert(rows.length === 1 + 2 * nBatches * rowsPer,
      s"expected every committed batch exactly once, got ${rows.length}")
    assert(rows.map(_._1).distinct.length === rows.length, "no id may appear twice")
    assert(rows.count(_._2 == "ext") === nBatches * rowsPer)
    assert(rows.count(_._2 == "host") === nBatches * rowsPer)

    // every claimed version is whole (readable, never torn) and the
    // numbering is contiguous — one claim per name, no overwrites
    val latest = TableVersions.currentVersion(spark, root).get
    (0L to latest).foreach { v =>
      val st = TableVersions.commitState(spark, root, Some(v))
      assert(st.files.nonEmpty || v === 0L, s"v$v must reconstruct whole")
    }
    assert(TableVersions.history(spark, root).count() === latest + 1,
      "history must list exactly one commit per claimed version")
    // compactions may have rebased or aborted, but the final row set is
    // what the appends committed — rewrites never change content
    assert(TableVersions.read(spark, root).groupBy("writer").count().count() === 3)
  }

  test("cross-process: DV deletes racing an external compacting appender never resurrect") {
    val root = Files.createTempDirectory("xrace2").toString + "/tbl"
    TableVersions.append(spark, root,
      (0 until 100).map(i => (s"s-$i", "seed")).toDF("id", "writer").repartition(2))

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val logFile = Files.createTempFile("xrace2", ".log").toFile
    val proc = new ProcessBuilder((Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.RaceWriterMain", root, "ext", "4", "30")): _*)
      .redirectErrorStream(true).redirectOutput(logFile).start()

    // the HOST deletes seed rows in small DV-sized batches, retrying
    // when an external compaction rewrote the candidate files (the
    // conflict rule returns None — losers retry, never clobber)
    import org.apache.spark.sql.functions.col
    (0 until 5).foreach { b =>
      val ids = (b * 10 until b * 10 + 10).map(i => s"s-$i")
      var attempts = 0
      var done = false
      while (!done && attempts < 50) {
        done = TableVersions.deleteWhere(spark, root,
          col("id").isin(ids: _*), maxDvFraction = 0.5).isDefined
        attempts += 1
      }
      assert(done, s"delete batch $b must eventually commit past the race")
    }
    assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      proc.exitValue() === 0, {
      val src = scala.io.Source.fromFile(logFile)
      try s"external writer failed:\n${src.mkString.takeRight(2000)}" finally src.close()
    })

    TableVersions.clearStateCache()
    val rows = TableVersions.read(spark, root).as[(String, String)].collect()
    val deleted = (0 until 50).map(i => s"s-$i").toSet
    assert(rows.length === 50 + 4 * 30, s"got ${rows.length}")
    assert(!rows.exists(r => deleted(r._1)),
      "no tombstoned row may resurrect through a racing compaction")
    assert(rows.count(_._2 == "seed") === 50 && rows.count(_._2 == "ext") === 120)
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("cross-process: the administrative-writer claim makes concurrent vacuums mutually safe") {
    val root = Files.createTempDirectory("xvac").toString + "/tbl"
    (0 until 6).foreach(i => TableVersions.append(spark, root,
      (0 until 20).map(j => (s"b$i-$j", "host")).toDF("id", "writer").coalesce(1)))

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def forkVacuum(keep: Int, graceMs: Long): (Boolean, String) = {
      val logFile = Files.createTempFile("xvac", ".log").toFile
      val proc = new ProcessBuilder((Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.RaceWriterMain", root, "vacuum", keep.toString, graceMs.toString)): _*)
        .redirectErrorStream(true).redirectOutput(logFile).start()
      val ok = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
        proc.exitValue() === 0
      val src = scala.io.Source.fromFile(logFile)
      val log = try src.mkString finally src.close()
      (ok, log)
    }

    // 1) while THIS process holds the admin role, a second JVM's vacuum
    //    must refuse loudly and delete NOTHING
    val before = TableVersions.currentVersion(spark, root).get
    val admin = TableVersions.claimAdmin(spark, root, "vacuum")
    try {
      val (ok, log) = forkVacuum(keep = 2, graceMs = 0L)
      assert(ok, s"forked vacuum JVM crashed:\n${log.takeRight(2000)}")
      assert(log.contains("VACUUM_REFUSED"),
        s"a concurrent vacuum must refuse while the role is held:\n${log.takeRight(2000)}")
      // nothing deleted: every version still reconstructs
      (0L to before).foreach(v =>
        assert(TableVersions.commitState(spark, root, Some(v)).files.nonEmpty))
    } finally admin.release(spark, root)

    // 2) role released: the forked vacuum proceeds while the host keeps
    //    APPENDING — the orphan grace plus the claim keep every
    //    retained and in-flight file alive
    val appender = new Thread(() => (0 until 4).foreach { i =>
      TableVersions.append(spark, root,
        (0 until 20).map(j => (s"live$i-$j", "live")).toDF("id", "writer").coalesce(1))
    })
    appender.start()
    val (ok2, log2) = forkVacuum(keep = 2, graceMs = 10 * 60 * 1000L)
    appender.join()
    assert(ok2, s"forked vacuum JVM crashed:\n${log2.takeRight(2000)}")
    assert(log2.contains("VACUUM_DONE"), log2.takeRight(2000))
    assert(!hfsExists(root, "_versions/_admin.lock"),
      "the winner must release the lock when done")
    TableVersions.clearStateCache()
    val rows = TableVersions.read(spark, root).as[(String, String)].collect()
    assert(rows.count(_._2 == "host") === 120 && rows.count(_._2 == "live") === 80,
      s"no committed row may be lost to a concurrent vacuum (got ${rows.length})")

    // 3) in-process: two simultaneous claims — exactly one wins
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ts = (0 until 2).map(_ => new Thread(() =>
      try {
        val c = TableVersions.claimAdmin(spark, root, "vacuum")
        results.add("won")
        Thread.sleep(300)
        c.release(spark, root)
      } catch {
        case e: IllegalStateException if e.getMessage.contains("administrative lock") =>
          results.add("refused")
      }))
    ts.foreach(_.start()); ts.foreach(_.join())
    val rs = scala.jdk.CollectionConverters.IteratorHasAsScala(results.iterator).asScala.toSeq
    assert(rs.sorted === Seq("refused", "won"),
      s"exactly one of two simultaneous claims may win, got $rs")

    // 4) a crashed admin's STALE lock self-expires and is broken
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(root, "_versions/_admin.lock")
    val out = f.create(lock, false)
    try out.write(s"dead-token vacuum ${System.currentTimeMillis() - 1000}".getBytes)
    finally out.close()
    TableVersions.vacuum(spark, root, keepVersions = 2, graceMs = 0L) // must not refuse
    assert(!f.exists(lock), "the new admin releases its own claim")

    // 5) moveTable shares the role: a held lock refuses the move too
    val admin2 = TableVersions.claimAdmin(spark, root, "vacuum")
    try {
      val e = intercept[IllegalStateException] {
        TableVersions.moveTable(spark, root, root + "-moved")
      }
      assert(e.getMessage.contains("administrative lock"), e.getMessage)
    } finally admin2.release(spark, root)
  }

  private def hfsExists(root: String, rel: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root, rel)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
