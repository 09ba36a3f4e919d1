package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TableVersions

/** Streaming CDF source contracts: `readStream.format("graft-cdf")`
  * tails a versioned table's commit log with commit versions as
  * offsets — catch-up consumes retained history, a checkpointed
  * restart consumes ONLY new versions (no duplicates), DV deletes and
  * rewrites surface as delete rows, and the reconstructed stream state
  * equals the table's final snapshot.
  */
class CdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String) = Files.createTempDirectory(tag).toString

  test("cdf stream: catch-up, checkpointed restart without duplicates, delete flow-through") {
    val root = newDir("cdfsrc") + "/tbl"
    val logDir = newDir("cdflog")
    val ckpt = newDir("cdfckpt")

    TableVersions.append(spark, root,
      (1L to 1000L).toDF("k").withColumn("v", col("k") * 3).coalesce(1))
    TableVersions.append(spark, root,
      (1001L to 1500L).toDF("k").withColumn("v", col("k") * 3).coalesce(1))

    def runStream(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("path", root).load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream()
    val log1 = spark.read.parquet(logDir)
    assert(log1.count() === 1500)
    assert(log1.filter(col("_change_type") === "insert").count() === 1500)
    assert(log1.select("_commit_version").distinct().count() === 2)

    // new commits while the stream is down: a DV delete and an append
    val Some(_) = TableVersions.deleteWhere(spark, root,
      col("k").isin(5L, 10L, 1200L), maxDvFraction = 0.1): @unchecked
    TableVersions.append(spark, root,
      (2000L to 2099L).toDF("k").withColumn("v", col("k") * 3).coalesce(1))

    // restart from the checkpoint: ONLY the two new versions flow
    runStream()
    val log2 = spark.read.parquet(logDir)
    assert(log2.count() === 1500 + 3 + 100, "restart must not re-emit consumed versions")
    assert(log2.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSet === Set(5L, 10L, 1200L))

    // a third run with nothing new consumes nothing
    runStream()
    assert(spark.read.parquet(logDir).count() === 1603)

    // reconstructed state from the stream == the table's final snapshot
    val ins = log2.filter(col("_change_type") === "insert").select("k", "v")
    val del = log2.filter(col("_change_type") === "delete").select("k", "v")
    val reconstructed = ins.exceptAll(del)
    val snapshot = TableVersions.read(spark, root).select("k", "v")
    assert(reconstructed.count() === snapshot.count())
    assert(reconstructed.exceptAll(snapshot).isEmpty &&
      snapshot.exceptAll(reconstructed).isEmpty)
  }

  test("graft-table stream: append tailing, change commits throw, skipChangeCommits skips whole") {
    val root = newDir("tblsrc") + "/tbl"
    val logDir = newDir("tblsrclog")
    val ckpt = newDir("tblsrcckpt")
    TableVersions.append(spark, root,
      (1L to 300L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))
    TableVersions.append(spark, root,
      (301L to 400L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))

    def runStream(skip: Boolean = false): Unit = {
      val reader = spark.readStream.format("graft-table").option("path", root)
      val q = (if (skip) reader.option("skipChangeCommits", "true") else reader).load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream()
    val log1 = spark.read.parquet(logDir)
    // rows arrive in the TABLE schema — no _change_type/_commit_version
    assert(log1.columns.sorted.toSeq === Seq("k", "v"))
    assert(log1.count() === 400)

    // a checkpointed restart consumes only the new append
    TableVersions.append(spark, root,
      (401L to 450L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))
    runStream()
    assert(spark.read.parquet(logDir).count() === 450)

    // a DV delete is NOT an append: the stream fails loudly naming the option
    val Some(_) = TableVersions.deleteWhere(spark, root, col("k").isin(5L, 7L),
      maxDvFraction = 0.1): @unchecked
    TableVersions.append(spark, root, Seq((500L, 1000L)).toDF("k", "v"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runStream() }
    assert(ex.getMessage.contains("skipChangeCommits") ||
      Option(ex.getCause).exists(_.getMessage.contains("skipChangeCommits")))
    assert(spark.read.parquet(logDir).count() === 450, "the failed batch must commit nothing")

    // skipChangeCommits=true: the delete commit is skipped WHOLE, the
    // append after it flows
    runStream(skip = true)
    val log3 = spark.read.parquet(logDir)
    assert(log3.count() === 451)
    assert(log3.filter(col("k") === 500L).count() === 1)
    // the tombstoned keys were NOT re-emitted or retracted: the stream
    // saw only appends, exactly the Delta skipChangeCommits contract
    assert(log3.filter(col("k").isin(5L, 7L)).count() === 2, "original appends stay consumed")
  }

  test("cdf stream: startingVersion=latest tails only new commits") {
    val root = newDir("cdfsrc2") + "/tbl"
    val logDir = newDir("cdflog2")
    val ckpt = newDir("cdfckpt2")
    TableVersions.append(spark, root, (1L to 500L).toDF("k").coalesce(1))

    def runStream(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", root).option("startingVersion", "latest").load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream() // history is skipped
    assert(!hfsExists(logDir) || spark.read.parquet(logDir).count() === 0)
    TableVersions.append(spark, root, (501L to 600L).toDF("k").coalesce(1))
    runStream()
    assert(spark.read.parquet(logDir).count() === 100)
  }

  test("cdf stream: startingTimestamp consumes commits at or after the instant") {
    val root = newDir("cdfts") + "/tbl"
    val logDir = newDir("cdftslog")
    val ckpt = newDir("cdftsckpt")
    TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(1)) // v0
    Thread.sleep(1100)
    // session-zone wall clock (UTC in tests): the option resolves the
    // string in spark.sql.session.timeZone and compares against commit
    // file mtimes
    val cut = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    Thread.sleep(1100)
    TableVersions.append(spark, root, (101L to 130L).toDF("k").coalesce(1)) // v1
    TableVersions.append(spark, root, (131L to 140L).toDF("k").coalesce(1)) // v2
    val q = spark.readStream.format("graft-cdf")
      .option("path", root).option("startingTimestamp", cut).load()
      .writeStream.format("parquet")
      .option("path", logDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ks = spark.read.parquet(logDir).select("k").as[Long].collect().toSet
    assert(ks === (101L to 140L).toSet,
      "only commits at or after the instant stream; history before it is skipped")
    // both options at once refuse
    intercept[Exception] {
      spark.readStream.format("graft-cdf").option("path", root)
        .option("startingVersion", "1").option("startingTimestamp", cut).load()
        .writeStream.format("noop").option("checkpointLocation", newDir("cdftsbad"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }

  test("cdf stream: startingTimestamp takes date-only strings, resolves in the session zone") {
    val root = newDir("cdftz") + "/tbl"
    TableVersions.append(spark, root, (1L to 50L).toDF("k").coalesce(1)) // v0
    Thread.sleep(1100)
    val cutInstant = java.time.Instant.now()
    Thread.sleep(1100)
    TableVersions.append(spark, root, (51L to 80L).toDF("k").coalesce(1)) // v1

    def streamedKeys(ts: String): Set[Long] = {
      val logDir = newDir("cdftzlog")
      val q = spark.readStream.format("graft-cdf")
        .option("path", root).option("startingTimestamp", ts).load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", newDir("cdftzckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val p = new org.apache.hadoop.fs.Path(logDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
        spark.read.parquet(logDir).select("k").as[Long].collect().toSet
      else Set.empty
    }

    // date-only, Delta-accepted form: midnight of that day in the
    // session zone — a past date streams the full history
    assert(streamedKeys("2020-01-01") === (1L to 80L).toSet)
    // a zone-less timestamp resolves in spark.sql.session.timeZone, NOT
    // the driver JVM default: format the cut instant in a +05:30 zone
    // and resolve under that same session zone — only v1 streams. The
    // old LocalDateTime-in-default-zone parse read this as UTC, 5.5 h
    // in the future, and streamed nothing.
    val kolkata = java.time.ZoneId.of("Asia/Kolkata")
    val cutInKolkata = java.time.LocalDateTime.ofInstant(cutInstant, kolkata)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try assert(streamedKeys(cutInKolkata) === (51L to 80L).toSet)
    finally spark.conf.set("spark.sql.session.timeZone", old)
    // garbage refuses with the actionable message
    val e = intercept[Exception] { streamedKeys("not-a-time") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("startingTimestamp")), msgs(e).mkString(" | "))
  }

  test("graft-table stream: startingVersion=snapshot bootstraps current rows, then tails") {
    val root = newDir("snapsrc") + "/tbl"
    val logDir = newDir("snaplog")
    val ckpt = newDir("snapckpt")
    // a history a pure append-tail could NOT replay: a DV delete and an
    // upsert — the snapshot bootstrap folds them instead of throwing
    TableVersions.append(spark, root,
      (1L to 300L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))
    val Some(_) = TableVersions.deleteWhere(spark, root, col("k").isin(5L, 7L),
      maxDvFraction = 0.1): @unchecked
    TableVersions.upsert(spark, root, Seq((10L, -1L)).toDF("k", "v"), "k")
    TableVersions.append(spark, root,
      (301L to 350L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))
    val oneShot = TableVersions.read(spark, root).as[(Long, Long)].collect().toSet

    def runStream(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("path", root).option("startingVersion", "snapshot").load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream()
    val boot = spark.read.parquet(logDir).as[(Long, Long)].collect().toSet
    assert(boot === oneShot, "bootstrap batch must equal the one-shot snapshot read")

    // restart across the checkpoint: later appends tail, nothing re-serves
    val late = (400L to 410L).map(k => (k, k * 2))
    TableVersions.append(spark, root, late.toDF("k", "v").coalesce(1))
    runStream()
    assert(spark.read.parquet(logDir).as[(Long, Long)].collect().toSet ===
      oneShot ++ late, "bootstrap + tail must equal one-shot read UNION later appends")

    // the append-only contract still guards the tail after the pin
    TableVersions.upsert(spark, root, Seq((400L, -9L)).toDF("k", "v"), "k")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runStream() }
    assert(ex.getMessage.contains("skipChangeCommits") ||
      Option(ex.getCause).exists(_.getMessage.contains("skipChangeCommits")))

    // the cdf source refuses the snapshot mode loudly
    val bad = intercept[Exception] {
      spark.readStream.format("graft-cdf")
        .option("path", root).option("startingVersion", "snapshot").load()
        .writeStream.format("noop").option("checkpointLocation", newDir("snapbad"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(bad).exists(m => m != null && m.contains("graft-table streaming option")))
  }

  test("maxVersionsPerTrigger: a 10-commit backlog drains in 4 bounded batches, restart-safe") {
    val root = newDir("cdfcap") + "/tbl"
    val logDir = newDir("cdfcaplog")
    val ckpt = newDir("cdfcapckpt")
    (0 until 10).foreach { i =>
      TableVersions.append(spark, root,
        ((i * 10L) until ((i + 1) * 10L)).toDF("k").coalesce(1))
    }
    // every run is a cold restart consuming ONE capped batch — the
    // strongest form of "mid-drain restart": state carries only through
    // the checkpoint + the persisted cap floor
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", root).option("maxVersionsPerTrigger", "3").load()
        .writeStream.format("parquet")
        .option("path", logDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val expectedCounts = Seq(30L, 60L, 90L, 100L)
    expectedCounts.zipWithIndex.foreach { case (n, i) =>
      runOnce()
      val log = spark.read.parquet(logDir)
      assert(log.count() === n, s"after batch ${i + 1}: bounded admission")
      assert(log.select("_commit_version").distinct().count() === math.min((i + 1) * 3, 10),
        "versions admitted oldest-first, at most 3 per batch")
    }
    // a further run consumes nothing; totals exact — no loss, no dups
    runOnce()
    val log = spark.read.parquet(logDir)
    assert(log.count() === 100)
    assert(log.groupBy("_commit_version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      (0L to 9L).map(_ -> 10L).toMap)
    assert(log.select("k").distinct().count() === 100)
    // exactly 4 data-bearing offset ranges were logged
    val off = new org.apache.hadoop.fs.Path(ckpt, "offsets")
    val fs = off.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(off).map(_.getPath.getName).count(_.forall(_.isDigit))
    assert(batches === 4, s"10 versions at cap 3 must take exactly 4 batches, saw $batches")
  }

  test("graft-table streaming sink: table -> cdf -> table replication is exactly-once") {
    val src = newDir("replsrc") + "/tbl"
    val dst = newDir("repldst") + "/tbl"
    val ckpt = newDir("replckpt")
    TableVersions.append(spark, src, (1L to 500L).toDF("k").coalesce(1))

    def replicate(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("path", src).load()
        .filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version", "_commit_timestamp")
        .writeStream.format("graft-table")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .option("txnAppId", "repl")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    replicate()
    assert(TableVersions.read(spark, dst).count() === 500)
    assert(TableVersions.lastTxn(spark, dst, "repl") === Some(0L))

    // more source commits while the stream is down; restart replicates
    // ONLY the new versions
    TableVersions.append(spark, src, (501L to 600L).toDF("k").coalesce(1))
    replicate()
    val d = TableVersions.read(spark, dst)
    assert(d.count() === 600, "restart must not re-append consumed versions")
    assert(d.select("k").distinct().count() === 600)

    // a drained re-run commits nothing on the destination
    val vBefore = TableVersions.currentVersion(spark, dst).get
    replicate()
    assert(TableVersions.currentVersion(spark, dst).get === vBefore)
    // replica content equals the source table exactly
    val s = TableVersions.read(spark, src)
    assert(d.exceptAll(s).isEmpty && s.exceptAll(d).isEmpty)
    // non-append output modes refuse loudly
    val ex = intercept[Exception] {
      spark.readStream.format("graft-cdf").option("path", src).load()
        .groupBy("k").count()
        .writeStream.format("graft-table").option("path", dst)
        .option("checkpointLocation", newDir("replckpt2"))
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    assert(ex.getMessage.toLowerCase.contains("append"))
  }

  private def hfsExists(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }
}
