package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** The `GraftCatalog` SQL surface: CREATE TABLE / INSERT INTO /
  * INSERT OVERWRITE / DELETE FROM / TRUNCATE / time travel / ALTER
  * TABLE (properties, rename/add/drop column) / DROP / SHOW TABLES /
  * path-addressed tables — all through `spark.sql` on a session with
  * NO build-time extensions (the conf-only registration the driver's
  * sessions need), every statement landing on the format's
  * transactional commits. File pruning through the catalog read is
  * proven behaviorally (a corrupted out-of-range file does not fail a
  * pruned SELECT).
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // ONE warehouse for the whole JVM ([[TestCatalog]]): the session
  // caches the catalog instance at first use
  private def newWarehouse(): String = TestCatalog.warehouse(spark)

  test("create / insert / select round-trip, partitioned") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.t1 (k BIGINT, v STRING, p STRING) PARTITIONED BY (p)")
    // empty table reads as zero rows under the declared schema
    assert(spark.sql("SELECT * FROM graft.db.t1").count() === 0)
    spark.sql("INSERT INTO graft.db.t1 VALUES (1, 'a', 'x'), (2, 'b', 'y'), (3, 'c', 'x')")
    spark.sql("INSERT INTO graft.db.t1 VALUES (4, 'd', 'y')")
    assert(spark.sql("SELECT sum(k) FROM graft.db.t1").head().getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM graft.db.t1 WHERE p = 'x'").head().getLong(0) === 2L)
    // partitioning declared at CREATE landed in the commits
    val st = TableVersions.commitState(spark, s"$w/db/t1")
    assert(st.partCols === Seq("p"))
    assert(st.files.forall(_.part.contains("p")))
  }

  test("INSERT INTO with extra columns refuses in analysis; ADD COLUMNS + retry is the story") {
    newWarehouse()
    spark.sql("CREATE TABLE graft.db.ti (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.ti VALUES (1, 'a')")
    // Spark validates insert columns against the table schema during
    // ANALYSIS, before any connector sees the plan — INSERT INTO can
    // never auto-evolve (the documented divergence; README pins the
    // three evolution paths). The refusal is Spark's own, loud and
    // pre-write: nothing commits.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft.db.ti VALUES (2, 'b', 0.5)")
    }
    assert(e.getMessage.toLowerCase.contains("column"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.db.ti").head().getLong(0) === 1L,
      "the refused insert must not have committed anything")
    // the actionable workaround: additive ALTER, then the same insert
    spark.sql("ALTER TABLE graft.db.ti ADD COLUMNS (w DOUBLE)")
    spark.sql("INSERT INTO graft.db.ti VALUES (2, 'b', 0.5)")
    val rows = spark.sql("SELECT k, w FROM graft.db.ti ORDER BY k").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(1), "pre-evolution rows null-fill the added column")
    assert(rows(1).getDouble(1) === 0.5)
  }

  test("INSERT OVERWRITE is an audited replace; the old state time-travels") {
    newWarehouse()
    spark.sql("CREATE TABLE graft.db.t2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.t2 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graft.db.t2 VALUES (9, 'z')")
    assert(spark.sql("SELECT k FROM graft.db.t2").as[Long].collect().toSeq === Seq(9L))
    assert(spark.sql("SELECT k FROM graft.db.t2 VERSION AS OF 1")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("DELETE FROM with a pushable predicate; TRUNCATE empties transactionally") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.t3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.t3 SELECT id, concat('v', id) FROM range(100)")
    spark.sql("DELETE FROM graft.db.t3 WHERE k >= 90")
    assert(spark.sql("SELECT count(*) FROM graft.db.t3").head().getLong(0) === 90L)
    spark.sql("TRUNCATE TABLE graft.db.t3")
    assert(spark.sql("SELECT count(*) FROM graft.db.t3").head().getLong(0) === 0L)
    // both were commits, not directory drops: full history still reads
    assert(TableVersions.read(spark, s"$w/db/t3", Some(1L)).count() === 100L)
    assert(TableVersions.history(spark, s"$w/db/t3").count() === 4L)
  }

  test("ALTER TABLE: properties, rename/add/drop column as metadata commits") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.t4 (k BIGINT, a STRING, b DOUBLE)")
    spark.sql("INSERT INTO graft.db.t4 VALUES (1, 'x', 1.5)")
    spark.sql("ALTER TABLE graft.db.t4 SET TBLPROPERTIES ('enableChangeFeed'='true')")
    assert(TableVersions.tableProperties(spark, s"$w/db/t4")
      .get("enableChangeFeed").contains("true"))
    spark.sql("ALTER TABLE graft.db.t4 RENAME COLUMN a TO label")
    spark.sql("ALTER TABLE graft.db.t4 ADD COLUMNS (extra BIGINT)")
    spark.sql("ALTER TABLE graft.db.t4 DROP COLUMN b")
    val out = spark.sql("SELECT * FROM graft.db.t4")
    assert(out.columns.toSeq === Seq("k", "label", "extra"))
    assert(out.head().getString(1) === "x" && out.head().isNullAt(2))
    spark.sql("ALTER TABLE graft.db.t4 UNSET TBLPROPERTIES ('enableChangeFeed')")
    assert(!TableVersions.tableProperties(spark, s"$w/db/t4").contains("enableChangeFeed"))
    // none of that moved data: only the two INSERT-era files exist
    assert(TableVersions.commitState(spark, s"$w/db/t4").files.size === 1)
    // unsupported ADD COLUMN facets refuse LOUDLY instead of silently
    // committing a weaker column than the DDL declared
    val nn = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.t4 ADD COLUMNS (strict BIGINT NOT NULL)")
    }
    assert(nn.getMessage.contains("NOT NULL"), nn.getMessage)
    val pos = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.t4 ADD COLUMNS (early BIGINT FIRST)")
    }
    assert(pos.getMessage.contains("position"), pos.getMessage)
    assert(spark.sql("SELECT * FROM graft.db.t4").columns.toSeq ===
      Seq("k", "label", "extra"), "refused changes must not commit")
  }

  test("path-addressed table and TIMESTAMP AS OF") {
    newWarehouse()
    val root = Files.createTempDirectory("gcp").toString + "/ptbl"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("graft-table").save(root)
    assert(spark.sql(s"SELECT sum(k) FROM graft.`$root`").head().getLong(0) === 3L)
    val t0 = System.currentTimeMillis()
    Thread.sleep(1100)
    Seq((3L, "c")).toDF("k", "v").write.format("graft-table").mode("append").save(root)
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.ofEpochMilli(t0 + 500))
    assert(spark.sql(s"SELECT sum(k) FROM graft.`$root` TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT sum(k) FROM graft.`$root`").head().getLong(0) === 6L)
  }

  test("catalog reads prune files from commit stats (corrupt out-of-range file)") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.t5 (k BIGINT, v STRING)")
    // two range-disjoint files via two inserts
    spark.sql("INSERT INTO graft.db.t5 SELECT id, concat('v', id) FROM range(0, 50)")
    spark.sql("INSERT INTO graft.db.t5 SELECT id, concat('v', id) FROM range(1000, 1050)")
    val high = TableVersions.commitState(spark, s"$w/db/t5").files
      .find(_.stats.get("k").exists(_.minNum.exists(_ >= 1000))).get
    // corrupt the high-range file: a SELECT that needs only the low
    // range must succeed — proof the filter pruned the file at planning
    val p = java.nio.file.Paths.get(new java.net.URI("file://" + high.path).getPath)
    java.nio.file.Files.write(p, Array.fill[Byte](16)(0))
    assert(spark.sql("SELECT count(*) FROM graft.db.t5 WHERE k < 50").head().getLong(0) === 50L)
    intercept[Throwable] { // sanity: the corrupt file breaks an unpruned read
      // (SUM is never stats-answered, so this genuinely scans)
      spark.sql("SELECT sum(k) FROM graft.db.t5").collect()
    }
  }

  test("SHOW TABLES, DROP TABLE, RENAME TABLE, duplicate-create errors") {
    newWarehouse()
    spark.sql("CREATE NAMESPACE graft.db2") // own namespace: SHOW is exact
    spark.sql("CREATE TABLE graft.db2.s1 (k BIGINT)")
    spark.sql("CREATE TABLE graft.db2.s2 (k BIGINT)")
    val shown = spark.sql("SHOW TABLES IN graft.db2").select("tableName")
      .as[String].collect().toSet
    assert(shown === Set("s1", "s2"))
    intercept[Exception] { spark.sql("CREATE TABLE graft.db2.s1 (k BIGINT)") }
    spark.sql("INSERT INTO graft.db2.s1 VALUES (7)")
    spark.sql("ALTER TABLE graft.db2.s1 RENAME TO db2.s3")
    assert(spark.sql("SELECT k FROM graft.db2.s3").head().getLong(0) === 7L)
    spark.sql("DROP TABLE graft.db2.s2")
    assert(spark.sql("SHOW TABLES IN graft.db2").select("tableName")
      .as[String].collect().toSet === Set("s3"))
  }

  test("COUNT/MIN/MAX answer from commit stats: metadata-only, exact, safe fallbacks") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.t7 (k BIGINT, d DATE, v STRING)")
    spark.sql("INSERT INTO graft.db.t7 SELECT id, DATE'2024-01-01' + CAST(id AS INT), " +
      "concat('v', id) FROM range(0, 500)")
    // second insert carries NULLs in k (count(k) must subtract them);
    // it keeps SOME non-null k in the same file — a file ALL-null in a
    // column records no stats entry for it, which (by design) refuses
    // the pushdown rather than guessing, tested further down
    spark.sql("INSERT INTO graft.db.t7 SELECT /*+ COALESCE(1) */ " +
      "CASE WHEN id < 7 THEN NULL ELSE -id END, DATE'2023-12-25', 'x' FROM range(0, 10)")
    // corrupt EVERY data file: only a metadata-answered plan can succeed
    TableVersions.commitState(spark, s"$w/db/t7").files.foreach { fe =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(new java.net.URI("file://" + fe.path).getPath),
        Array.fill[Byte](16)(0))
    }
    val r = spark.sql("SELECT count(*), count(k), min(k), max(k), min(d), max(d) " +
      "FROM graft.db.t7").head()
    assert(r.getLong(0) === 510L)
    assert(r.getLong(1) === 503L)
    assert(r.getLong(2) === -9L && r.getLong(3) === 499L)
    assert(r.getDate(4).toString === "2023-12-25")
    assert(r.getDate(5).toString === "2025-05-14")
    // strings, DISTINCT, and filtered aggregates must NOT push — they
    // need the (corrupted) data, so they fail rather than lie
    intercept[Throwable] { spark.sql("SELECT min(v) FROM graft.db.t7").collect() }
    intercept[Throwable] { spark.sql("SELECT count(DISTINCT k) FROM graft.db.t7").collect() }
    intercept[Throwable] { spark.sql("SELECT count(*) FROM graft.db.t7 WHERE k > 3").collect() }
    // a DV-carrying snapshot refuses stats answers (tombstones make
    // them wrong): the same aggregate now scans — and stays correct
    spark.sql("CREATE TABLE graft.db.t8 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.t8 SELECT id, concat('v', id) FROM range(0, 100)")
    TableVersions.deleteWhere(spark, s"$w/db/t8", col("k") < 10L, maxDvFraction = 0.5)
    assert(TableVersions.commitState(spark, s"$w/db/t8").dvs.nonEmpty)
    val r8 = spark.sql("SELECT count(*), min(k) FROM graft.db.t8").head()
    assert(r8.getLong(0) === 90L && r8.getLong(1) === 10L)
    // a file ALL-null in a column records no stats entry for it: the
    // ambiguity refuses the pushdown (count falls back to a scan and
    // stays correct) while count(*) still answers from metadata
    spark.sql("CREATE TABLE graft.db.t9 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.t9 SELECT /*+ COALESCE(1) */ CAST(NULL AS BIGINT), " +
      "concat('v', id) FROM range(0, 5)")
    spark.sql("INSERT INTO graft.db.t9 VALUES (42, 'z')")
    val r9 = spark.sql("SELECT count(*), count(k), min(k) FROM graft.db.t9").head()
    assert(r9.getLong(0) === 6L && r9.getLong(1) === 1L && r9.getLong(2) === 42L)
    // GROUP BY partition columns answers per partition tuple from the
    // commit — proven metadata-only by corrupting the data files
    spark.sql("CREATE TABLE graft.db.t10 (k BIGINT, p STRING, d INT) PARTITIONED BY (p, d)")
    spark.sql("INSERT INTO graft.db.t10 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' " +
      "END, CAST(id % 3 AS INT) FROM range(0, 60)")
    TableVersions.commitState(spark, s"$w/db/t10").files.foreach { fe =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(new java.net.URI("file://" + fe.path).getPath),
        Array.fill[Byte](16)(0))
    }
    val g = spark.sql("SELECT p, d, count(*) AS n, min(k) AS mn, max(k) AS mx " +
      "FROM graft.db.t10 GROUP BY p, d ORDER BY p, d").collect()
    assert(g.length === 6)
    assert(g.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq(("a", 0, 10L), ("a", 1, 10L), ("a", 2, 10L),
        ("b", 0, 10L), ("b", 1, 10L), ("b", 2, 10L)))
    assert(g.head.getLong(3) === 0L && g.head.getLong(4) === 54L) // p=a,d=0: 0,6,..54
    // grouping by a NON-partition column needs the data: fails loudly
    intercept[Throwable] {
      spark.sql("SELECT k, count(*) FROM graft.db.t10 GROUP BY k").collect()
    }
    // a WHERE over partition columns ONLY prunes the per-file stat rows
    // first and still answers from metadata — the "count rows in
    // yesterday's partition" shape, proven on the same corrupted files
    val f1 = spark.sql(
      "SELECT count(*), min(k), max(k) FROM graft.db.t10 WHERE p = 'a' AND d = 0").head()
    assert(f1.getLong(0) === 10L && f1.getLong(1) === 0L && f1.getLong(2) === 54L)
    val f2 = spark.sql("SELECT p, count(*) AS n FROM graft.db.t10 " +
      "WHERE d >= 1 GROUP BY p ORDER BY p").collect()
    assert(f2.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 20L), ("b", 20L)))
    assert(spark.sql("SELECT count(*) FROM graft.db.t10 WHERE p IN ('a')")
      .head().getLong(0) === 30L)
    // an empty partition selection answers 0 rows, never errors
    assert(spark.sql("SELECT count(*) FROM graft.db.t10 WHERE p = 'zz'")
      .head().getLong(0) === 0L)
    // mixing in a NON-partition predicate still needs the data: loud
    intercept[Throwable] {
      spark.sql("SELECT count(*) FROM graft.db.t10 WHERE p = 'a' AND k > 3").collect()
    }
  }

  test("catalog reads report exact size from the commit: small tables broadcast in joins") {
    newWarehouse()
    spark.sql("CREATE TABLE graft.db.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.db.dim SELECT id, concat('n', id) FROM range(0, 100)")
    val big = spark.range(0, 100000).toDF("k")
    val joined = big.join(spark.table("graft.db.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 100-row catalog table must broadcast, got:\n${plan.take(1500)}")
    assert(joined.count() === 100)
  }

  test("CTAS and REPLACE TABLE AS SELECT") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.c1 AS SELECT id AS k, concat('v', id) AS v " +
      "FROM range(0, 50)")
    assert(spark.sql("SELECT count(*), min(k) FROM graft.db.c1").head().getLong(0) === 50L)
    assert(TableVersions.commitState(spark, s"$w/db/c1").schema.get.fieldNames.toSeq ===
      Seq("k", "v"))
    // partitioned CTAS
    spark.sql("CREATE TABLE graft.db.c2 PARTITIONED BY (p) AS " +
      "SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS p FROM range(0, 20)")
    assert(TableVersions.commitState(spark, s"$w/db/c2").partCols === Seq("p"))
    assert(spark.sql("SELECT count(*) FROM graft.db.c2 WHERE p = 'x'").head().getLong(0) === 10L)
    // RTAS: new schema replaces the old table
    spark.sql("REPLACE TABLE graft.db.c1 AS SELECT id * 2 AS twice FROM range(0, 5)")
    assert(spark.sql("SELECT max(twice) FROM graft.db.c1").head().getLong(0) === 8L)
  }

  test("CALL graft.system.*: maintenance procedures through SQL") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.m1 (k BIGINT, v STRING)")
    (1 to 5).foreach { i =>
      spark.sql(s"INSERT INTO graft.db.m1 SELECT id, concat('v', id) " +
        s"FROM range(${(i - 1) * 100}, ${i * 100})")
    }
    val root = s"$w/db/m1"
    assert(TableVersions.commitState(spark, root).files.size > 1)
    // optimize (compact) returns the committed version; the table reads back whole
    val v = spark.sql("CALL graft.system.optimize(`table` => 'db.m1', target_mb => 128)")
      .head().getLong(0)
    assert(v > 0L)
    assert(TableVersions.commitState(spark, root).files.size === 1)
    assert(spark.sql("SELECT count(*) FROM graft.db.m1").head().getLong(0) === 500L)
    // zorder re-clusters; history through CALL shows every operation
    spark.sql("CALL graft.system.zorder('db.m1', 'k', 4)")
    assert(TableVersions.commitState(spark, root).files.size === 4)
    val ops = spark.sql("CALL graft.system.history('db.m1')")
      .select("operation").as[String].collect().toSeq
    assert(ops.head.startsWith("ZORDER") && ops.contains("COMPACT"))
    // restore rolls back to the compacted snapshot as a NEW audited version
    spark.sql(s"CALL graft.system.restore('db.m1', $v)")
    assert(TableVersions.commitState(spark, root).files.size === 1)
    // restore_as_of resolves through the commits' in-commit instants —
    // the zorder step's commit_ts pins "how the table was" at that instant
    val zTs = spark.sql("CALL graft.system.history('db.m1')")
      .where($"operation".startsWith("ZORDER"))
      .select(date_format($"commit_ts", "yyyy-MM-dd HH:mm:ss.SSS").cast("string"))
      .head().getString(0)
    spark.sql(s"CALL graft.system.restore_as_of('db.m1', '$zTs')")
    assert(TableVersions.commitState(spark, root).files.size === 4,
      "restore_as_of must land on the zordered (4-file) snapshot")
    spark.sql(s"CALL graft.system.restore('db.m1', $v)") // back for the rest
    // clone + move compose with the catalog's table addressing
    spark.sql("CALL graft.system.clone_table('db.m1', 'db.m1_clone')")
    assert(spark.sql("SELECT count(*) FROM graft.db.m1_clone").head().getLong(0) === 500L)
    val moved = spark.sql("CALL graft.system.move_table('db.m1_clone', 'db.m1_moved')")
      .head().getString(0)
    assert(moved.endsWith("db/m1_moved"))
    assert(spark.sql("SELECT count(*) FROM graft.db.m1_moved").head().getLong(0) === 500L)
    // bloom maintenance indexes the live files; vacuum sweeps history
    assert(spark.sql("CALL graft.system.maintain_bloom('db.m1', 'k')")
      .head().getLong(0) === 1L)
    // dry run first: names dead history without touching it
    val preview = spark.sql("CALL graft.system.vacuum_dry_run('db.m1', 1, 0)")
      .select("kind").as[String].collect().toSet
    assert(preview.contains("commit"), s"dry run must classify dropped commits, got $preview")
    assert(spark.sql("SELECT count(*) FROM graft.db.m1").head().getLong(0) === 500L)
    spark.sql("CALL graft.system.vacuum('db.m1', 1, 0)") // grace 0: sweep everything
    intercept[Exception] { TableVersions.read(spark, root, Some(0L)).count() }
    assert(spark.sql("SELECT count(*) FROM graft.db.m1").head().getLong(0) === 500L)
    // partition-scoped optimize compacts ONLY the named partition
    spark.sql("CREATE TABLE graft.db.m2 (k BIGINT, p STRING) PARTITIONED BY (p)")
    (1 to 3).foreach { _ =>
      spark.sql("INSERT INTO graft.db.m2 SELECT /*+ COALESCE(1) */ id, 'x' FROM range(0, 10)")
      spark.sql("INSERT INTO graft.db.m2 SELECT /*+ COALESCE(1) */ id, 'y' FROM range(0, 10)")
    }
    def filesPer(part: String): Int = TableVersions.commitState(spark, s"$w/db/m2")
      .files.count(_.part.get("p").contains(part))
    assert(filesPer("x") === 3 && filesPer("y") === 3)
    spark.sql("CALL graft.system.optimize('db.m2', 128, 'p=x')")
    assert(filesPer("x") === 1 && filesPer("y") === 3,
      "partition scope must compact only p=x")
    // CHECK constraints as procedures (Spark SQL has no CHECK DDL):
    // committed, enforced on the next INSERT, droppable
    spark.sql("CALL graft.system.add_constraint('db.m1', 'k_small', 'k < 1000')")
    val exc = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.m1 VALUES (5000, 'big')")
    }
    assert(exc.getMessage.contains("k_small"))
    spark.sql("CALL graft.system.drop_constraint('db.m1', 'k_small')")
    spark.sql("INSERT INTO graft.db.m1 VALUES (5000, 'big')")
    assert(spark.sql("SELECT count(*) FROM graft.db.m1").head().getLong(0) === 501L)
    // unknown procedures fail loudly (Spark wraps the loud roster
    // message in FAILED_TO_LOAD_ROUTINE; the cause carries it)
    val ex = intercept[Exception] { spark.sql("CALL graft.system.nope('db.m1')") }
    assert(ex.getMessage.contains("nope"))
    assert(Option(ex.getCause).exists(_.getMessage.contains("unknown procedure")))
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: extra source columns evolve the table") {
    val w = newWarehouse()
    spark.sql("CREATE TABLE graft.db.me (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.me VALUES (1, 'a'), (2, 'b')")
    spark.range(0, 0).createOrReplaceTempView("mes_empty")
    Seq((2L, "B", 9.5), (3L, "c", 3.25)).toDF("k", "v", "score")
      .createOrReplaceTempView("mes")
    // WITHOUT the clause, star actions expand over TARGET columns only
    // (Spark's stance): extra source columns never evolve the schema
    spark.sql("MERGE INTO graft.db.me t USING mes_empty s ON t.k = s.id " +
      "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.id)")
    assert(spark.table("graft.db.me").columns.toSeq === Seq("k", "v"),
      "no clause, no evolution")
    // WITH SCHEMA EVOLUTION: Spark derives AddColumn changes, our
    // catalog commits them (nullable, appended), old rows null-fill
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.db.me t USING mes s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val out = spark.sql("SELECT k, v, score FROM graft.db.me ORDER BY k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ===
      Seq((1L, "a", null), (2L, "B", 9.5), (3L, "c", 3.25)))
    // the evolution is a committed metadata step: time travel shows it
    assert(TableVersions.commitState(spark, s"$w/db/me").schema.get.fieldNames.toSeq ===
      Seq("k", "v", "score"))
  }

  test("change feed composes with SQL DML (property set at CREATE)") {
    val w = newWarehouse()
    spark.sql(
      "CREATE TABLE graft.db.t6 (k BIGINT, v STRING) TBLPROPERTIES ('enableChangeFeed'='true')")
    spark.sql("INSERT INTO graft.db.t6 VALUES (1, 'a'), (2, 'b')")
    val root = s"$w/db/t6"
    TableVersions.upsert(spark, root, Seq((1L, "A"), (3L, "c")).toDF("k", "v"), "k")
    val types = TableVersions
      .readChanges(spark, root, 1L, TableVersions.currentVersion(spark, root).get,
        updateImages = true)
      .select("_change_type").as[String].collect().sorted.toSeq
    assert(types === Seq("insert", "update_postimage", "update_preimage"))
  }
}
