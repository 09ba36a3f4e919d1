package graft


import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** SQL UPDATE / MERGE INTO / arbitrary-predicate DELETE on catalog
  * tables — the delta-based row-level protocol (`SupportsDelta`) over
  * the versioned format: changed rows spill per task, tombstones land
  * as deletion vectors under the fraction guard (merge-on-read — a
  * small UPDATE rewrites NO data file) with the touched-file rewrite
  * fallback, and every statement is one atomic commit that composes
  * with time travel, the change feed, and constraints.
  */
class SqlRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse: String = TestCatalog.warehouse(spark)

  test("UPDATE: small change takes the merge-on-read path, no data file rewrites") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u1 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.u1 SELECT id, id * 10 FROM range(0, 1000)")
    val root = s"$w/db/u1"
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    spark.sql("UPDATE graft.db.u1 SET v = v + 1 WHERE k % 97 = 0")
    // semantics
    assert(spark.sql("SELECT sum(v) FROM graft.db.u1").head().getLong(0) ===
      (0L until 1000L).map(k => k * 10 + (if (k % 97 == 0) 1 else 0)).sum)
    assert(spark.sql("SELECT count(*) FROM graft.db.u1 WHERE v % 10 = 1").head().getLong(0)
      === 11L)
    // mechanics: tombstones, not rewrites — original files all still live
    val st = TableVersions.commitState(spark, root)
    assert(files0.subsetOf(st.files.map(_.path).toSet),
      "a small UPDATE must not rewrite data files (merge-on-read)")
    assert(st.dvs.nonEmpty, "the update's deletes land as deletion vectors")
    // one atomic commit: the pre-update state time-travels
    val cur = TableVersions.currentVersion(spark, root).get
    assert(spark.sql(s"SELECT sum(v) FROM graft.db.u1 VERSION AS OF ${cur - 1}")
      .head().getLong(0) === (0L until 1000L).map(_ * 10).sum)
  }

  test("DELETE with an untranslatable predicate routes through row-level ops") {
    warehouse
    spark.sql("CREATE TABLE graft.db.u2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.u2 SELECT id, concat('v', id) FROM range(0, 500)")
    spark.sql("DELETE FROM graft.db.u2 WHERE k % 10 = 3") // no sources.Filter form
    assert(spark.sql("SELECT count(*) FROM graft.db.u2").head().getLong(0) === 450L)
    assert(spark.sql("SELECT count(*) FROM graft.db.u2 WHERE k % 10 = 3")
      .head().getLong(0) === 0L)
  }

  test("MERGE INTO: update + delete + insert in one atomic SQL statement") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u3 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.u3 SELECT id, id FROM range(0, 300)")
    Seq((5L, "U", 500L), (17L, "U", 1700L), (23L, "D", 0L), (900L, "I", 9000L))
      .toDF("k", "op", "nv").createOrReplaceTempView("u3_src")
    spark.sql(
      """MERGE INTO graft.db.u3 t USING u3_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.nv
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    val got = spark.sql("SELECT k, v FROM graft.db.u3 WHERE k IN (5, 17, 23, 900, 42)")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((5L, 500L), (17L, 1700L), (42L, 42L), (900L, 9000L)))
    assert(spark.sql("SELECT count(*) FROM graft.db.u3").head().getLong(0) === 300L)
    // one commit for the whole statement, audited
    val root = s"$w/db/u3"
    val ops = TableVersions.history(spark, root).select("operation")
      .as[String].collect()
    assert(ops.head.startsWith("SQL MERGE"), ops.mkString(", "))
    // the feed serves the statement as exact delete/insert rows
    val cur = TableVersions.currentVersion(spark, root).get
    val ch = TableVersions.readChanges(spark, root, cur - 1, cur)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(ch === Set(("delete", 5L), ("delete", 17L), ("delete", 23L),
      ("insert", 5L), ("insert", 17L), ("insert", 900L)))
  }

  test("a big UPDATE exceeds the DV fraction and rewrites the touched files") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u4 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.u4 SELECT /*+ COALESCE(2) */ id, id FROM range(0, 1000)")
    val root = s"$w/db/u4"
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    spark.sql("UPDATE graft.db.u4 SET v = 0 WHERE k < 900") // 90% of rows
    assert(spark.sql("SELECT sum(v) FROM graft.db.u4").head().getLong(0) ===
      (900L until 1000L).map(identity).sum)
    val st = TableVersions.commitState(spark, root)
    assert(st.dvs.isEmpty, "a table-sized update must rewrite, not accumulate DVs")
    assert(files0.intersect(st.files.map(_.path).toSet).isEmpty,
      "every touched file re-materialized")
  }

  test("UPDATE respects CHECK constraints and rolls back whole") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u5 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.u5 SELECT id, id FROM range(0, 100)")
    spark.sql("CALL graft.system.add_constraint('db.u5', 'v_cap', 'v < 1000')")
    val ex = intercept[Exception] {
      spark.sql("UPDATE graft.db.u5 SET v = v + 5000 WHERE k < 10")
    }
    assert(ex.getMessage.contains("v_cap") ||
      Option(ex.getCause).exists(_.getMessage.contains("v_cap")))
    // nothing committed, no tombstones, no staged debris in play
    val root = s"$w/db/u5"
    assert(spark.sql("SELECT sum(v) FROM graft.db.u5").head().getLong(0) ===
      (0L until 100L).sum)
    assert(TableVersions.commitState(spark, root).dvs.isEmpty)
  }

  test("UPDATE on a partitioned table: in-place and partition-moving updates") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u7 (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.db.u7 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' " +
      "END FROM range(0, 200)")
    // partition-moving update: the row's delete lands in its old
    // partition, the reinsert lands in the new one with exact metadata
    spark.sql("UPDATE graft.db.u7 SET p = 'c' WHERE k % 50 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.u7 WHERE p = 'c'").head().getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM graft.db.u7").head().getLong(0) === 200L)
    val st = TableVersions.commitState(spark, s"$w/db/u7")
    val moved = st.files.filter(_.part.get("p").contains("c"))
    assert(moved.nonEmpty && moved.forall(_.part("p") == "c"),
      "reinserted rows carry exact partition metadata")
    // partition pruning still exact after the move
    assert(spark.sql("SELECT sum(k) FROM graft.db.u7 WHERE p = 'c'").head().getLong(0) ===
      (0L until 200L).filter(_ % 50 == 0).sum)
  }

  test("UPDATE through an active column mapping (renamed column)") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u8 (k BIGINT, amount BIGINT)")
    spark.sql("INSERT INTO graft.db.u8 SELECT id, id * 100 FROM range(0, 50)")
    spark.sql("ALTER TABLE graft.db.u8 RENAME COLUMN amount TO total")
    spark.sql("UPDATE graft.db.u8 SET total = total + 7 WHERE k % 10 = 0")
    assert(spark.sql("SELECT sum(total) FROM graft.db.u8").head().getLong(0) ===
      (0L until 50L).map(k => k * 100 + (if (k % 10 == 0) 7 else 0)).sum)
    // the rename stayed metadata-only: physical files still store the
    // old name; the update wrote THROUGH the mapping
    val st = TableVersions.commitState(spark, s"$w/db/u8")
    assert(TableVersions.read(spark, s"$w/db/u8").columns.toSeq === Seq("k", "total"))
    assert(st.schema.get.fieldNames.toSeq === Seq("k", "total"))
  }

  test("UPDATE on a table already carrying deletion vectors keeps old tombstones") {
    val w = warehouse
    spark.sql("CREATE TABLE graft.db.u9 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.u9 SELECT id, id FROM range(0, 400)")
    val root = s"$w/db/u9"
    // first a DV delete through the API, then a SQL UPDATE touching the
    // same files: the update's sidecar must CARRY the old tombstones
    TableVersions.deleteWhere(spark, root, col("k").isin(3L, 7L), maxDvFraction = 0.2)
    assert(TableVersions.commitState(spark, root).dvs.nonEmpty)
    spark.sql("UPDATE graft.db.u9 SET v = 0 WHERE k % 100 = 1")
    val ks = spark.sql("SELECT k FROM graft.db.u9").as[Long].collect().toSet
    assert(!ks.contains(3L) && !ks.contains(7L), "old tombstones survive the update")
    assert(spark.sql("SELECT count(*) FROM graft.db.u9 WHERE v = 0 AND k <> 0")
      .head().getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM graft.db.u9").head().getLong(0) === 398L)
  }

  test("row identity is selectable as metadata columns") {
    warehouse
    spark.sql("CREATE TABLE graft.db.u6 (k BIGINT)")
    spark.sql("INSERT INTO graft.db.u6 SELECT id FROM range(0, 10)")
    val r = spark.sql("SELECT __graft_file, __graft_pos, k FROM graft.db.u6 WHERE k = 3")
      .head()
    assert(r.getString(0).contains("/data/"))
    assert(r.getLong(1) >= 0L)
  }

  test("pushed row-level SQL: UPDATE/DELETE/MERGE plan and commit without materializing") {
    val w = warehouse
    val olds = Seq("graft.table.pushedPruneThreshold" -> "1",
      "graft.table.parquetCheckpointThreshold" -> "1",
      "graft.table.checkpointInterval" -> "1")
      .map { case (k, v) => val o = spark.conf.getOption(k); spark.conf.set(k, v); k -> o }
    try {
      spark.sql("CREATE TABLE graft.db.pu (k BIGINT, v BIGINT)")
      spark.sql("INSERT INTO graft.db.pu SELECT id, id * 10 FROM range(0, 1000)")
      val root = s"$w/db/pu"
      assert(TableVersions.pushedListing(spark, root, None).isDefined,
        "precondition: the snapshot serves a pushed listing")
      val files0 = TableVersions.listing(spark, root).map(_._1).toSet

      val r0 = TableVersions.ckptResolves.get()
      spark.sql("UPDATE graft.db.pu SET v = v + 1 WHERE k % 97 = 0")
      assert(TableVersions.ckptResolves.get() === r0,
        "a pushed UPDATE must never materialize the checkpoint dataset")
      assert(spark.sql("SELECT sum(v) FROM graft.db.pu").head().getLong(0) ===
        (0L until 1000L).map(k => k * 10 + (if (k % 97 == 0) 1 else 0)).sum)
      val st = TableVersions.commitState(spark, root)
      assert(files0.subsetOf(st.files.map(_.path).toSet),
        "merge-on-read held through the pushed path")
      assert(st.dvs.nonEmpty)

      spark.sql("DELETE FROM graft.db.pu WHERE k % 10 = 3")
      assert(spark.sql("SELECT count(*) FROM graft.db.pu").head().getLong(0) === 900L)

      spark.sql("CREATE TABLE graft.db.pu_src (k BIGINT, v BIGINT)")
      spark.sql("INSERT INTO graft.db.pu_src VALUES (1, -1), (5000, -2)")
      spark.sql("""MERGE INTO graft.db.pu t USING graft.db.pu_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.sql("SELECT v FROM graft.db.pu WHERE k = 1").head().getLong(0) === -1L)
      assert(spark.sql("SELECT v FROM graft.db.pu WHERE k = 5000").head().getLong(0) === -2L)
      assert(spark.sql("SELECT count(*) FROM graft.db.pu").head().getLong(0) === 901L)

      // each statement committed as an incremental record
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val top = TableVersions.currentVersion(spark, root).get
      ((top - 2) to top).foreach { v =>
        val in = f.open(new org.apache.hadoop.fs.Path(root, s"_versions/v$v.commit"))
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        assert(txt.contains("#BASE "), s"v$v must be an incremental commit")
      }
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
