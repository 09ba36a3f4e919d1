package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Round-13 table-format regressions:
  *   - schema evolution resolves names the way the SESSION does: under
  *     the default case-insensitive analysis a new column differing
  *     only in case from an existing one is rejected (append) or
  *     treated as the SAME column (merge autoMerge) — never committed
  *     as a duplicate-modulo-case schema that poisons later queries.
  *   - vacuum trusts a horizon-crossing delta's checkpoint only if it
  *     actually RESOLVES: a format-major-4 checkpoint whose ckptpq
  *     dataset is corrupt exists but reconstructs nothing, and the old
  *     existence check would have dropped the only chain to it.
  */
class Round13TableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("r13").toString + "/tbl"

  private def hfs(root: String) = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("append evolution rejects a new column differing only in case (case-insensitive)") {
    val root = newRoot()
    TableVersions.append(spark, root, Seq((1L, "a", 1.0)).toDF("k", "name", "amt"))
    val e = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root,
        Seq((2L, "b", 2.0, 9.9)).toDF("k", "name", "amt", "AMT"))
    }
    assert(e.getMessage.contains("CASE"), e.getMessage)
    assert(TableVersions.read(spark, root).columns.toSeq === Seq("k", "name", "amt"))
    assert(TableVersions.currentVersion(spark, root) === Some(0L),
      "the rejected append must not have committed anything")
  }

  test("string stats truncate at commit write, stay sound bounds, and still prune") {
    val root = newRoot()
    // 600-char documents: untruncated, each file's min/max would embed
    // two whole documents into its commit line
    val doc = "lorem ipsum dolor sit amet " * 23
    val rows = (1 to 200).map(i => (i.toLong, f"$doc${i}%05d"))
    TableVersions.append(spark, root,
      rows.toDF("k", "text").repartition(4))
    val st = TableVersions.commitState(spark, root)
    val realMin = rows.map(_._2).min
    val realMax = rows.map(_._2).max
    st.files.flatMap(_.stats.get("text")).foreach { cs =>
      assert(cs.minStr.exists(_.length <= 64) && cs.maxStr.exists(_.length <= 65),
        s"stored string stats must be truncated: $cs")
      assert(cs.minStr.exists(_ <= realMin), "stored min must stay a lower bound")
      assert(cs.maxStr.exists(_ > realMax), "stored max must stay an upper bound")
    }
    // the commit file itself stays metadata-sized
    val commit = new java.io.File(root, "_versions/v0.commit")
    assert(commit.length() < 16 * 1024,
      s"commit bloated to ${commit.length()} bytes — stats not truncated?")
    // pruning stays conservative: an exact-match filter on a LONG value
    // must still find its row (truncation may keep extra files, never
    // drop the right one)
    val want = rows(137)._2
    assert(TableVersions.read(spark, root).filter(col("text") === want).count() === 1L)
    assert(TableVersions.read(spark, root)
      .filter(col("text") > doc + "00150").count() === 50L)
  }

  test("vacuum re-secures an EXISTING but unresolvable checkpoint before dropping the chain") {
    withConf("graft.table.checkpointInterval" -> "3",
        "graft.table.parquetCheckpointThreshold" -> "1") {
      val root = newRoot()
      // v0..v5, one file each; v3 gets a parquet checkpoint (interval 3)
      (0 to 5).foreach(i => TableVersions.append(spark, root,
        ((i * 100L + 1) to (i * 100L + 10)).toDF("k").coalesce(1)))
      val f = hfs(root)
      val vd = new Path(root, "_versions")
      assert(f.exists(new Path(vd, "v3.checkpoint")), "precondition: v3 checkpointed")
      assert(f.exists(new Path(vd, "v3.ckptpq/_SUCCESS")),
        "precondition: the v3 checkpoint is the parquet form")
      // corrupt the dataset: the checkpoint file still EXISTS but no
      // longer resolves (resolveCkpt refuses a _SUCCESS-less dir)
      f.delete(new Path(vd, "v3.ckptpq/_SUCCESS"), false)

      // keepFrom = 3: v3 is a retained DELTA whose #BASE (2) crosses
      // the horizon, and its checkpoint is broken — vacuum must rewrite
      // it before deleting commits v0..v2, or v3 reconstructs never again
      TableVersions.vacuum(spark, root, keepVersions = 3, graceMs = 0L)

      assert(!f.exists(new Path(vd, "v0.commit")) &&
        !f.exists(new Path(vd, "v2.commit")), "the old chain must be gone")
      assert(f.exists(new Path(vd, "v3.ckptpq/_SUCCESS")),
        "the unresolvable checkpoint must have been rewritten on disk")
      assert(TableVersions.read(spark, root, Some(3L)).count() === 40)
      assert(TableVersions.read(spark, root, Some(5L)).count() === 60)
      assert(TableVersions.read(spark, root).count() === 60)
    }
  }

  test("admin-lock heartbeat: a run longer than the TTL keeps its role") {
    withConf("graft.table.adminLockTtlMs" -> "2000") {
      val root = newRoot()
      TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "s"))
      val lock = new Path(root, "_versions/_admin.lock")
      val f = hfs(root)
      def lockExpiry(): Long = {
        val in = f.open(lock)
        val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        txt.split(" ")(2).toLong
      }
      val admin = TableVersions.claimAdmin(spark, root, "vacuum")
      try {
        val exp0 = lockExpiry()
        // sleep past the TTL: the heartbeat (ttl/3 cadence) must have
        // renewed the expiry, so the lock never looks stale and a
        // second claimant refuses instead of breaking it
        Thread.sleep(3000)
        assert(lockExpiry() > exp0, "heartbeat must advance the expiry")
        assert(lockExpiry() > System.currentTimeMillis(), "lock must still be live")
        val e = intercept[IllegalStateException] {
          TableVersions.claimAdmin(spark, root, "vacuum")
        }
        assert(e.getMessage.contains("administrative lock"), e.getMessage)
      } finally admin.release(spark, root)
      assert(!f.exists(lock), "release deletes the renewed lock")
      // the role is claimable again once released
      TableVersions.claimAdmin(spark, root, "vacuum").release(spark, root)
    }
  }
}
