package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.operators.TableVersions

/** A filesystem with OBJECT-STORE rename semantics: copy + delete,
  * non-atomic, and it CLOBBERS an existing destination — the GCS/S3
  * Hadoop-connector shape that breaks "rename as claim". Backed by the
  * local disk so everything else behaves normally.
  */
class TornRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.FileStatus
  override def getUri: java.net.URI = java.net.URI.create("torn:///")
  // RawLocal's lazy permission loading does new File(uri) and chokes on
  // the torn: scheme — return statuses with permissions pre-filled
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault, "u", "g", s.getPath)
  override def getFileStatus(p: Path): FileStatus = eager(super.getFileStatus(p))
  override def listStatus(p: Path): Array[FileStatus] = super.listStatus(p).map(eager)
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // directory renames (task committers) delegate; FILE rename — the
    // operation a claim protocol would lean on — is copy+clobber+delete
    if (getFileStatus(src).isDirectory) return super.rename(src, dst)
    val in = open(src)
    val out = create(dst, true)
    org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, true)
    delete(src, false)
    true
  }
}

/** Scheme stand-ins for the default-LogStore dispatch tests: only the
  * URI scheme matters (logStoreFor never touches the store).
  */
class SchemeOnlyS3aFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}
class SchemeOnlyAbfssFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("abfss:///")
}

/** OBJECT-STORE COMMIT SEAM: the claim primitive is pluggable per
  * filesystem scheme (the Delta LogStore architecture). On a store
  * whose rename is copy+delete+clobber, the format must either REFUSE
  * loudly (unknown scheme, no configured store) or stay correct
  * (conditional-create claims — GCS/S3's native atomic
  * create-if-absent). Rename-atomic stores keep the existing path
  * byte-for-byte.
  */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private val hconf = spark.sparkContext.hadoopConfiguration
  hconf.setIfUnset("fs.torn.impl", classOf[TornRenameFileSystem].getName)

  private def newTornRoot(): String =
    "torn://" + Files.createTempDirectory("lstore").toString + "/tbl"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("unknown scheme with no configured LogStore refuses loudly before any commit") {
    val root = newTornRoot()
    val e = intercept[IllegalStateException] {
      TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "v").coalesce(1))
    }
    assert(e.getMessage.contains("graft.table.logstore.torn"),
      s"the refusal must name the conf that fixes it: ${e.getMessage}")
    assert(TableVersions.currentVersion(spark, root).isEmpty, "nothing may have committed")
  }

  test("conditional-create claims stay correct where rename is copy+delete+clobber") {
    withConf("graft.table.logstore.torn" -> "conditional-create") {
      val root = newTornRoot()
      TableVersions.append(spark, root, (1L to 100L).toDF("k").coalesce(2))
      TableVersions.append(spark, root, (101L to 150L).toDF("k").coalesce(1))
      TableVersions.deleteWhere(spark, root, org.apache.spark.sql.functions.col("k") <= 10L)
      assert(TableVersions.read(spark, root).count() === 140)
      assert(TableVersions.read(spark, root, Some(1L)).count() === 150, "time travel intact")
      assert(TableVersions.history(spark, root).count() === 3)

      // the claim primitive itself: two publishes of one name — exactly one wins
      val f = new Path(root).getFileSystem(hconf)
      val store = TableVersions.logStoreFor(spark, f)
      assert(store === TableVersions.ConditionalCreateLogStore)
      val dir = new Path(root, "_versions")
      val tgt = new Path(dir, "vclaim.probe")
      assert(store.putIfAbsent(f, dir, tgt, "one".getBytes))
      assert(!store.putIfAbsent(f, dir, tgt, "two".getBytes),
        "a second claim of the same name must lose")
      val in = f.open(tgt)
      val got = try new String(in.readAllBytes()) finally in.close()
      assert(got === "one", "the losing claim must not clobber the winner")
    }
  }

  test("s3/azure schemes refuse by default: stock S3A create(false) is check-then-put") {
    // scheme-only stand-ins: logStoreFor dispatches on f.getUri.getScheme
    // (plain set: core-default already maps fs.s3a.impl to the real —
    // absent-from-classpath — S3AFileSystem)
    hconf.set("fs.s3a.impl", classOf[SchemeOnlyS3aFileSystem].getName)
    hconf.set("fs.abfss.impl", classOf[SchemeOnlyAbfssFileSystem].getName)
    val s3 = new Path("s3a://bkt/x").getFileSystem(hconf)
    val az = new Path("abfss://c@a/x").getFileSystem(hconf)
    val e1 = intercept[IllegalStateException] { TableVersions.logStoreFor(spark, s3) }
    assert(e1.getMessage.contains("fs.s3a.create.conditional") &&
      e1.getMessage.contains("graft.table.logstore.s3a"),
      s"the refusal must document the Hadoop conditional-write requirement and the " +
        s"opt-in conf: ${e1.getMessage}")
    val e2 = intercept[IllegalStateException] { TableVersions.logStoreFor(spark, az) }
    assert(e2.getMessage.contains("graft.table.logstore.abfss"), e2.getMessage)
    // the escape hatch stays: confirmed conditional-create opts in
    withConf("graft.table.logstore.s3a" -> "conditional-create") {
      assert(TableVersions.logStoreFor(spark, s3) === TableVersions.ConditionalCreateLogStore)
    }
    withConf("graft.table.logstore.abfss" -> "rename") {
      assert(TableVersions.logStoreFor(spark, az) === TableVersions.RenameLogStore)
    }
  }

  test("explicit conf overrides; bad values refuse; local scheme stays on rename") {
    val f = new Path("/tmp").getFileSystem(hconf)
    assert(TableVersions.logStoreFor(spark, f) === TableVersions.RenameLogStore,
      "file:// defaults to the rename/link claim")
    withConf("graft.table.logstore.file" -> "conditional-create") {
      assert(TableVersions.logStoreFor(spark, f) === TableVersions.ConditionalCreateLogStore)
    }
    withConf("graft.table.logstore.file" -> "bogus") {
      intercept[IllegalArgumentException] { TableVersions.logStoreFor(spark, f) }
    }
  }
}
