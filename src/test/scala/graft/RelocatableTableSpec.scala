package graft

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** LOCATION-INDEPENDENT LAYOUT (format major 3): commits and
  * deletion-vector sidecars self-reference ROOT-RELATIVE, so a table
  * directory is a portable unit — a plain recursive copy of a
  * DV-carrying, change-feed-enabled table reads identically at the new
  * location (snapshot, time travel, AND the change feed), and
  * [[TableVersions.moveTable]] renames a table with one filesystem
  * move. Legacy tables whose metadata still holds absolute
  * self-references are rebased in place by the move (commit text
  * surgery + a same-filename sidecar content swap), proven here by
  * hand-ABSOLUTIZING a new-era table first — the exact inverse of the
  * rebase.
  */
class RelocatableTableSpec extends SparkSpec {
  import spark.implicits._

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionFiles(root: String): Seq[org.apache.hadoop.fs.Path] = {
    val f = hfs(root)
    f.listStatus(new org.apache.hadoop.fs.Path(root, "_versions")).toSeq
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".commit") ||
        s.getPath.getName.endsWith(".checkpoint")))
      .map(_.getPath)
  }

  private def readText(root: String, p: org.apache.hadoop.fs.Path): String = {
    val in = hfs(root).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def writeText(root: String, p: org.apache.hadoop.fs.Path, text: String): Unit = {
    val out = hfs(root).create(p, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Build a table exercising every path-carrying surface: appends,
    * a DV delete, a DV upsert with a change-data sidecar, compaction.
    */
  private def buildTable(root: String): Unit = {
    val tv = TableVersions
    tv.append(spark, root, (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(4))
    tv.setTableProperty(spark, root, TableVersions.ChangeFeedProp, "true")
    tv.deleteWhere(spark, root, col("k").isin(7L, 111L), maxDvFraction = 0.2)
    tv.upsert(spark, root, Seq((5L, "V5"), (900L, "v900")).toDF("k", "v"), "k",
      maxDvFraction = 0.2)
    tv.append(spark, root, Seq((901L, "v901")).toDF("k", "v"))
  }

  private def snapshotOf(root: String): Seq[(Long, String)] =
    TableVersions.read(spark, root).as[(Long, String)].collect().sorted.toSeq

  private def changesOf(root: String): Seq[(String, Long, Long)] =
    TableVersions.readChanges(spark, root, 1L,
        TableVersions.currentVersion(spark, root).get, updateImages = true)
      .select(col("_change_type"), col("_commit_version"), col("k"))
      .as[(String, Long, Long)].collect().sorted.toSeq

  test("no commit self-references the root absolutely; DV sidecars are relative") {
    val root = Files.createTempDirectory("rel11").toString + "/t"
    buildTable(root)
    val encRoot = URLEncoder.encode(root, "UTF-8")
    versionFiles(root).foreach { p =>
      val t = readText(root, p)
      assert(!t.contains(encRoot), s"absolute self-reference in ${p.getName}:\n$t")
    }
    assert(TableVersions.commitState(spark, root).dvs.nonEmpty, "table must carry DVs")
    val dvFiles = TableVersions.commitState(spark, root).dvs.values.map(_._1).toSeq.distinct
    val entries = spark.read.parquet(dvFiles: _*).select("file").as[String].collect()
    assert(entries.nonEmpty && entries.forall(e => !e.startsWith("/") && !e.contains(":")),
      s"sidecar entries must be root-relative, got ${entries.take(3).mkString(", ")}")
  }

  test("a recursive directory copy IS the table: reads, time travel, change feed") {
    val root = Files.createTempDirectory("rel11").toString + "/t"
    buildTable(root)
    val want = snapshotOf(root)
    val wantV2 = TableVersions.read(spark, root, Some(2L)).as[(Long, String)]
      .collect().sorted.toSeq
    val wantCh = changesOf(root)
    val copy = Files.createTempDirectory("rel11copy").toString + "/elsewhere/t2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(copy).getParent)
    // plain cp -r — no engine involved in the relocation
    import scala.sys.process._
    assert(Seq("cp", "-r", root, copy).! === 0)
    assert(snapshotOf(copy) === want)
    assert(TableVersions.read(spark, copy, Some(2L)).as[(Long, String)]
      .collect().sorted.toSeq === wantV2)
    assert(changesOf(copy) === wantCh)
    // both copies stay independently writable
    TableVersions.append(spark, copy, Seq((902L, "only-copy")).toDF("k", "v"))
    assert(snapshotOf(root) === want)
    assert(snapshotOf(copy).size === want.size + 1)
  }

  test("moveTable renames in one filesystem move; guards are loud") {
    val base = Files.createTempDirectory("rel11").toString
    val root = s"$base/t"
    buildTable(root)
    val want = snapshotOf(root)
    val wantCh = changesOf(root)
    TableVersions.moveTable(spark, root, s"$base/renamed/t")
    assert(!hfs(base).exists(new org.apache.hadoop.fs.Path(root)))
    assert(snapshotOf(s"$base/renamed/t") === want)
    assert(changesOf(s"$base/renamed/t") === wantCh)
    intercept[IllegalArgumentException] {
      TableVersions.moveTable(spark, s"$base/absent", s"$base/x")
    }
    TableVersions.append(spark, s"$base/other",
      Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      TableVersions.moveTable(spark, s"$base/other", s"$base/renamed/t")
    }
  }

  test("legacy absolute metadata: reads era-agnostically, moveTable rebases it") {
    val base = Files.createTempDirectory("rel11").toString
    val root = s"$base/t"
    buildTable(root)
    val want = snapshotOf(root)
    val wantCh = changesOf(root)
    // simulate a pre-relative table: absolutize every stored path — the
    // exact inverse of moveTable's rebase sweep
    def absolutize(v: String): String =
      if (v.startsWith("/") || v.contains(":")) v else s"$root/$v"
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    versionFiles(root).foreach { p =>
      val out = readText(root, p).split("\n", -1).map { l =>
        if (l.startsWith("#RM ")) "#RM " + enc(absolutize(dec(l.stripPrefix("#RM ").trim)))
        else if (l.startsWith("#DV ")) {
          val Array(_, fp, dvp, n) = l.split(" ", 4)
          s"#DV ${enc(absolutize(dec(fp)))} ${enc(absolutize(dec(dvp)))} $n"
        } else if (l.isEmpty || l.startsWith("#")) l
        else {
          val i = l.indexOf('\t')
          if (i < 0) l else enc(absolutize(dec(l.substring(0, i)))) + l.substring(i)
        }
      }.mkString("\n")
      writeText(root, p, out)
    }
    TableVersions.clearStateCache()
    val dvFiles = TableVersions.commitState(spark, root).dvs.values.map(_._1).toSeq.distinct
    dvFiles.foreach { dv =>
      val df = spark.read.parquet(dv)
        .select(udf(absolutize _).apply(col("file")).as("file"), col("pos"))
        .coalesce(1)
      val tmp = Files.createTempDirectory("rel11dv").toString
      df.write.mode("overwrite").parquet(tmp)
      val part = hfs(root).listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      hfs(root).delete(new org.apache.hadoop.fs.Path(dv), false)
      assert(hfs(root).rename(part, new org.apache.hadoop.fs.Path(dv)))
    }
    TableVersions.clearStateCache()
    // the absolutized (legacy-shaped) table still reads in place
    assert(snapshotOf(root) === want)
    assert(changesOf(root) === wantCh)
    // ...and the move rebases everything back to relative
    TableVersions.moveTable(spark, root, s"$base/moved/t")
    val newRoot = s"$base/moved/t"
    assert(snapshotOf(newRoot) === want)
    assert(changesOf(newRoot) === wantCh)
    val encOld = URLEncoder.encode(root, "UTF-8")
    versionFiles(newRoot).foreach { p =>
      assert(!readText(newRoot, p).contains(encOld),
        s"old-root reference survived the rebase in ${p.getName}")
    }
    // tombstones still apply at the new location (no resurrection)
    assert(!TableVersions.read(spark, newRoot).as[(Long, String)]
      .collect().exists(r => r._1 == 7L || r._1 == 111L))
  }
}
