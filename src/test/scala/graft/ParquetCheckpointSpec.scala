package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions
import graft.operators.TableVersions.{ColStats, CommitState, FileEntry}

/** PARQUET CHECKPOINTS (format major 4): above a file-count threshold
  * the checkpoint's O(#files) listing is written as a parquet dataset
  * (`v<N>.ckptpq/`) beside a scalar-only text form — columnar,
  * distributed-decodable, the Delta parquet-checkpoint architecture —
  * and reconstruction through it must be STATE-IDENTICAL to the text
  * path (file order, stats, partition values, DV references included).
  * Losing the dataset must degrade to the commit-chain walk, never to
  * a wrong answer; a pre-parquet reader must refuse the major-4 text
  * rather than parse an empty table.
  */
class ParquetCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("pqckpt").toString + "/tbl"

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ckptText(root: String, v: Long): String = {
    val p = new org.apache.hadoop.fs.Path(root, s"_versions/v$v.checkpoint")
    val in = hfs(root).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("parquet-checkpoint reconstruction state-equals the text path on a mixed log") {
    val root = newRoot()
    // build a mixed log under TEXT checkpoints (threshold never trips)
    withConf("graft.table.checkpointInterval" -> "3") {
      TableVersions.append(spark, root,
        (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4))   // v0
      TableVersions.setTableProperty(spark, root, TableVersions.ChangeFeedProp, "true") // v1
      TableVersions.deleteWhere(spark, root, col("k").isin(7L, 111L),
        maxDvFraction = 0.2)                                                // v2 (DV)
      TableVersions.upsert(spark, root,
        Seq((5L, "V5"), (900L, "v900")).toDF("k", "v"), "k")                // v3 (+ckpt)
      TableVersions.renameColumn(spark, root, "v", "label")                 // v4
      TableVersions.appendTxn(spark, root,
        Seq((901L, "x901")).toDF("k", "label").coalesce(1), "s", 9L)        // v5
    }
    val latest = TableVersions.currentVersion(spark, root).get
    assert(latest === 5L)
    val want = (0L to latest).map(v => v -> TableVersions.commitState(spark, root, Some(v))).toMap
    assert(want(2L).dvs.nonEmpty, "precondition: the log must carry DVs at the delete step")

    // rewrite EVERY version's checkpoint in the parquet-backed form
    val f = hfs(root)
    withConf("graft.table.parquetCheckpointThreshold" -> "1") {
      (0L to latest).foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(root, s"_versions/v$v.checkpoint"), false)
        TableVersions.writeCheckpoint(spark, root, v, want(v))
        val t = ckptText(root, v)
        assert(t.startsWith("#FORMAT 4\n") && t.contains("#FILESPQ "),
          s"v$v checkpoint must be parquet-backed:\n$t")
        assert(f.exists(new org.apache.hadoop.fs.Path(root, s"_versions/v$v.ckptpq/_SUCCESS")))
      }
      TableVersions.clearStateCache()
      (0L to latest).foreach { v =>
        assert(TableVersions.commitState(spark, root, Some(v)) === want(v),
          s"v$v reconstructed through the parquet checkpoint must equal the text-path state")
      }
      // reads (including the DV anti-join) serve identically
      assert(TableVersions.read(spark, root).count() === 400)
      assert(TableVersions.read(spark, root).select("k").as[Long].collect().toSet
        .intersect(Set(7L, 111L)) === Set.empty)

      // losing the dataset degrades to the commit-chain walk, never a wrong answer
      f.delete(new org.apache.hadoop.fs.Path(root, s"_versions/v$latest.ckptpq"), true)
      TableVersions.clearStateCache()
      assert(TableVersions.commitState(spark, root, Some(latest)) === want(latest),
        "missing parquet dataset must fall back to the chain walk")

      // vacuum sweeps ckptpq dirs below the horizon together with their text twins
      TableVersions.vacuum(spark, root, keepVersions = 2, graceMs = 0L)
      (0L until latest - 1).foreach { v =>
        assert(!f.exists(new org.apache.hadoop.fs.Path(root, s"_versions/v$v.ckptpq")),
          s"v$v.ckptpq must be swept below the retention horizon")
      }
      assert(TableVersions.read(spark, root).count() === 400, "retained version still reads")
    }
  }

  test("10k-file round trip: order, stats, DVs exact; file-index pruning parity") {
    val root = newRoot()
    TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "v").coalesce(1)) // claims v0
    // synthetic 10k-entry state: stats make files provably disjoint on k
    val n = 10000
    val entries = (0 until n).map { i =>
      FileEntry(s"$root/data/f$i.parquet", 1000L + i, 100L,
        if (i % 3 == 0) Map("dt" -> s"2026-01-${(i % 28) + 1}") else Map.empty,
        Map("k" -> ColStats(Some(i * 100.0), Some(i * 100.0 + 99.0), None, None, if (i % 5 == 0) 3L else 0L),
          "name" -> ColStats(None, None, Some(s"a$i"), Some(s"z$i"), 0L)))
    }
    val dvs = (0 until n by 997).map(i =>
      s"$root/data/f$i.parquet" -> (s"$root/data/dv-x/s$i.parquet", (i % 7 + 1).toLong)).toMap
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val synthetic = CommitState(entries, Some(schema.json), Seq.empty,
      Map("app" -> 42L), Map("k_pos" -> "k >= 0"), dvs, Set.empty, Map("p" -> "1"))

    val f = hfs(root)
    withConf("graft.table.parquetCheckpointThreshold" -> "1") {
      f.delete(new org.apache.hadoop.fs.Path(root, "_versions/v0.checkpoint"), false)
      TableVersions.writeCheckpoint(spark, root, 0L, synthetic)
    }
    assert(ckptText(root, 0L).startsWith("#FORMAT 4\n"))
    TableVersions.clearStateCache()
    val got = TableVersions.commitState(spark, root, Some(0L))
    assert(got.files === synthetic.files, "10k entries: order + stats + partitions exact")
    assert(got.dvs === synthetic.dvs && got === synthetic)

    // pruning parity: the reconstructed state drives GraftFileIndex to the
    // exact same file-skipping decisions as the in-memory original
    val idxA = new graft.sources.GraftFileIndex(spark, root, synthetic, schema)
    val idxB = new graft.sources.GraftFileIndex(spark, root, got, schema)
    val pred = spark.sessionState.sqlParser.parseExpression(
      "k >= 500000 AND k < 510000")
    def kept(ix: graft.sources.GraftFileIndex) =
      ix.listFiles(Nil, Seq(pred)).flatMap(_.files).map(_.getPath.toString).toSet
    val (a, b) = (kept(idxA), kept(idxB))
    assert(a === b, "pruning decisions must be identical through the parquet round trip")
    assert(a.size < n / 50, s"the predicate must actually prune (kept ${a.size} of $n)")
    val nullPred = spark.sessionState.sqlParser.parseExpression("k IS NULL")
    def keptN(ix: graft.sources.GraftFileIndex) =
      ix.listFiles(Nil, Seq(nullPred)).flatMap(_.files).map(_.getPath.toString).toSet
    assert(keptN(idxA) === keptN(idxB), "null-count pruning parity")
  }

  test("a pre-parquet reader refuses a major-4 checkpoint loudly (text parse)") {
    // the guard lives in parseCommitText: majors above the reader's are
    // refused — simulate by writing a FUTURE major and reading
    val root = newRoot()
    TableVersions.append(spark, root, Seq((1L, "a")).toDF("k", "v"))
    val f = hfs(root)
    val p = new org.apache.hadoop.fs.Path(root, "_versions/v0.checkpoint")
    val out = f.create(p, true)
    try out.write("#FORMAT 99\n#END 0\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    TableVersions.clearStateCache()
    val e = intercept[IllegalStateException] {
      TableVersions.commitState(spark, root, Some(0L))
    }
    assert(e.getMessage.contains("format major 99"))
  }
}
