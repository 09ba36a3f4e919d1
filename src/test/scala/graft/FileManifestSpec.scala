package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{FileManifest, ZOrder}

/** Min/max manifest + manifest-pruned scans: stats agree with the data,
  * pruning is conservative (pruned scan ≡ full scan for the same
  * predicate) and actually skips files on sorted and Z-ordered layouts.
  */
class FileManifestSpec extends SparkSpec {
  import spark.implicits._

  test("manifest stats match per-file reality; string and numeric columns both covered") {
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    (1L to 1000L).map(i => (i, s"name_${"%04d".format(i)}"))
      .toDF("k", "name")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    val m = FileManifest.collect(spark, dir, Seq("k", "name"))
    assert(m.select("file").distinct().count() === 4)
    // footer stats must equal the scanned truth, file by file
    // key by basename: listStatus and input_file_name disagree on the
    // file:/ vs file:/// URI spelling of the same path
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val truth = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (base(r.getString(0)), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    FileManifest.collect(spark, dir, Seq("k")).collect().foreach { r =>
      val (mn, mx, n) = truth(base(r.getString(0)))
      assert(r.getDouble(4) === mn.toDouble && r.getDouble(5) === mx.toDouble)
      assert(r.getLong(2) === n)
    }
    val nameRow = m.filter(col("col") === "name").orderBy("min_str").head()
    assert(nameRow.isNullAt(4) && nameRow.getString(6).startsWith("name_"))
  }

  test("pruned scan on a range-sorted layout: fewer files opened, identical rows") {
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    (1L to 10000L).map(i => (i, i * 3 % 97)).toDF("k", "v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    val m = FileManifest.collect(spark, dir, Seq("k"))
    val bounds = Map("k" -> (2000.0, 2500.0))
    val cands = FileManifest.candidateFiles(m, bounds)
    assert(cands.size < 8 && cands.nonEmpty, s"expected pruning, got ${cands.size}/8 files")
    val pruned = FileManifest.prunedScan(spark, m, bounds)
    val full = spark.read.parquet(dir).filter(col("k") >= 2000.0 && col("k") <= 2500.0)
    assert(pruned.count() === full.count())
    assert(pruned.agg(sum("v")).head().getLong(0) === full.agg(sum("v")).head().getLong(0))
    assert(pruned.inputFiles.length < full.inputFiles.length)
  }

  test("Z-ordered layout: a 2-d box prunes files on BOTH dimensions, rows stay exact") {
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    val df = (0 until 20000).map { i =>
      val r = new scala.util.Random(i); (r.nextInt(1000).toLong, r.nextInt(1000).toLong, i.toLong)
    }.toDF("x", "y", "id")
    ZOrder.cluster(df, Seq("x", "y"), numFiles = 16).write.parquet(dir)
    val m = FileManifest.collect(spark, dir, Seq("x", "y"))
    val bounds = Map("x" -> (100.0, 160.0), "y" -> (700.0, 760.0))
    val cands = FileManifest.candidateFiles(m, bounds)
    assert(cands.size < 16, s"Z-order box should skip files, kept ${cands.size}/16")
    val pruned = FileManifest.prunedScan(spark, m, bounds)
    val full = spark.read.parquet(dir)
      .filter(col("x").between(100, 160) && col("y").between(700, 760))
    assert(pruned.count() === full.count() && full.count() > 0)
  }

  test("bloom index: point lookups open few files where min/max prunes nothing, rows exact") {
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    // ids SHUFFLED across files: every file's [min,max] spans ~the whole
    // domain, so range stats are useless — the bloom case
    val rnd = new scala.util.Random(7)
    rnd.shuffle((1L to 20000L).toList).map(i => (i, i % 1000))
      .toDF("k", "v").repartition(10).write.parquet(dir)
    val m = FileManifest.collect(spark, dir, Seq("k"))
    assert(FileManifest.candidateFiles(m, Map("k" -> (777.0, 777.0))).size === 10,
      "random layout: min/max must NOT prune (that is the point)")
    val bloom = FileManifest.collectBloom(spark, dir, "k", expectedItemsPerFile = 4000)
    val cands = FileManifest.filesForKey(bloom, lit(777L))
    assert(cands.nonEmpty && cands.size <= 3, s"bloom should admit ~1 file, got ${cands.size}")
    val hit = FileManifest.pointLookup(spark, bloom, "k", lit(777L)).collect()
    assert(hit.length === 1 && hit.head.getLong(0) === 777L && hit.head.getLong(1) === 777L)
    // absent key: exact filter kills any fpp admissions
    assert(FileManifest.pointLookup(spark, bloom, "k", lit(999999L)).count() === 0)
  }

  test("box outside every file's range: zero candidates, empty result, schema preserved") {
    val dir = Files.createTempDirectory("manifest").toString + "/t"
    (1L to 100L).map(i => (i, i)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    val m = FileManifest.collect(spark, dir, Seq("k"))
    assert(FileManifest.candidateFiles(m, Map("k" -> (5000.0, 6000.0))).isEmpty)
    val out = FileManifest.prunedScan(spark, m, Map("k" -> (5000.0, 6000.0)))
    assert(out.count() === 0 && out.columns.toSeq === Seq("k", "v"))
  }
}
