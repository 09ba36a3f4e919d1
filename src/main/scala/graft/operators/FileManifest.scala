package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level MIN/MAX statistics manifest + manifest-pruned scans — the
  * data-skipping layer every open table format (Delta/Iceberg/Hudi)
  * builds over parquet, done here directly: parquet footers already
  * carry per-column min/max/null-count per row group; the manifest
  * aggregates them PER FILE into a queryable DataFrame, and
  * [[prunedScan]] consults it to hand Spark only the files a range
  * predicate can possibly touch.
  *
  * Why this matters at 100 TB: partition pruning skips directories and
  * row-group stats skip WITHIN a file that is already being read — but
  * Spark still lists, opens and footer-reads every file of every
  * non-partition-pruned directory. With a sorted or Z-ordered layout
  * ([[ZOrder.cluster]] — whose scaladoc promises exactly this
  * min/max skipping), a manifest turns a 10,000-file table scan into a
  * handful of file reads decided from ONE small metadata table.
  *
  * Scale shape: [[collect]] reads FOOTERS only (a few KB per file, no
  * data pages), distributed over the executors — the file list is the
  * only driver-side state, the same trade every manifest writer makes.
  * The manifest itself is one row per (file, column): millions of rows
  * for a 100 TB table — a small DataFrame, typically persisted next to
  * the table and incrementally maintained per write (append new files'
  * rows; [[Compaction]] bins replace their inputs' rows).
  *
  * Pruning is CONSERVATIVE by construction: a file is dropped only when
  * its recorded [min, max] provably cannot intersect the predicate;
  * files with absent/unreadable stats are kept. The pruned scan's rows
  * therefore always equal the unpruned scan's rows for the same
  * predicate (spec-pinned, including on Z-ordered multi-column boxes).
  */
object FileManifest {

  /** Build the manifest for `statCols` of the parquet table at `path`:
    * one row per (file, column) with
    * (file, n_bytes, n_rows, col, min_num, max_num, min_str, max_str,
    * null_count). Numeric parquet types fill `*_num` (long/int/float/
    * double widened to double — exact through 2⁵³, the usual stats
    * compromise); binary/UTF8 fill `*_str`; a column chunk without
    * statistics yields nulls (→ never pruned).
    */
  def collect(spark: SparkSession, path: String, statCols: Seq[String]): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
            !s.getPath.getName.startsWith("_"))
          .map(s => (s.getPath.toString, s.getLen))
      else Seq((fs.makeQualified(root).toString, fs.getFileStatus(root).getLen))
    collectFiles(spark, files, statCols)
  }

  /** [[collect]] over an EXPLICIT file list — the versioned-table path
    * ([[TableVersions]]), where the live file set comes from a commit
    * manifest rather than a directory listing.
    */
  def collectFiles(spark: SparkSession, files: Seq[(String, Long)],
      statCols: Seq[String]): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    // Hadoop Configuration is not serializable — ship its entries and
    // rebuild per executor partition (footer reads happen ON executors).
    val confPairs = hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    val cols = statCols
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism).max(1))
      .mapPartitions { it =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confPairs.foreach { case (k, v) => c.set(k, v) }
        it.flatMap { case (file, nBytes) =>
          statsOfFile(c, file, nBytes, cols).map { t =>
            (t._1, t._2, t._3, t._4,
              t._5.map(Double.box).orNull, t._6.map(Double.box).orNull,
              t._7.orNull, t._8.orNull, t._9)
          }
        }
      }
      .toDF("file", "n_bytes", "n_rows", "col",
        "min_num", "max_num", "min_str", "max_str", "null_count")
  }

  /** Footer stats of ONE file, one tuple per stat column — shared by
    * the distributed pass above and [[TableVersions]]' driver-side
    * SMALL-BATCH path (a 1-file streaming append must not pay a whole
    * Spark job for one footer read).
    */
  def statsOfFile(c: org.apache.hadoop.conf.Configuration, file: String, nBytes: Long,
      cols: Seq[String]): Seq[(String, Long, Long, String, Option[Double], Option[Double],
        Option[String], Option[String], Long)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), c))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val nRows = blocks.map(_.getRowCount).sum
      cols.map { cn =>
        var minN: Option[Double] = None; var maxN: Option[Double] = None
        var minS: Option[String] = None; var maxS: Option[String] = None
        var nulls = 0L
        var statsOk = true
        for (b <- blocks; cc <- b.getColumns.asScala
             if cc.getPath.toDotString == cn) {
          val st = cc.getStatistics
          if (st == null || !st.hasNonNullValue) statsOk = false
          else {
            nulls += (if (st.isNumNullsSet) st.getNumNulls else 0L)
            (st.genericGetMin, st.genericGetMax) match {
              case (mn: Number, mx: Number) =>
                minN = Some(minN.fold(mn.doubleValue)(_ min mn.doubleValue))
                maxN = Some(maxN.fold(mx.doubleValue)(_ max mx.doubleValue))
              case (mn: org.apache.parquet.io.api.Binary,
                    mx: org.apache.parquet.io.api.Binary) =>
                val (a, z) = (mn.toStringUsingUTF8, mx.toStringUsingUTF8)
                minS = Some(minS.fold(a)(p => if (a < p) a else p))
                maxS = Some(maxS.fold(z)(p => if (z > p) z else p))
              case _ => statsOk = false
            }
          }
        }
        if (!statsOk) { minN = None; maxN = None; minS = None; maxS = None }
        (file, nBytes, nRows, cn, minN, maxN, minS, maxS, nulls)
      }
    } finally reader.close()
  }

  /** Files that can contain rows with `lo <= colName <= hi` — i.e. drop
    * only files whose recorded range provably misses the box on SOME
    * bound column. `bounds` may cover several columns (the Z-order use
    * case: a box over all clustered dimensions).
    */
  def candidateFiles(manifest: DataFrame, bounds: Map[String, (Double, Double)]): Seq[String] = {
    val prunable = bounds.foldLeft(lit(false)) { case (acc, (cn, (lo, hi))) =>
      acc || (col("col") === cn && col("min_num").isNotNull &&
        (col("max_num") < lo || col("min_num") > hi))
    }
    val dropped = manifest.filter(prunable).select("file").distinct()
    manifest.select("file").distinct()
      .join(dropped, Seq("file"), "left_anti")
      .collect().map(_.getString(0)).toSeq
  }

  /** Per-file BLOOM index for point-lookup pruning on a
    * high-cardinality key — the case min/max stats cannot help with: a
    * randomly-distributed id column spans nearly the full domain in
    * EVERY file, so range stats prune nothing, while a bloom filter
    * answers "could this file contain key X" in ~1.4 bytes/key at
    * fpp≈3% (the Delta bloom-index trade). One distributed scan builds
    * the whole index: per-file aggregation of Spark's native
    * `BloomFilterAggregate` grouped by `input_file_name()` — the blooms
    * are file-local by construction, no shuffle of the key column
    * beyond the (file, bloom-partial) combine.
    *
    * Keys are hashed with `xxhash64` before insertion; lookups must
    * hash the SAME way at the same type ([[filesForKey]] does).
    */
  def collectBloom(spark: SparkSession, path: String, keyCol: String,
      expectedItemsPerFile: Long = 1000000L): DataFrame = {
    BloomJoin.register(spark)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(call_function("graft_bloom_agg", xxhash64(col(keyCol)),
        lit(expectedItemsPerFile)).as("bloom"))
  }

  /** Files whose bloom admits `key` (false positives possible, false
    * negatives not — pruning stays conservative). The probe
    * deserializes Spark's sketch format per row in a `mapPartitions`
    * over the METADATA-scale index (one row per file):
    * `BloomFilterMightContain` insists on a CONSTANT filter, so a
    * per-row bloom column can't be probed as a Catalyst expression —
    * the same "not expressible as an Expression" exemption class as
    * the media codecs.
    */
  def filesForKey(bloomIndex: DataFrame, key: Column): Seq[String] = {
    val spark = bloomIndex.sparkSession
    // hash EXACTLY as collectBloom inserted: evaluate xxhash64(key) once
    val h = spark.range(1).select(xxhash64(key)).head().getLong(0)
    import spark.implicits._
    bloomIndex.select(col("file"), col("bloom")).as[(String, Array[Byte])]
      .mapPartitions(_.filter { case (_, bytes) =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes)).mightContainLong(h)
      }.map(_._1))
      .collect().toSeq
  }

  /** Point lookup through the bloom index: open only admitting files,
    * then apply the exact predicate (kills the fpp tail). Row-equal to
    * the full scan with the same predicate.
    */
  def pointLookup(spark: SparkSession, bloomIndex: DataFrame, keyCol: String,
      key: Column): DataFrame = {
    val files = filesForKey(bloomIndex, key)
    if (files.isEmpty)
      spark.read.parquet(bloomIndex.select("file").first().getString(0))
        .limit(0).filter(col(keyCol) === key)
    else spark.read.parquet(files: _*).filter(col(keyCol) === key)
  }

  /** Manifest-pruned parquet scan: read only the candidate files for the
    * numeric box `bounds`, then apply the exact predicate (the manifest
    * decides which FILES to open; the row-level filter still runs and
    * still pushes into those files' row groups). Row-equal to the full
    * scan with the same predicate, by the conservative-pruning argument.
    */
  def prunedScan(spark: SparkSession, manifest: DataFrame,
      bounds: Map[String, (Double, Double)]): DataFrame = {
    val files = candidateFiles(manifest, bounds)
    val df =
      if (files.isEmpty)
        // empty-by-stats: preserve the schema via one file's footer, read no rows
        spark.read.parquet(manifest.select("file").first().getString(0)).limit(0)
      else spark.read.parquet(files: _*)
    bounds.foldLeft(df) { case (d, (cn, (lo, hi))) =>
      d.filter(col(cn) >= lo && col(cn) <= hi)
    }
  }
}
