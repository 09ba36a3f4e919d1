package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file COMPACTION PLANNER — the table-maintenance step every
  * long-lived lakehouse needs (the reference's BigQuery tables get this
  * from the service; a parquet lakehouse has to plan it itself, cf. the
  * OPTIMIZE/bin-packing pass in open table formats).
  *
  * Given a file listing (partition columns, file name, byte size), assign
  * each file to a target-size output bin: files are taken in listing
  * order within a partition and a file joins bin `floor(bytes-before-it /
  * targetBytes)` — i.e. a new bin starts once the running total has
  * covered another full target span. The rule is a pure integer function
  * of the listing (window cumsum + integer division), so the plan is
  * deterministic, engine-portable, and — the property that matters
  * operationally — REPRODUCIBLE: re-planning the same listing yields the
  * same bins, so a crashed compaction job can be re-run idempotently and
  * only the bins whose outputs are missing need to be rewritten.
  *
  * Scale: the input is METADATA (one row per file — millions of rows for
  * a 100 TB table, not billions), one window shuffle on the partition
  * key, per-bin rollup combines map-side. The data movement happens in
  * the executor that later rewrites each bin, never through the driver.
  * Bins can overshoot `targetBytes` by at most one file — the standard
  * bin-packing compromise that avoids splitting row groups across
  * outputs.
  */
object Compaction {

  /** Per-file bin assignment. Output = listing columns + `bin` (0-based
    * within the partition) + `bin_bytes`/`bin_files` (the totals of the
    * file's bin, window-broadcast back so the caller can filter to
    * undersized bins without a second join).
    */
  def plan(listing: DataFrame, partCols: Seq[String], fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = Window.partitionBy(partCols.map(col): _*).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBin = listing
      .withColumn("cum_before", coalesce(sum(col(bytesCol)).over(before), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
      .drop("cum_before")
    // Bin totals ride a second window over the same partitioning (no new
    // shuffle: the exchange on partCols is reused; `bin` is a function of
    // the existing ordering).
    val binW = Window.partitionBy((partCols.map(col) :+ col("bin")): _*)
    withBin
      .withColumn("bin_bytes", sum(col(bytesCol)).over(binW))
      .withColumn("bin_files", count(lit(1)).over(binW))
  }

  /** Plan over a REAL directory tree: lists `path` recursively through
    * the Hadoop FileSystem, derives the partition from the parent
    * directory relative to `path`, and applies [[plan]]. The listing is
    * collected driver-side — it is file METADATA (one status per file;
    * even a million files is ~100 MB), the same trade every table
    * format's manifest reader makes.
    */
  def planFs(spark: SparkSession, path: String, targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val rootUri = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")) {
        val rel = rootUri.relativize(fs.makeQualified(st.getPath).toUri).getPath
        val dir = rel.lastIndexOf('/') match { case -1 => ""; case i => rel.substring(0, i) }
        rows += ((dir, st.getPath.getName, st.getLen))
      }
    }
    import spark.implicits._
    plan(rows.toSeq.toDF("partition", "file", "bytes"),
      Seq("partition"), "file", "bytes", targetBytes)
  }
}
