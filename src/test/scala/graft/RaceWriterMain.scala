package graft

/** Second-JVM writer for the cross-process commit-race spec: its own
  * SparkSession, its own state caches, nothing shared with the host
  * test process except the table DIRECTORY — the real multi-job shape
  * the commit protocol must survive. Appends tagged batches and mixes
  * in compactions so rewrite-vs-append conflicts actually occur.
  */
object RaceWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, nBatchesS, rowsPerS) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"race-writer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    if (tag == "vacuum") { // administrative-writer mode: nBatches = keepVersions
      try {
        graft.operators.TableVersions.vacuum(spark, root,
          keepVersions = nBatchesS.toInt, graceMs = rowsPerS.toLong)
        println("VACUUM_DONE")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("administrative lock") =>
          println("VACUUM_REFUSED")
      }
      spark.stop()
      return
    }
    val n = nBatchesS.toInt
    val rows = rowsPerS.toInt
    (0 until n).foreach { i =>
      val df = (0 until rows).map(j => (s"$tag-$i-$j", tag)).toDF("id", "writer").coalesce(1)
      graft.operators.TableVersions.append(spark, root, df)
      if (i % 3 == 2) { // rewrites racing the host's appends
        graft.operators.TableVersions.compact(spark, root, 8L << 20)
        ()
      }
    }
    println(s"RACE_WRITER_DONE $tag")
    spark.stop()
  }
}
