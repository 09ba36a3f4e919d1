package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: micro-time small parquet writes under different partition
  * counts and committer settings — attributes the table-format `stage`
  * phase (the bench's dominant table cost) to task count vs committer
  * overhead vs codec, on this box.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val orders = Tables.t(spark, dir, "orders").cache()
    println(s"orders rows=${orders.count()}")
    def time[A](tag: String, n: Int = 5)(body: => A): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/op")
    }
    val base = java.nio.file.Files.createTempDirectory("stageprobe").toString
    var i = 0
    def out(): String = { i += 1; s"$base/w$i" }
    time("write 32-part (as appendInternal does)") {
      orders.write.parquet(out())
    }
    time("write rebalance-coalesced") {
      orders.hint("rebalance").write.parquet(out())
    }
    time("write coalesce(1)") {
      orders.coalesce(1).write.parquet(out())
    }
    val fewRows = orders.limit(2000).cache()
    fewRows.count()
    time("tiny df (2k rows, 1 scan part) write") {
      fewRows.write.parquet(out())
    }
    time("tiny df repartitioned 32 write") {
      fewRows.repartition(32).write.parquet(out())
    }
    // committer knobs
    spark.conf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    time("write 32-part, no _SUCCESS") {
      orders.write.parquet(out())
    }
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    time("write 32-part, no _SUCCESS, committer v2") {
      orders.write.parquet(out())
    }
    // count files of a 32-part write
    val d = out()
    orders.write.parquet(d)
    val files = new java.io.File(d).listFiles().count(f => f.getName.endsWith(".parquet"))
    println(s"files per 32-part write: $files")
    // does DataFrameWriter.option() pass hadoop committer conf through?
    spark.conf.unset("mapreduce.fileoutputcommitter.marksuccessfuljobs")
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    val d2 = out()
    orders.write
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(d2)
    val hasSuccess = new java.io.File(d2).listFiles().exists(_.getName == "_SUCCESS")
    println(s"option-passthrough _SUCCESS suppressed: ${!hasSuccess}")
    time("write 32-part, v1 + _SUCCESS via session (control)") {
      orders.write.parquet(out())
    }
    time("write 32-part, committer opts via write.option") {
      orders.write
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(out())
    }
    // read-side cost of many tiny files vs one
    val many = out(); val one = out()
    orders.write.parquet(many)
    orders.coalesce(1).write.parquet(one)
    time("read 32-file table (full scan agg)") {
      spark.read.parquet(many).agg(sum(col("o_totalprice"))).collect()
    }
    time("read 1-file table (full scan agg)") {
      spark.read.parquet(one).agg(sum(col("o_totalprice"))).collect()
    }
    // tiny-batch rebalance vs plain (the ETL route shape: ~13k rows)
    val route = orders.limit(13000).cache(); route.count()
    time("route-size write plain (32 tasks)") { route.write.parquet(out()) }
    time("route-size write rebalance") { route.hint("rebalance").write.parquet(out()) }
    // dynamic partition overwrite composed with the v2/no-marker opts
    // (the index pair-log shape): correctness check, not a timing
    val dp = out()
    def dpw(b: Long, n: Int): Unit = orders.limit(n)
      .withColumn("batch_id", lit(b))
      .write.mode("overwrite")
      .options(graft.operators.WriteOpts.data)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dp)
    dpw(0L, 100); dpw(1L, 50); dpw(0L, 70) // replay overwrites batch 0 only
    val counts = spark.read.parquet(dp)
      .groupBy(col("batch_id").cast("long").as("batch_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"dynamic-overwrite with v2 opts correct: ${counts == Map(0L -> 70L, 1L -> 50L)} ($counts)")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
