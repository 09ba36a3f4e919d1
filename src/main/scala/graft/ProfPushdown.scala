package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfPushdown {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s"pushed=${s.metadata.getOrElse("PushedFilters", "?")} schema=${s.requiredSchema.simpleString}"
      }
      println(s"== $tag  rows=${df.count()}")
      scans.foreach(s => println(s"   $s"))
    }

    val loTs = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

    // NTZ layout read with inference off -> TimestampType from the scan
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val ntz = spark.read.parquet("/tmp/layouts/events_ntz.parquet")
    println("ntz-off ts type = " + ntz.schema("ts").dataType)
    show("NTZ (infer off) ts filter") { ntz.filter(col("ts") >= lit(loTs)).select("event_id") }
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")

    // adjusted-UTC layout
    val utc = spark.read.parquet("/tmp/layouts/events_utc.parquet")
    println("utc ts type = " + utc.schema("ts").dataType)
    show("UTC ts filter") { utc.filter(col("ts") >= lit(loTs)).select("event_id") }

    // nanos layout via legacy long: can a RAW long predicate push down?
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nan = spark.read.parquet("/tmp/layouts/events_nanos.parquet")
    println("nanos ts type = " + nan.schema("ts").dataType)
    val loNanos = loTs.getTime * 1000000L // ms -> ns (UTC wall = epoch here)
    show("NANOS raw long filter") { nan.filter(col("ts") >= lit(loNanos)).select("event_id") }
    show("NANOS derived filter (current shape)") {
      nan.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .filter(col("ts") >= lit(loTs)).select("event_id")
    }
    // value parity across layouts
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ts").cast("timestamp")).orderBy("ts").limit(3).collect().toSeq
    println("ntz vals  " + vals(ntz))
    println("utc vals  " + vals(utc))
    println("nan vals  " + vals(nan.withColumn("ts", timestamp_micros(expr("ts div 1000")))))
    spark.stop()
  }
}
