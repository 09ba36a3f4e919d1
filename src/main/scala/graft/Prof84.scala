package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof84 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f; val t1 = System.nanoTime(); f; val t2 = System.nanoTime()
      println(f"P84 $n%-30s ${math.min(t1-t0,t2-t1)/1e9}%7.3fs")
    }
    val o = Tables.t(spark, dir, "orders").withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
    val cols = Seq("o_orderkey","o_custkey","o_orderstatus","o_totalprice","o_orderdate","o_orderpriority")
    time("plain count") { o.agg(count(lit(1))).write.format("noop").mode("overwrite").save() }
    time("exact union profile") { analytics.DataChecks.profile(o, cols).write.format("noop").mode("overwrite").save() }
    time("approx profile") { analytics.DataChecks.profile(o, cols, approx = true).write.format("noop").mode("overwrite").save() }
    val raw = spark.read.parquet(s"$dir/orders.parquet").withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
    time("exact union on raw scan") { analytics.DataChecks.profile(raw, cols).write.format("noop").mode("overwrite").save() }
    time("approx on raw scan") { analytics.DataChecks.profile(raw, cols, approx = true).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
