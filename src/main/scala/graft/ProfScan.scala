package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    time("lineitem full-col count") {
      Tables.t(spark, dir, "lineitem").agg(sum(length(concat_ws(",", col("*")))).as("s")).head()
    }
    time("q01 as-is") { Queries.q01PricingSummary(spark, dir).write.format("noop").mode("overwrite").save() }
    time("q01 repartitioned") {
      Tables.t(spark, dir, "lineitem").repartition(32)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("q01 double-sum (no decimal)") {
      Tables.t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), sum(col("l_extendedprice")*(lit(1)-col("l_discount"))), sum(col("l_extendedprice")*(lit(1)-col("l_discount"))*(lit(1)+col("l_tax"))), sum(col("l_discount")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
