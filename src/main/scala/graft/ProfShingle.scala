package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()
    def time(n: String)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$n%-30s ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    time("shingles explode count") {
      docs.select(explode(operators.Dedup.shingles(col("text"), 3)).as("s"))
        .agg(count(lit(1)), countDistinct(col("s"))).head()
    }
    spark.stop()
  }
}
