package graft
import org.apache.spark.sql.SparkSession
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(): Double = {
      val t0 = System.nanoTime()
      ExtQueries.q28AnnIvf(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9
    }
    run() // warm
    println(f"q28 runs: ${run()}%.2f ${run()}%.2f ${run()}%.2f")
    spark.stop()
  }
}
