package graft
import org.apache.spark.sql.SparkSession
object PlanProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.autoBroadcastJoinThreshold","64m")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val q68 = Queries3.q68VolumeShipping(spark, dir)
    q68.collect()
    val p68 = q68.queryExecution.executedPlan.toString
    println("q68 broadcasts: " + "BroadcastHashJoin".r.findAllIn(p68).size + " bhj, " +
      "SortMergeJoin".r.findAllIn(p68).size + " smj")
    val q75 = Queries3.q75TfIdf(spark, dir)
    q75.collect()
    val p75 = q75.queryExecution.executedPlan.toString
    println("q75 WindowGroupLimit: " + p75.contains("WindowGroupLimit"))
    val q67 = Queries3.q67RangeJoin(spark, dir)
    q67.collect()
    println("q67 no NLJ: " + !q67.queryExecution.executedPlan.toString.contains("NestedLoop"))
    spark.stop()
  }
}
