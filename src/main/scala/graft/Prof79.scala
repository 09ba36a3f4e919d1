package graft
import org.apache.spark.sql.SparkSession
object Prof79 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.autoBroadcastJoinThreshold","64m")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9
    }
    for (q <- Seq("q79_band_join_bucketed","q76_topk_agg","q77_schema_evolution","q78_unpivot")) {
      run(q); println(f"$q: ${run(q)}%.2f ${run(q)}%.2f")
    }
    spark.stop()
  }
}
