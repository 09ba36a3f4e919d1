package graft
import org.apache.spark.sql.SparkSession

/** Generic per-query profiler: `runMain graft.ProfQ q86_sole_late_supplier ...`
  * times each named SparkEntry query through the noop sink at sf0.1
  * (warm-up + 2 measured, best-of — same protocol as Bench).
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      run(n)
      val best = math.min(run(n), run(n))
      println(f"PROFQ $n%-30s $best%7.3fs")
    }
    spark.stop()
  }
}
