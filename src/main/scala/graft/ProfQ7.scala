package graft
import org.apache.spark.sql.SparkSession

/** Round-7 spot bench: time individual SparkEntry queries at sf0.1 with
  * the Bench session shape (warm + best-of-2), for before/after deltas
  * on targeted optimizations without a full bench pass.
  */
object ProfQ7 {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q100_semdedup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      CacheScope.drainCheckpoints()
      s
    }
    names.foreach(run) // warm
    CacheScope.drain()
    names.foreach { n =>
      val a = run(n); val b = run(n)
      println(f"PROFQ7 $n%-24s ${math.min(a, b)}%7.3fs  (p1=$a%.3f p2=$b%.3f)")
      CacheScope.drain()
    }
    spark.stop()
  }
}
