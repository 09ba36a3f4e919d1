package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so
  * scale properties are reviewable (pushdown reaching the scan, broadcast
  * vs shuffle joins, WindowGroupLimit top-k, shuffle counts).
  * Usage: runMain graft.PlanProbe [sfDir] [query ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_regional_revenue",
        "q04_top_orders_per_customer", "q43_asof_join")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
