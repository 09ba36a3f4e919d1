package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof23 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()
    def time(n: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; val t1 = System.nanoTime()
      f; val t2 = System.nanoTime()
      println(f"P23 $n%-34s ${math.min(t1-t0, t2-t1)/1e9}%7.3fs")
    }
    time("xxhash64 winnowing (prod)") {
      operators.TextAnalysis.fingerprintDocs(docs, "doc_id").write.format("noop").mode("overwrite").save()
    }
    time("portable winnowing (conv long)") {
      operators.TextAnalysis.fingerprintDocs(docs, "doc_id", portable = true).write.format("noop").mode("overwrite").save()
    }
    // md5 grams alone (no winnow): how much is hashing?
    time("md5+conv grams only") {
      docs.select(col("doc_id"), transform(
        sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
        i => conv(substring(md5(col("text").substr(i, lit(8))), 1, 15), 16, 10).cast("long")).as("g"))
        .select(col("doc_id"), size(col("g")).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("md5 grams only (no conv)") {
      docs.select(col("doc_id"), transform(
        sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
        i => substring(md5(col("text").substr(i, lit(8))), 1, 15)).as("g"))
        .select(col("doc_id"), size(col("g")).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("xxhash grams only") {
      docs.select(col("doc_id"), transform(
        sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
        i => xxhash64(col("text").substr(i, lit(8)))).as("g"))
        .select(col("doc_id"), size(col("g")).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
