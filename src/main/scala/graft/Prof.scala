package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-30s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$c")
    }
    val docs = Tables.t(spark, dir, "documents")
    time("just fingerprints col") {
      docs.select(col("doc_id"), operators.TextAnalysis.winnowingFingerprint(col("text")).as("f"))
        .selectExpr("sum(size(f))").head(); 1L
    }
    time("fingerprintDocs full") {
      operators.TextAnalysis.fingerprintDocs(docs, "doc_id").count()
    }
    time("q23 full") { ExtQueries.q23Fingerprint(spark, dir).count() }
    time("simhash col only") {
      // xor-fold, not sum: ANSI mode overflows summing 64-bit hashes
      docs.select(operators.Dedup.simHash(col("text")).as("sh"))
        .selectExpr("count(distinct sh)").head(); 1L
    }
    time("q19 full") { ExtQueries.q19SimHashDedup(spark, dir).count() }
    time("q21 full") { ExtQueries.q21EmbeddingNearDup(spark, dir).count() }
    spark.stop()
  }
}
