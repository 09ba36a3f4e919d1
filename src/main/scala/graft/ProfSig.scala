package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** A/B harness for the LSH signature implementations. */
object ProfSig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val em = Tables.t(spark, dir, "embeddings")
      .repartition(8)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .cache()
    em.count()

    def plane(p: Int, dims: Int): Array[Double] =
      Array.tabulate(dims) { d =>
        var z = 0x9E3779B97F4A7C15L * (p * 1024L + d + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (math.abs(z % 2000001L) - 1000000L) / 1000000.0
      }

    def sigFold(vec: Column, numBits: Int, dims: Int): Column = {
      val bits = (0 until numBits).map { p =>
        val proj = aggregate(
          zip_with(vec, typedLit(plane(p, dims)), (x, c) => coalesce(x * c, lit(0.0))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    }
    def sigVecDot(vec: Column, numBits: Int, dims: Int): Column = {
      val bits = (0 until numBits).map { p =>
        val proj = call_function("vec_dot", vec, typedLit(plane(p, dims)))
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    }

    def time(n: String)(c: => Column): Unit = {
      // warm
      em.select(c.as("s")).selectExpr("count(distinct s)").head()
      val t0 = System.nanoTime()
      val r = em.select(c.as("s")).selectExpr("count(distinct s)").head().getLong(0)
      println(f"$n%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs distinct=$r")
    }
    time("fold48")(sigFold(col("vec"), 48, 64))
    time("vecdot48")(sigVecDot(col("vec"), 48, 64))
    time("fold16")(sigFold(col("vec"), 16, 64))
    time("vecdot16")(sigVecDot(col("vec"), 16, 64))
    spark.stop()
  }
}
