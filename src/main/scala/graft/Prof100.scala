package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f; val t1 = System.nanoTime()
      println(f"P100 $n%-28s ${(t1-t0)/1e9}%7.3fs")
    }
    graft.expressions.GraftFunctions.register(spark)
    val base = Tables.t(spark, dir, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val planted = base.filter(col("vec_id") < 20).select((col("vec_id") + 100000).as("vec_id"), transform(col("vec"), x => x + lit(0.01)).as("vec"))
    val all = base.unionByName(planted)
    val cents = graft.operators.IvfIndex.frozenCentroids(16, 64)
    val assigned = graft.operators.IvfIndex.assignWith(all, cents.map { case (c, a) => (c.toLong, a) }, "vec")
    val withNorm = assigned.withColumn("nrm", sqrt(call_function("vec_dot", col("vec"), col("vec"))))
    val lhs = withNorm.select(col("cluster_id"), col("vec_id").as("id_a"), col("vec").as("va"), col("nrm").as("na"))
    val rhs = withNorm.select(col("cluster_id"), col("vec_id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb"))
    val edges = lhs.join(rhs, Seq("cluster_id")).filter(col("id_a") < col("id_b"))
      .filter(call_function("vec_dot", col("va"), col("vb")) / (col("na") * col("nb")) >= 0.95)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    time("edges only") { edges.write.format("noop").mode("overwrite").save() }
    time("edges + CC clusters") {
      graft.operators.ConnectedComponents.clusters(edges, "src", "dst").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
