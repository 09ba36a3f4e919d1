package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Multimodal

object ProfMedia {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PM $n%-28s ${(System.nanoTime()-t0)/1e9}%7.3fs")
    }
    val base = Multimodal.syntheticCorpus(spark, 600)
    time("gen+count") { base.count() }
    val copies = Multimodal.perturbImages(base, 2)
    time("perturb+count") { copies.count() }
    val all = base.unionAll(copies)
    time("features") { Multimodal.extractFeatures(all).toDF().count() }
    time("nearDupGroups full") { Multimodal.nearDupGroups(all).write.format("noop").mode("overwrite").save() }
    CacheScope.drain()
    time("nearDupGroups again") { Multimodal.nearDupGroups(all).write.format("noop").mode("overwrite").save() }
    CacheScope.drain()
    time("nearDup thr=0.9999") { Multimodal.nearDupGroups(all, threshold = 0.9999).write.format("noop").mode("overwrite").save() }
    CacheScope.drain()
    for (thr <- Seq(0.9995, 0.9999); delta <- Seq(2, 5, 10)) {
      val cps = Multimodal.perturbImages(base, delta)
      val g = Multimodal.nearDupGroups(base.unionAll(cps), threshold = thr).collect()
        .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("group")).toMap
      val img = base.collect().filter(_.meta.media_type == "image").map(_.media_id)
      val kept = img.count(id => g(id) == g(id + 1000000L))
      println(s"PM thr=$thr delta=$delta copies co-grouped: $kept/${img.length}  groups=${g.values.toSet.size}")
      CacheScope.drain()
    }
    time("q116 body (1st)") { ExtQueries.q116MediaNearDup(spark, "").write.format("noop").mode("overwrite").save() }
    CacheScope.drain()
    time("q116 body (2nd)") { ExtQueries.q116MediaNearDup(spark, "").write.format("noop").mode("overwrite").save() }
    CacheScope.drain()
    val grouped = Multimodal.nearDupGroups(all)
    time("groups only") { grouped.write.format("noop").mode("overwrite").save() }
    time("agg on top") {
      import org.apache.spark.sql.functions._
      grouped.groupBy(col("media_type"), col("group_sz"))
        .agg(count(lit(1)).as("n"), countDistinct(col("group")).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    CacheScope.drain()
    val edges = graft.operators.SemDedup.edges(
      Multimodal.extractFeatures(all).toDF()
        .select(org.apache.spark.sql.functions.col("media_id"),
          org.apache.spark.sql.functions.expr("transform(feature, x -> CAST(round(x * 1024) AS DOUBLE))").as("cv"))
        .withColumn("cluster_id", org.apache.spark.sql.functions.lit(0L)), "media_id", "cv", 2.0)
    time("empty-edge CC") { graft.operators.ConnectedComponents.run(edges, "src", "dst").write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
