package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** TopKAgg (bounded-heap TypedImperativeAggregate): equivalence with the
  * window formulation, null/short-group edges, and the serialize/merge
  * path under multi-partition partial aggregation.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftFunctions.register(spark)
    df.groupBy("g").agg(call_function("topk_agg", col("v"), lit(k)).as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[Double])].collect().toMap
  }

  test("matches sort-desc-take-k on randomized multi-partition input (exercises merge+serde)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(i => ("g" + (i % 7), rnd.nextInt(100000) / 10.0))
    val df = rows.toDF("g", "v").repartition(16) // force map-side partials per partition
    val got = topk(df, 10)
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted(Ordering[Double].reverse).take(10).toSeq).toMap
    assert(got == want)
  }

  test("groups smaller than k return all values; nulls are skipped") {
    val df = Seq(("a", Some(3.0)), ("a", None), ("a", Some(1.0)), ("b", None))
      .toDF("g", "v")
    val got = topk(df, 5)
    assert(got("a") == Seq(3.0, 1.0))
    assert(got("b") == Seq.empty)
  }

  test("duplicate values are kept, not deduplicated") {
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 1.0)).toDF("g", "v")
    assert(topk(df, 2)("a") == Seq(2.0, 2.0))
  }

  test("non-literal or non-positive k is a type-check error") {
    GraftFunctions.register(spark)
    val df = Seq(("a", 1.0, 2)).toDF("g", "v", "kcol")
    val e1 = intercept[Exception] {
      df.groupBy("g").agg(call_function("topk_agg", col("v"), col("kcol"))).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("literal"))
    val e2 = intercept[Exception] {
      df.groupBy("g").agg(call_function("topk_agg", col("v"), lit(0))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("positive"))
  }
}
