package graft

import org.apache.spark.sql.functions._

/** The conf-gated Catalyst range-join rewrite: inert by default (and
  * without a declared width), fires on numeric point-in-interval inner
  * joins when enabled, plans a hash join instead of a nested loop, and
  * never changes results.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val ConfKey = "spark.graft.rangeJoinRewrite.enabled"
  private val WidthKey = "spark.graft.rangeJoinRewrite.bucketWidth"

  private lazy val points = (0 until 400)
    .map(i => (i.toLong, i * 7.3 % 120 - 20)) // includes negatives
    .toDF("pid", "v")
  private lazy val intervals = Seq(
    ("a", -30.0, 10.0), ("b", 0.0, 40.0), ("c", 30.0, 80.0),
    ("d", -5.0, 95.0), ("e", 99.0, 101.0)).toDF("iv", "lo", "hi")

  private def rangeJoin = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")

  test("inert without the flag; fires with flag+width; hash join, identical results") {
    graft.expressions.GraftFunctions.register(spark)
    spark.conf.unset(ConfKey); spark.conf.unset(WidthKey)
    val naive = rangeJoin
    assert(!naive.queryExecution.optimizedPlan.toString.contains("__p_cell"),
      "rule must be inert without the conf flag")
    val expected = naive.collect().toSet

    spark.conf.set(ConfKey, "true")
    // enabled but WITHOUT a width: still inert (width is mandatory)
    assert(!rangeJoin.queryExecution.optimizedPlan.toString.contains("__p_cell"))

    spark.conf.set(WidthKey, "25.0")
    try {
      val rewritten = rangeJoin
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("__p_cell") && opt.contains("__i_cell"), s"no rewrite in:\n$opt")
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(!phys.contains("NestedLoop"), s"expected a hash join:\n$phys")
      assert(rewritten.collect().toSet === expected)
    } finally { spark.conf.unset(ConfKey); spark.conf.unset(WidthKey) }
  }

  test("reversed bound order and non-strict upper bound also match; nulls never join") {
    graft.expressions.GraftFunctions.register(spark)
    val pts = Seq((1L, Some(5.0)), (2L, Some(10.0)), (3L, Option.empty[Double]))
      .toDF("pid", "v")
    val ivs = Seq(("x", 0.0, 10.0)).toDF("iv", "lo", "hi")
    // lo <= v AND v <= hi (reversed lower, non-strict upper)
    def q = pts.join(ivs, $"lo" <= $"v" && $"v" <= $"hi")
    val expected = q.collect().toSet
    assert(expected.map(_.getLong(0)) == Set(1L, 2L)) // 10.0 included, null dropped
    spark.conf.set(ConfKey, "true"); spark.conf.set(WidthKey, "4.0")
    try {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("__p_cell"), s"no rewrite in:\n$opt")
      assert(q.collect().toSet === expected)
    } finally { spark.conf.unset(ConfKey); spark.conf.unset(WidthKey) }
  }

  test("equi-join conditions are left alone") {
    graft.expressions.GraftFunctions.register(spark)
    spark.conf.set(ConfKey, "true"); spark.conf.set(WidthKey, "10.0")
    try {
      val a = Seq((1L, 2.0)).toDF("id", "x")
      val b = Seq((1L, 3.0)).toDF("bid", "y")
      val q = a.join(b, $"id" === $"bid")
      assert(!q.queryExecution.optimizedPlan.toString.contains("__p_cell"))
      assert(q.count() == 1)
    } finally { spark.conf.unset(ConfKey); spark.conf.unset(WidthKey) }
  }
}
