package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape assertions for the round-4 queries — the structural
  * properties that make them scale, pinned so a refactor can't silently
  * regress them (same stance as BucketedSpec/LayoutSpec).
  */
class Round4PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan
  }
  /** Full traversal: AdaptiveSparkPlanExec and QueryStageExec are LEAF
    * nodes hiding their real subtrees, and scalar-subquery plans hang off
    * `subqueries`, so a plain `collect` misses most of an executed AQE
    * plan.
    */
  private def all(p: SparkPlan): Seq[SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def go(n: SparkPlan): Unit = {
      buf += n
      n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => go(r.child)
        case _ =>
      }
      n.children.foreach(go)
      n.subqueries.foreach(go)
    }
    go(p)
    buf.toSeq
  }

  test("q85/q88: dimension sides broadcast, no cartesian/nested-loop joins") {
    for (q <- Seq("q85_small_qty_revenue", "q88_brand_supplier_counts")) {
      val nodes = all(plan(q))
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]), s"$q: expected a broadcast join")
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), s"$q: cartesian product")
    }
  }

  test("q87: scalar threshold is a broadcast (one-row cross join), not a driver collect") {
    val nodes = all(plan("q87_idle_rich_customers"))
    // the one-row threshold side joins via BroadcastNestedLoopJoin (cross) —
    // constant-size build side, never a CartesianProductExec over data
    assert(nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      n.isInstanceOf[BroadcastHashJoinExec]),
      "expected the threshold to arrive via broadcast")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("q92: sketch pass is ONE scan (no per-distinct-key shuffle before candidates)") {
    val nodes = all(plan("q92_heavy_hitters"))
    // candidates-then-verify is exactly two passes over events, and the
    // only data-proportional exchanges are the two testdata spread
    // repartitions (Tables.t single-row-group artifact): the sketch
    // aggregate exchanges ≤capacity entries to one partition, the
    // recount groupBy shuffles ≤capacity candidate keys, the final sort
    // ranges ≤capacity rows. 5 exchanges total, only 2 carrying raw data.
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 5, s"unexpected exchanges: ${shuffles.size}")
  }

  test("q94: weekly rollup reads the pre-agg, not raw events (two-level agg shape)") {
    val p = plan("q94_bitmap_distinct")
    val scans = all(p).filter { s =>
      val c = s.getClass.getSimpleName
      c.contains("FileSourceScan") || c.contains("BatchScan")
    }
    // exactly one scan of the raw events feeds the daily pre-agg; the weekly
    // and final stages re-aggregate summary rows only
    assert(scans.size == 1, s"expected 1 raw scan, got ${scans.size}")
  }

  test("merge upsert: exactly one full-outer join, no row explosion") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val s = (500 to 1500).map(i => (i.toLong, s"w$i")).toDF("id", "v")
    val merged = graft.operators.Merge.upsert(t, s, Seq("id"))
    merged.collect()
    assert(merged.count() == 1500)
    val joins = all(merged.queryExecution.executedPlan)
      .filter(_.nodeName.contains("Join"))
    assert(joins.size == 1, s"expected exactly 1 join, got: ${joins.map(_.nodeName)}")
    // column-level sanity: matched keys take source values
    assert(merged.filter(col("id") === 700).select("v").as[String].head() == "w700")
  }
}
