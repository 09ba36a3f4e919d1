package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape assertions for the round-6 queries — the structural
  * properties that make them scale, pinned so a refactor can't silently
  * regress them (companion to Round4/Round5PlanSpec).
  */
class Round6PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan
  }
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

  test("q105 spanDedup: no joins on the hot path except the final doc left join; no rank window") {
    val nodes = all(plan("q105_span_dedup"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in spanDedup")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]), "BNLJ in spanDedup")
    // first-occurrence selection must be the min-struct HASH AGG, never a
    // per-span rank window (a window would add a full sort per span group)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Window")),
      "spanDedup must not plan a window — keeper selection is an aggregate")
    // exactly one equi-join: reattaching survivors to the full doc list
    val joins = nodes.filter { n =>
      val c = n.getClass.getSimpleName
      c.contains("SortMergeJoin") || c.contains("HashJoin")
    }
    assert(joins.nonEmpty, "expected the final left join to all docs")
  }

  test("q106 JL projection: a narrow map — no joins, no aggregates; only the output sort exchanges") {
    val nodes = all(plan("q106_jl_project"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    assert(!nodes.exists { n =>
      val c = n.getClass.getSimpleName
      c.contains("SortMergeJoin") || c.contains("HashJoin") || c.contains("HashAggregate")
    }, "projection must stay a narrow per-row map")
    // the constant matrix is folded into the plan: the ONLY exchanges are
    // the output sort's range partitioning and Tables.t's compensating
    // repartition for the single-row-group testdata parquet (which
    // disappears at production scale — see Tables.singleRowGroupTables).
    // Count DISTINCT exchanges: AQE query-stage wrapping makes the same
    // exchange reachable twice in the traversal.
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s.id }.distinct
    assert(shuffles.size <= 2, s"projection must not shuffle beyond sort + scan-compensation: ${shuffles.size}")
  }

  test("q104 curation pipeline: no cartesian anywhere; drops flow as anti-joins") {
    val nodes = all(plan("q104_curate"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in curation pipeline")
    // anti-joins carry the drops (dup non-keepers, contaminated docs) —
    // never a collected driver-side filter
    val antis = nodes.filter(_.toString.take(200).contains("LeftAnti"))
    assert(antis.nonEmpty, "expected left-anti drop joins in the composed pipeline")
  }

  test("q109 bm25: corpus joins broadcast the query/idf/scalar sides; no cartesian over data") {
    val nodes = all(plan("q109_bm25"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in bm25")
    // query terms, idf (restricted to query vocabulary) and the (N, avgdl)
    // scalars must all arrive via broadcast — the corpus-side tf stream is
    // never the build side of anything
    assert(nodes.exists(_.getClass.getSimpleName.contains("BroadcastHashJoin")),
      "expected broadcast joins for the query-term/idf sides")
    // scalar one-row frames ride BroadcastNestedLoopJoin (cross of 1 row)
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "expected the broadcast scalar cross join")
  }

  test("q110 quantized ANN: queries broadcast; candidate stage never shuffles the corpus on a join key") {
    val nodes = all(plan("q110_quant_ann"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian over data in quantized ANN")
    // the corpus×queries product is the intended broadcast nested loop
    // (queries are a handful of rows); corpus-side shuffles are only the
    // testdata-spread repartition, the stats agg, and the two top-k windows
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "expected broadcast of the query set")
    val smj = nodes.filter(_.getClass.getSimpleName.contains("SortMergeJoin"))
    assert(smj.isEmpty, s"no sort-merge join should appear: ${smj.map(_.nodeName)}")
  }

  test("q111 entity resolution: blocked pairs only — no all-pairs product over the vocabulary") {
    val nodes = all(plan("q111_entity_res"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "all-pairs product in entity resolution")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "BNLJ in entity resolution — pairs must come from the token-block equi-join")
  }

  test("q112 adaptive quality: thresholds join back by broadcast (groups ≪ corpus)") {
    val nodes = all(plan("q112_adaptive_q"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(nodes.exists(_.getClass.getSimpleName.contains("BroadcastHashJoin")),
      "expected the per-source threshold frame to broadcast")
  }
}
