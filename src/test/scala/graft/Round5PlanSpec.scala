package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape assertions for the round-5 queries — the structural
  * properties that make them scale, pinned so a refactor can't silently
  * regress them (companion to Round4PlanSpec).
  */
class Round5PlanSpec extends SparkSpec {

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

  test("q84: the exact profiler plans NO Expand — per-column branches, not multi-distinct replication") {
    val nodes = all(plan("q84_profile"))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Expand")),
      "exact profile must not plan a multi-distinct Expand")
  }

  test("q28 frozen IVF: no cartesian joins; candidate fetch is the only data-bearing join") {
    val nodes = all(plan("q28_ann_ivf"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in IVF probe")
    // assignment and probe ranking are in-row constant math — the plan
    // has no window over the corpus before the candidate join
    val windows = nodes.filter(_.getClass.getSimpleName.contains("Window"))
    // only the final per-query top-k rank remains — ONE logical window,
    // planned as WindowGroupLimit (partial + final prune) + WindowExec
    assert(windows.size <= 3, s"unexpected windows: ${windows.size}")
    assert(windows.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      "top-k rank should trigger the WindowGroupLimit prune")
  }

  test("q99 passJoin: candidates come from an equi-join; nested-loop only in the bounded short stratum") {
    val nodes = all(plan("q99_fuzzy_passjoin"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "passJoin must not plan a data-proportional cartesian")
    // the (len, segIdx, substring) candidate join is a hash/sort-merge
    // equi-join
    assert(nodes.exists { n =>
      val c = n.getClass.getSimpleName
      c.contains("SortMergeJoin") || c.contains("HashJoin")
    }, "expected an equi-join for segment candidates")
    // the short stratum (length <= k strings) may plan a nested-loop,
    // but its sides are bounded by the filter — at most one such join
    assert(nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1)
  }

  test("q100 SemDeDup: pair join shuffles on cluster_id (equi), never corpus x corpus") {
    val nodes = all(plan("q100_semdedup"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in SemDeDup")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "SemDeDup pairs must come from the cluster_id equi-join")
  }

  test("q101 LM score: scalars broadcast; token/bigram joins are equi-joins") {
    val nodes = all(plan("q101_lm_score"))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]), "cartesian in LM scoring")
    // the (N, V) scalar frame arrives via a broadcast nested-loop cross
    // join with a ONE-ROW build side — never a data-proportional product
    val bnlj = nodes.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.size <= 1, s"unexpected nested-loop joins: ${bnlj.size}")
  }
}
