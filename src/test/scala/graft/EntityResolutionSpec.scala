package graft

import org.apache.spark.sql.functions._
import graft.operators.{EntityResolution, TextAnalysis}

/** EntityResolution.resolve and TextAnalysis.adaptiveQualityFilter —
  * hand-built clusters and quantile cutoffs.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("resolve: transitive spelling chain collapses to one cluster, canonical by multiplicity") {
    // "acme corp" ~ "acme corpx" (1) ~ "acme corpxy" (2 from corp) — chain:
    // corp~corpx dist 1, corpx~corpxy dist 1, corp~corpxy dist 2 — all one
    // cluster; "zenith ltd" is isolated. "acme corpx" has the most rows.
    val rows = Seq.fill(2)("acme corp") ++ Seq.fill(5)("acme corpx") ++
      Seq("acme corpxy", "zenith ltd", "zenith ltd")
    val got = EntityResolution.resolve(rows.toDF("name"), "name", maxDist = 3)
      .select("value", "n_rows", "canonical", "cluster_sz", "rows_covered")
      .as[(String, Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("acme corp")._3 == "acme corpx") // multiplicity beats lexicographic
    assert(got("acme corpxy")._3 == "acme corpx")
    assert(got("acme corp")._4 == 3 && got("acme corp")._5 == 8)
    assert(got("zenith ltd")._3 == "zenith ltd") // singleton cluster
    assert(got("zenith ltd")._4 == 1 && got("zenith ltd")._5 == 2)
  }

  test("resolve: ties in multiplicity elect the lexicographically smallest member") {
    val rows = Seq("beta x", "beta y") // dist 1, equal multiplicity
    val got = EntityResolution.resolve(rows.toDF("name"), "name", maxDist = 1)
      .select("value", "canonical").as[(String, String)].collect().toMap
    assert(got("beta x") == "beta x" && got("beta y") == "beta x")
  }

  test("adaptiveQualityFilter: each group keeps its own upper quantile") {
    // group a scores 0.1..0.4 (p25 over sorted = 0.175), group b 0.6..0.9
    // (p25 = 0.675): a global p25 would keep ALL of b and half of a;
    // per-group keeps exactly the top 3 of each.
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4),
      ("b", 5L, 0.6), ("b", 6L, 0.7), ("b", 7L, 0.8), ("b", 8L, 0.9))
      .toDF("source", "doc_id", "score")
    val kept = TextAnalysis.adaptiveQualityFilter(df, "source", "score", p = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 6L, 7L, 8L))
    val thr = TextAnalysis.adaptiveQualityFilter(df, "source", "score", p = 0.25)
      .select("source", "threshold").distinct().as[(String, Double)].collect().toMap
    assert(thr("a") == 0.175 && thr("b") == 0.675)
  }
}
