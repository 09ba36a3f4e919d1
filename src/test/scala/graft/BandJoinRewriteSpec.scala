package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** The conf-gated Catalyst band-join rewrite: inert by default, fires on
  * inner equi+band joins when enabled, and never changes results.
  */
class BandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val ConfKey = "spark.graft.bandJoinRewrite.enabled"

  private def d(s: String) = Date.valueOf(s)

  private lazy val vitals = Seq(
    ("P1", d("2024-01-10"), 72),
    ("P1", d("2024-01-20"), 80),
    ("P2", d("2024-02-01"), 65),
    ("P3", d("2024-03-05"), 90), // no claims at all
    ("P1", null.asInstanceOf[Date], 99) // null date: never matches
  ).toDF("patient_id", "mdate", "heart_rate")

  private lazy val claims = Seq(
    ("P1", d("2024-01-12"), 100.0), // within 7d of P1/01-10
    ("P1", d("2024-01-31"), 200.0), // within 7d of nothing (11d from 01-20)
    ("P2", d("2024-02-03"), 300.0), // within 7d of P2/02-01
    ("P2", null.asInstanceOf[Date], 400.0)
  ).toDF("cpatient_id", "sdate", "amount")

  private def bandJoin = vitals.join(claims,
    $"patient_id" === $"cpatient_id" && abs(datediff($"mdate", $"sdate")) <= 7)

  test("rewrite fires when enabled, is absent when disabled, results identical") {
    graft.expressions.GraftFunctions.register(spark)
    spark.conf.unset(ConfKey)
    val naive = bandJoin
    val naivePlan = naive.queryExecution.optimizedPlan.toString
    assert(!naivePlan.contains("Explode"), "rule must be inert without the conf flag")
    val expected = naive.collect().toSet

    spark.conf.set(ConfKey, "true")
    try {
      val rewritten = bandJoin
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("explode") || plan.contains("Explode"),
        s"expected the bucketed rewrite's explode in:\n$plan")
      assert(plan.contains("__l_bucket"), s"expected bucket attribute in:\n$plan")
      assert(rewritten.collect().toSet === expected)
      assert(rewritten.count() == 2) // (P1 01-10 ↔ 01-12), (P2 02-01 ↔ 02-03)
    } finally spark.conf.unset(ConfKey)
  }

  test("rewrite preserves results on dense generated data (incl. band edges)") {
    graft.expressions.GraftFunctions.register(spark)
    val l = (0 until 300).map(i =>
      ("K" + i % 5, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 60)), i))
      .toDF("k", "ld", "lid")
    val r = (0 until 200).map(i =>
      ("K" + i % 7, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays((i * 3) % 60)), i))
      .toDF("rk", "rd", "rid")
    def q = l.join(r, $"k" === $"rk" && abs(datediff($"ld", $"rd")) <= 7)
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"rid").as("s"))
    spark.conf.unset(ConfKey)
    val expected = q.collect().toSet
    spark.conf.set(ConfKey, "true")
    try {
      assert(q.collect().toSet === expected)
    } finally spark.conf.unset(ConfKey)
  }
}
