package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The GraftExtensions injection path — the cluster-wide deployment mode
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`) where the
  * session is built by infrastructure we don't control: vec_dot must
  * resolve in plain SQL and the band-join rule must be present (and
  * conf-gated). `spark.sql.extensions` itself is a STATIC conf, fixed by
  * the first session this JVM built — so the spec exercises the same
  * class through the equivalent programmatic `withExtensions` hook.
  */
class ExtensionsSpec extends SparkSpec {

  test("extensions-built session resolves vec_dot and carries the band rule") {
    val base = spark // force init of the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.expressions.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      assert(s2 ne base, "builder must create a fresh session for the extensions to apply")
      val d = s2.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)

      import s2.implicits._
      val l = Seq(("A", Date.valueOf("2024-01-10"), 1)).toDF("k", "ld", "lid")
      val r = Seq(("A", Date.valueOf("2024-01-12"), 2)).toDF("rk", "rd", "rid")
      def plan = l.join(r, $"k" === $"rk" && abs(datediff($"ld", $"rd")) <= 7)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__l_bucket"), "rule stays inert without the conf flag")
      s2.conf.set("spark.graft.bandJoinRewrite.enabled", "true")
      assert(plan.contains("__l_bucket"), s"injected rule must fire when enabled:\n$plan")
      s2.conf.unset("spark.graft.bandJoinRewrite.enabled")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
