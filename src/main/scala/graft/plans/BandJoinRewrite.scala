package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst auto-rewrite of the proximity band join (SURVEY §4/§7.4's
  * "band-join planning strategy"): an INNER join whose condition is
  *
  *   leftKey = rightKey AND abs(datediff(leftDate, rightDate)) <= band
  *
  * pairs every row of a key before filtering — m×n intermediate pairs on
  * a hot key. This rule rewrites it into the bucketed form of
  * [[graft.operators.BandJoin]] at the LOGICAL level, so ANY band join
  * in ANY query benefits without the author calling the operator:
  * both sides gain a `floor(days/(band+1))` bucket, the probe side
  * explodes into its bucket ±1, and the bucket equality joins the
  * original predicates (any pair within ±band days shares at least one
  * bucket; the exact predicate stays as the residual, so semantics are
  * unchanged — including null dates, which fail both the naive residual
  * and the bucket equality).
  *
  * Gated off by default (`spark.graft.bandJoinRewrite.enabled`): the
  * naive residual plan is the better plan UNTIL per-key fan-out
  * dominates, and that's a data-shape property the engine can't see
  * statically. BandJoinRewriteSpec proves result-equality and that the
  * rewrite fires.
  *
  * Runs as an extra optimizer rule (`experimentalMethods
  * .extraOptimizations` via [[graft.expressions.GraftFunctions.register]]
  * or `injectOptimizerRule` via GraftExtensions), i.e. on resolved,
  * optimized plans — it matches the join condition's conjuncts in any
  * order.
  */
case class BandJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bandJoinRewrite.enabled"

  private def enabled: Boolean =
    spark.conf.getOption(ConfKey).exists(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          // idempotence guard: the extra-optimizer batch runs to
          // fixpoint, and the rewritten join still matches the band
          // pattern — the bucket attribute marks it as already done
          if !cond.references.exists(_.name == "__l_bucket") =>
        val conjuncts = splitConjuncts(cond)
        val eq = conjuncts.collectFirst {
          case e @ EqualTo(a, b)
              if sidesSplit(a, b, left, right).isDefined => e
        }
        val band = conjuncts.collectFirst {
          case b @ LessThanOrEqual(Abs(DateDiff(ld, rd), _), Literal(n: Int, _))
              if sidesSplit(ld, rd, left, right).isDefined && n >= 0 => b
        }
        (eq, band) match {
          case (Some(eqPred), Some(bandPred @ LessThanOrEqual(Abs(DateDiff(d1, d2), _), Literal(n: Int, _)))) =>
            val (ld, rd) = sidesSplit(d1, d2, left, right).get
            rewrite(j, left, right, conjuncts, ld, rd, n, hint)
          case _ => j
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** If one expression references only `left` and the other only `right`,
    * return them in (left, right) order.
    */
  private def sidesSplit(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    def refs(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (refs(a, left) && refs(b, right)) Some((a, b))
    else if (refs(a, right) && refs(b, left)) Some((b, a))
    else None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression], ld: Expression, rd: Expression, band: Int,
      hint: JoinHint): LogicalPlan = {
    val width = band + 1
    // floor(datediff(d, epoch) / (band+1)) — same arithmetic as
    // operators.BandJoin so the two paths stay provably aligned
    def bucketOf(d: Expression): Expression =
      Floor(Divide(
        Cast(DateDiff(d, Literal(0, org.apache.spark.sql.types.DateType)), DoubleType),
        Literal(width.toDouble)))

    val lBucketBase = bucketOf(ld)
    val probeBucket = AttributeReference("__l_bucket", LongType, nullable = true)()
    val probe = Generate(
      Explode(CreateArray(Seq(
        Subtract(lBucketBase, Literal(1L)), lBucketBase, Add(lBucketBase, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(probeBucket), child = left)

    val rBucketAlias = Alias(bucketOf(rd), "__r_bucket")()
    val build = Project(right.output :+ rBucketAlias, right)

    val newCond = (conjuncts :+ EqualTo(probeBucket, rBucketAlias.toAttribute))
      .reduce(And)
    Project(j.output, Join(probe, build, Inner, Some(newCond), hint))
  }
}
