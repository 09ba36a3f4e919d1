package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst auto-rewrite of the numeric point-in-interval join — the
  * sibling of [[BandJoinRewrite]] for continuous ranges, and the
  * logical-plan form of [[graft.operators.RangeJoin.pointInInterval]]:
  * an INNER join whose condition bounds a LEFT-side numeric expression
  * between two RIGHT-side bounds,
  *
  *   p >= lo AND p < hi        (either bound may be written reversed,
  *                              upper bound strict or non-strict)
  *
  * has no equi-conjunct, so Spark can only plan a nested-loop join —
  * O(|P|·|I|) comparisons. With a user-declared grid width
  * (`spark.graft.rangeJoinRewrite.bucketWidth`, the analogue of the
  * range-join "bin size" hint in engines that optimize this shape),
  * the rule projects each point onto its grid cell, explodes each
  * interval onto the cells it covers, and joins on cell equality with
  * the original predicates kept as residuals — a hash join, linear in
  * |P| + Σ(interval width/bucket). Semantics are unchanged: every true
  * pair shares exactly the point's cell, false cell-mates fail the
  * residual, and null points/bounds produce null cells that join
  * nothing (matching the naive predicate's null behavior).
  *
  * Gated off by default: the width is a data-shape property (≈ median
  * interval width) the engine can't pick statically. A degenerate
  * interval spanning an enormous cell count fails loudly inside
  * Sequence rather than silently truncating.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoinRewrite.enabled"
  val WidthKey = "spark.graft.rangeJoinRewrite.bucketWidth"

  private def enabled: Boolean = spark.conf.getOption(ConfKey).exists(_.toBoolean)
  private def width: Option[Double] =
    spark.conf.getOption(WidthKey).map(_.toDouble).filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || width.isEmpty) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name == "__p_cell") =>
        val conjuncts = splitConjuncts(cond)
        val lower = conjuncts.flatMap(lowerBound(_, left, right)).headOption
        val upper = conjuncts.flatMap(upperBound(_, left, right)).headOption
        (lower, upper) match {
          case (Some((p1, lo)), Some((p2, hi)))
              if p1.semanticEquals(p2) && p1.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
            rewrite(j, left, right, conjuncts, p1, lo, hi, hint)
          case _ => j
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def sideOf(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  /** `p >= lo` with p from left, lo from right (either writing order). */
  private def lowerBound(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(a, b) if sideOf(a, left) && sideOf(b, right) => Some((a, b))
      case LessThanOrEqual(a, b) if sideOf(a, right) && sideOf(b, left) => Some((b, a))
      case _ => None
    }

  /** `p < hi` or `p <= hi` with p from left, hi from right. */
  private def upperBound(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    e match {
      case LessThan(a, b) if sideOf(a, left) && sideOf(b, right) => Some((a, b))
      case LessThanOrEqual(a, b) if sideOf(a, left) && sideOf(b, right) => Some((a, b))
      case GreaterThan(a, b) if sideOf(a, right) && sideOf(b, left) => Some((b, a))
      case GreaterThanOrEqual(a, b) if sideOf(a, right) && sideOf(b, left) => Some((b, a))
      case _ => None
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression], p: Expression, lo: Expression, hi: Expression,
      hint: JoinHint): LogicalPlan = {
    val w = width.get
    def cellOf(e: Expression): Expression =
      Floor(Divide(Cast(e, DoubleType), Literal(w)))

    val pCellAlias = Alias(cellOf(p), "__p_cell")()
    val probe = Project(left.output :+ pCellAlias, left)

    val iCell = AttributeReference("__i_cell", LongType, nullable = true)()
    // Sequence is TimeZoneAwareExpression: without a zone it reports
    // unresolved even for integral sequences
    val cells = new Sequence(cellOf(lo), cellOf(hi), None)
      .withTimeZone(spark.sessionState.conf.sessionLocalTimeZone)
    val build = Generate(
      Explode(cells),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iCell), child = right)

    val newCond = (conjuncts :+ EqualTo(pCellAlias.toAttribute, iCell)).reduce(And)
    Project(j.output, Join(probe, build, Inner, Some(newCond), hint))
  }
}
