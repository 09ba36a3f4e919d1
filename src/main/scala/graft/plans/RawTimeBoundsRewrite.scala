package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Recover parquet predicate pushdown for time filters over the
  * nanos-as-long events layout (SURVEY §2.1's lookback-filter access
  * pattern; the reference's bread-and-butter shape at
  * `fact_patient_encounters.sql:32,60,77`).
  *
  * When the driver ships `events.ts` as INT64 TIMESTAMP(NANOS), Spark
  * (with `spark.sql.legacy.parquet.nanosAsLong`) reads it as a raw
  * long and [[graft.Tables.events]] derives
  * `ts := timestamp_micros(ts_raw div 1000)`. Every downstream
  * time-range predicate then compares against that DERIVED expression,
  * which the parquet source cannot translate — min/max row-group
  * skipping is lost and a 30-day lookback becomes a full scan at
  * 100 TB. A raw comparison on the long column, by contrast, pushes
  * fine (probed: `GreaterThanOrEqual(ts, 1704...)` lands in
  * PushedFilters against the TIMESTAMP(NANOS) column).
  *
  * This rule finds top-level Filter conjuncts of the shape
  *
  *   cmp( timestamp_micros(x div 1000), TIMESTAMP literal )     (either side)
  *
  * with `x` a LongType attribute, and ANDs in an IMPLIED bound on `x`
  * itself, e.g. `ts >= T` gains `x >= 1000*T - 999`. The original
  * predicate stays (the derived bound is deliberately 999 ns slack —
  * valid whether `div` truncates or floors, any sign), so semantics are
  * untouched; the new conjunct is exactly what FileSourceStrategy can
  * hand to parquet for row-group pruning. Runs in the user-provided
  * optimizer batch, i.e. after alias substitution has pushed the
  * query's filter down onto the scan-adjacent Filter where the
  * timestamp_micros(div) form is visible.
  *
  * Always on: the added conjunct costs two long comparisons per
  * surviving row and can only prune. Idempotent via a
  * semanticEquals-containment guard (the batch runs to fixpoint).
  */
case class RawTimeBoundsRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isThousand(e: Expression): Boolean = e match {
    case l: Literal if l.foldable =>
      l.eval() match {
        case i: Int => i == 1000
        case l2: Long => l2 == 1000L
        case _ => false
      }
    case c @ Cast(inner, _, _, _) if c.foldable => isThousand(inner.asInstanceOf[Literal])
    case _ => false
  }

  /** `timestamp_micros(x div 1000)` → the raw long attribute x. */
  private def rawMicrosSource(e: Expression): Option[Attribute] = e match {
    case MicrosToTimestamp(IntegralDivide(a: Attribute, d, _))
        if a.dataType == LongType && isThousand(d) => Some(a)
    case _ => None
  }

  private def microsOf(l: Literal): Option[Long] = l match {
    case Literal(v: Long, TimestampType)
        // overflow guard for the *1000 + 999 arithmetic
        if math.abs(v) < (Long.MaxValue - 1000L) / 1000L => Some(v)
    case _ => None
  }

  private def ge(a: Attribute, n: Long) = GreaterThanOrEqual(a, Literal(n, LongType))
  private def le(a: Attribute, n: Long) = LessThanOrEqual(a, Literal(n, LongType))

  /** Implied raw bounds for one conjunct, if it is a ts comparison.
    * With t(x) = x div 1000 (trunc or floor), 1000*t(x) ∈ [x-999, x+999]
    * for every long x, so:
    *   t(x) >= T ⇒ x >= 1000T-999      t(x) >  T ⇒ x >= 1000T+1
    *   t(x) <= T ⇒ x <= 1000T+999      t(x) <  T ⇒ x <= 1000T-1
    *   t(x) =  T ⇒ both [1000T-999, 1000T+999]
    */
  private def derive(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(e, l: Literal) => for (a <- rawMicrosSource(e).toSeq; t <- microsOf(l)) yield ge(a, 1000 * t - 999)
    case GreaterThan(e, l: Literal)        => for (a <- rawMicrosSource(e).toSeq; t <- microsOf(l)) yield ge(a, 1000 * t + 1)
    case LessThanOrEqual(e, l: Literal)    => for (a <- rawMicrosSource(e).toSeq; t <- microsOf(l)) yield le(a, 1000 * t + 999)
    case LessThan(e, l: Literal)           => for (a <- rawMicrosSource(e).toSeq; t <- microsOf(l)) yield le(a, 1000 * t - 1)
    case EqualTo(e, l: Literal) =>
      for (a <- rawMicrosSource(e).toSeq; t <- microsOf(l).toSeq;
           b <- Seq(ge(a, 1000 * t - 999), le(a, 1000 * t + 999))) yield b
    // literal-on-the-left spellings
    case GreaterThanOrEqual(l: Literal, e) => derive(LessThanOrEqual(e, l))
    case GreaterThan(l: Literal, e)        => derive(LessThan(e, l))
    case LessThanOrEqual(l: Literal, e)    => derive(GreaterThanOrEqual(e, l))
    case LessThan(l: Literal, e)           => derive(GreaterThan(e, l))
    case EqualTo(l: Literal, e)            => derive(EqualTo(e, l))
    case _ => Nil
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .foldLeft(Seq.empty[Expression]) { (acc, d) => // in-batch dedup
          if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
        }
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }
}
