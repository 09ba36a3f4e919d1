package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product for `array<double>` — the one place in the
  * engine where a custom Expression is genuinely warranted (SURVEY §2.10
  * reserves custom Catalyst surface for the 100 TB extension operators).
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` allocates an intermediate array and evaluates
  * two interpreted lambdas per element — HigherOrderFunction expressions
  * don't participate in whole-stage codegen. This expression generates a
  * tight primitive loop (`doGenCode`), no allocation, and stays inside
  * the codegen'd stage. Used on the ANN hot paths (cosine top-k scans
  * every corpus×query pair).
  *
  * Null semantics: null array → null; null ELEMENTS contribute 0
  * (consistent with the coalesce-to-zero convention in VectorOps).
  * Length mismatch: iterates the shorter length (zip semantics).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Element-wise vector-sum aggregate as a typed [[org.apache.spark.sql.expressions.Aggregator]]
  * (SURVEY §7.4's "custom Aggregator" surface): sums `array<double>`
  * columns component-wise with a mutable primitive buffer — partial
  * (map-side) aggregation and merge come from the Aggregator contract,
  * so a vector mean is ONE groupBy over |rows| rows instead of
  * posexplode + per-(group, position) aggregation over |rows|·dims
  * exploded rows. Pick by dims: at 128 dims the codegen'd exploded
  * hash-agg measured FASTER (ObjectHashAggregate pays per-update object
  * overhead), so IvfIndex keeps posexplode; at LLM-embedding dims
  * (1536-4096) the dims explosion factor dominates and this wins.
  * Rows shorter than the longest vector contribute to their prefix;
  * empty input yields an empty array. Equality with the posexplode
  * formulation is pinned in OperatorsSpec.
  */
object VecSumAgg extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  private def add(b: Array[Double], a: Seq[Double]): Array[Double] = {
    if (a == null) return b
    val out = if (b.length >= a.length) b else java.util.Arrays.copyOf(b, a.length)
    var i = 0
    val it = a.iterator
    while (it.hasNext) { out(i) += it.next(); i += 1 }
    out
  }
  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = add(b, a)
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = add(x, y.toSeq)
  override def finish(r: Array[Double]): Seq[Double] = r.toSeq
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Registration, both styles:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (cluster-wide injection at session build);
  *  - [[GraftFunctions.register]] for imperative registration on an
  *    existing session (the library path — works on sessions we didn't
  *    construct, e.g. the driver's).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.vecDotDescriptor)
    ext.injectFunction(GraftFunctions.topKDescriptor)
    ext.injectFunction(GraftFunctions.shinglesDescriptor)
    ext.injectFunction(GraftFunctions.mgTopKDescriptor)
    ext.injectFunction(GraftFunctions.nfcDescriptor)
    ext.injectOptimizerRule(session => graft.plans.BandJoinRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.RawTimeBoundsRewrite(session))
  }
}

object GraftFunctions {
  private[graft] val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot takes exactly 2 arguments")
      VecDot(children.head, children(1))
    })

  /** Idempotently register graft functions and optimizer rules on an
    * existing session (the band-join rewrite stays inert until its conf
    * flag enables it).
    */
  private[graft] val topKDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_agg"),
    new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "topk_agg takes exactly 2 arguments (col, k)")
      TopKAgg(children.head, children(1))
    })

  private[graft] val shinglesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingles_gen"),
    new ExpressionInfo(classOf[Shingles].getName, "shingles_gen"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "shingles_gen takes exactly 2 arguments (text, k)")
      Shingles(children.head, children(1))
    })

  private[graft] val mgTopKDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_topk"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_topk"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "mg_topk takes exactly 2 arguments (key, capacity)")
      MisraGriesAgg(children.head, children(1))
    })

  private[graft] val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "nfc_normalize takes exactly 1 argument")
      NfcNormalize(children.head)
    })

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("nfc_normalize"))) {
      val (id, info, builder) = nfcDescriptor
      registry.registerFunction(id, info, builder)
    }
    if (!registry.functionExists(FunctionIdentifier("vec_dot"))) {
      val (id, info, builder) = vecDotDescriptor
      registry.registerFunction(id, info, builder)
    }
    if (!registry.functionExists(FunctionIdentifier("topk_agg"))) {
      val (id, info, builder) = topKDescriptor
      registry.registerFunction(id, info, builder)
    }
    if (!registry.functionExists(FunctionIdentifier("shingles_gen"))) {
      val (id, info, builder) = shinglesDescriptor
      registry.registerFunction(id, info, builder)
    }
    if (!registry.functionExists(FunctionIdentifier("mg_topk"))) {
      val (id, info, builder) = mgTopKDescriptor
      registry.registerFunction(id, info, builder)
    }
    val em = spark.experimental
    if (!em.extraOptimizations.exists(_.isInstanceOf[graft.plans.BandJoinRewrite]))
      em.extraOptimizations = em.extraOptimizations :+ graft.plans.BandJoinRewrite(spark)
    if (!em.extraOptimizations.exists(_.isInstanceOf[graft.plans.RangeJoinRewrite]))
      em.extraOptimizations = em.extraOptimizations :+ graft.plans.RangeJoinRewrite(spark)
    if (!em.extraOptimizations.exists(_.isInstanceOf[graft.plans.RawTimeBoundsRewrite]))
      em.extraOptimizations = em.extraOptimizations :+ graft.plans.RawTimeBoundsRewrite(spark)
  }
}
