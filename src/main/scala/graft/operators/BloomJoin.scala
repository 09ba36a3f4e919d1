package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi join — the two-phase "runtime filter" shape
  * for joins whose probe side is enormously larger than its match set:
  * build a compact Bloom filter of the build side's join keys (one small
  * aggregation job), embed it as a CONSTANT in a probe-side scan filter
  * (codegen'd, pushed below the shuffle), then finish with the exact
  * semi join on the survivors. False positives are removed by the final
  * join, so results are EXACTLY the plain semi join's — the filter only
  * changes how many probe rows reach the shuffle. At 100 TB this is the
  * difference between shuffling the full probe table and shuffling ~the
  * matching rows (plus the fpp tail).
  *
  * Spark's own AQE runtime filter (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`) plans the same shape behind a size heuristic;
  * this operator is the explicit, always-on form, reusing Spark's native
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * (codegen'd, xxhash64-keyed) rather than a driver-side sketch + UDF.
  */
object BloomJoin {

  /** Idempotently register the (internal, unregistered-by-default)
    * bloom expressions as SQL functions on the session.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_bloom_agg"))) {
      registry.registerFunction(
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) => children.length match {
          case 1 => new BloomFilterAggregate(children.head)
          case 2 => new BloomFilterAggregate(children.head, children(1))
          case _ => new BloomFilterAggregate(children.head, children(1), children(2))
        })
      registry.registerFunction(
        FunctionIdentifier("graft_bloom_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might_contain"),
        (children: Seq[Expression]) =>
          BloomFilterMightContain(children.head, children(1)))
    }
  }

  /** `left LEFT SEMI JOIN right ON left(leftKey) = right(rightKey)`,
    * with the probe side pre-pruned by a Bloom filter of the build keys.
    *
    * @param expectedItems sizing hint for the filter (≈ distinct build
    *                      keys); the filter is ~1.4 bytes/item at the
    *                      default fpp ≈ 3%
    */
  def prunedLeftSemi(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Phase 1: one small agg job builds the filter; the serialized bits
    // come back to the driver (bounded by numBits/8, ~1.4B/key) and are
    // embedded as a foldable literal — the same constant-bloom contract
    // Spark's runtime filtering uses (BloomFilterMightContain requires a
    // constant or scalar subquery).
    val bf = right
      .select(call_function("graft_bloom_agg", xxhash64(col(rightKey)),
        lit(expectedItems)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bf == null) return left.limit(0) // empty build side: semi join is empty
    // Phase 2: constant-filter the probe (codegen'd, evaluated at the
    // scan before any exchange), then exact semi join kills the false
    // positives.
    left.filter(call_function("graft_bloom_might_contain", lit(bf), xxhash64(col(leftKey))))
      .join(right.select(col(rightKey)), col(leftKey) === col(rightKey), "left_semi")
  }
}
