package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Bounded-heap top-k aggregate: `topk_agg(col, k)` returns the k
  * largest values of a double column per group, sorted descending.
  *
  * Why custom: Spark's two built-in routes to per-group top-k both do
  * work proportional to the GROUP SIZE, not k —
  * `sort_array(collect_list(v))[0:k]` shuffles and materializes every
  * value of every group (a hot group with 10⁹ rows is a 8 GB array in
  * one aggregation buffer: straight OOM at 100 TB), and the window
  * `row_number() <= k` formulation sorts each partition of the group
  * (WindowGroupLimit prunes per-partition, but the values still flow
  * through a full shuffle + sort). This aggregate carries AT MOST k
  * doubles per group per task at every stage: the map side pushes each
  * partition's rows through a size-k min-heap, partials merge
  * heap-into-heap, and only (groups × k) doubles ever cross the wire —
  * the aggregation equivalent of TakeOrderedAndProject.
  *
  * Implemented on [[TypedImperativeAggregate]] (the Catalyst-internal
  * imperative aggregate API with explicit buffer serialization — the
  * same surface Spark's own percentile/count-min/HLL aggregates use),
  * because the buffer is a mutable heap, not a Spark SQL type: partial
  * results serialize as a length-prefixed array of doubles.
  *
  * Nulls are skipped; a group of all-null inputs yields an empty array.
  * `k` must be a foldable positive integer.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Double]] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"topk_agg: k must be int, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  // AbstractDataType (the ImplicitCastInputTypes route) is private[sql];
  // validate input types explicitly instead.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_agg: value column must be double, got ${child.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_agg: k must be an integer literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_agg: k must be a positive integer literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  // min-heap: head is the SMALLEST retained value, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[Double] =
    mutable.PriorityQueue.empty[Double](Ordering[Double].reverse)

  private def offer(heap: mutable.PriorityQueue[Double], v: Double): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }

  override def update(heap: mutable.PriorityQueue[Double], input: InternalRow): mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(heap: mutable.PriorityQueue[Double], other: mutable.PriorityQueue[Double]): mutable.PriorityQueue[Double] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(heap.toArray.sorted(Ordering[Double].reverse))

  override def serialize(heap: mutable.PriorityQueue[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * heap.size)
    buf.putInt(heap.size)
    heap.foreach(buf.putDouble)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Double] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue(buf.getDouble); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
