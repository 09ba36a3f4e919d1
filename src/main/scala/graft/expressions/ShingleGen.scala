package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator form of [[graft.operators.Dedup.shingles]]:
  * `shingles_gen(text, k)` emits one row per DISTINCT lowercase word
  * k-shingle, streaming rows instead of materializing the per-row
  * shingle array the column formulation builds (k shifted slices +
  * arrays_zip + transform + array_distinct). Rounds out the custom
  * Catalyst surface with the Generator category (alongside the VecDot
  * Expression, VecSumAgg Aggregator, TopKAgg TypedImperativeAggregate,
  * and the BandJoinRewrite optimizer Rule).
  *
  * Bit-parity contract (pinned by ShingleGenSpec): identical shingle
  * strings — same lowercase (UTF8String.toLowerCase, exactly Spark's
  * `lower`), same `split(text, " ", -1)` tokenization including empty
  * tokens from repeated spaces, texts shorter than k tokens yield the
  * whole text as one shingle, and first-occurrence distinct order.
  * Downstream xxhash64 values are therefore identical, so it can drop
  * into any posting-list pipeline without changing results.
  */
case class Shingles(child: Expression, kExpr: Expression)
  extends Generator with CodegenFallback {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles_gen: text must be string, got ${child.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "shingles_gen: k must be a positive integer literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    // UTF8String.toLowerCase is exactly Spark's `lower`; split(" ", -1)
    // keeps empty tokens like Spark's split(text, " ")
    val toks = raw.asInstanceOf[UTF8String].toLowerCase.toString.split(" ", -1)
    val out = mutable.LinkedHashSet.empty[String]
    if (toks.length < k) out += toks.mkString(" ")
    else {
      var i = 0
      val sb = new StringBuilder
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
    }
    out.iterator.map(s => InternalRow(UTF8String.fromString(s)))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Shingles =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
