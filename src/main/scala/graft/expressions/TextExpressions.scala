package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression —
  * the canonical-composition step of corpus text cleaning (é typed as
  * `e` + combining acute and é typed precomposed must hash, dedup and
  * tokenize identically; a corpus mixing both silently defeats exact
  * and near dedup). Spark has no built-in normalizer; a Scala UDF would
  * break the engine's zero-UDF discipline and fall out of whole-stage
  * codegen, so this wraps `java.text.Normalizer` (JDK ICU, Unicode
  * standard NFC — the same algorithm DuckDB's `nfc_normalize` applies,
  * which is what makes the q122 oracle possible).
  *
  * ASCII fast path: NFC is the identity on ASCII, and `UTF8String`
  * knows whether all bytes are < 0x80 without decoding — real corpora
  * are overwhelmingly ASCII, so most rows skip the String round-trip
  * entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // all-ASCII strings are NFC by construction — no decode, no copy
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
