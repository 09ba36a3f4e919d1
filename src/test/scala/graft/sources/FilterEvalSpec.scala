package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{GreaterThan, In}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the V1-filter evaluator behind the `healthcare-gen`
  * DSv2 source. These pin the two subtle contracts of ACCEPTED pushed
  * filters (which are removed from the Spark plan, so any divergence
  * from Spark's own semantics silently returns wrong rows):
  *
  *  - string range comparison must use UTF-8 binary order (UTF8String),
  *    not java.lang.String UTF-16 code-unit order — the two disagree
  *    when a BMP char in [U+E000, U+FFFF] meets a supplementary-plane
  *    char (3-byte 0xEx.. vs 4-byte 0xF0.. lead bytes);
  *  - `In` with NULLs in the value list must not throw: a NULL element
  *    can never satisfy the IN for a non-null row value.
  */
class FilterEvalSpec extends AnyFunSuite {
  private val schema = StructType(Seq(StructField("unit", StringType)))
  private def row(s: String): InternalRow =
    InternalRow(UTF8String.fromString(s))

  // U+FFFD (3-byte UTF-8, high UTF-16 code unit) vs U+1D400 "𝐀"
  // (4-byte UTF-8, surrogate pair starting 0xD835 in UTF-16):
  // UTF-16 order:  "�" > "𝐀"   (0xFFFD > 0xD835)
  // UTF-8  order:  "�" < "𝐀"   (0xEF.. < 0xF0..)
  private val bmpHigh = "�"
  private val supp = new String(Character.toChars(0x1D400))

  test("string > compares in UTF-8 binary order, matching Spark") {
    // sanity: the orders really disagree on this pair
    assert(bmpHigh.compareTo(supp) > 0)
    assert(UTF8String.fromString(bmpHigh).compareTo(UTF8String.fromString(supp)) < 0)

    val eval = HealthcareFilterEval(schema, Array(GreaterThan("unit", supp)))
    // Spark (UTF-8 order) says bmpHigh < supp → NOT greater → row excluded
    assert(!eval(row(bmpHigh)))
    // and something genuinely above in UTF-8 order passes
    assert(eval(row(supp + "x")))
  }

  test("In with NULLs in the value list evaluates instead of throwing") {
    val eval = HealthcareFilterEval(schema, Array(In("unit", Array("ICU", null))))
    assert(eval(row("ICU")))
    assert(!eval(row("ER")))
  }
}
