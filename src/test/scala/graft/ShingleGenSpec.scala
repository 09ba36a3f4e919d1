package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.operators.Dedup

/** Shingles Generator ≡ the column formulation, bit-identically —
  * including the downstream xxhash64 values the dedup pipelines key on.
  */
class ShingleGenSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "short"),            // fewer tokens than k
    (3L, "two words"),
    (4L, ""),                 // empty text
    (5L, "a  b   c d"),       // repeated spaces → empty tokens
    (6L, "MiXeD CaSe ÜBER strasse Σίσυφος tokens here"), // non-ASCII lowercase
    (7L, "dup dup dup dup dup dup")) // heavy shingle duplication

  private def viaColumn(k: Int) = texts.toDF("id", "text")
    .select(col("id"), explode(Dedup.shingles(col("text"), k)).as("shingle"))

  private def viaGenerator(k: Int) = {
    GraftFunctions.register(spark)
    texts.toDF("id", "text")
      .select(col("id"), call_function("shingles_gen", col("text"), lit(k)).as("shingle"))
  }

  for (k <- Seq(2, 3, 5)) {
    test(s"generator shingles ≡ column shingles, k=$k (strings and xxhash64)") {
      val a = viaColumn(k).select(col("id"), col("shingle"), xxhash64(col("shingle")).as("h"))
        .as[(Long, String, Long)].collect().toSet
      val b = viaGenerator(k).select(col("id"), col("shingle"), xxhash64(col("shingle")).as("h"))
        .as[(Long, String, Long)].collect().toSet
      assert(a == b)
    }
  }

  test("null text emits no rows (matches explode of a null array)") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("id", "text")
    val n = df.select(call_function("shingles_gen", col("text"), lit(2))).count()
    assert(n == 2) // only doc 2's two bigrams
  }

  test("non-literal k is a type-check error") {
    GraftFunctions.register(spark)
    val df = Seq(("a b", 2)).toDF("text", "kcol")
    val e = intercept[Exception] {
      df.select(call_function("shingles_gen", col("text"), col("kcol"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
