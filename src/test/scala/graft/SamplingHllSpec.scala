package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sampling operators (stable splits, stratified) and the HLL
  * approximate-distinct sketch against its exact twin.
  */
class SamplingHllSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.t(spark, "/root/testdata/sf0.01", "documents").cache()

  test("split is complete, disjoint, ratio-correct, and stable across runs") {
    val s1 = Sampling.split(docs, "doc_id")
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every row lands in exactly one split")
    assert(counts("train").toDouble / total > 0.7 && counts("train").toDouble / total < 0.9)
    assert(counts.keySet == Set("train", "valid", "test"))
    // stability: same ids → same split, run twice
    val s2 = Sampling.split(docs, "doc_id")
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).isEmpty)
  }

  test("split assignment is insensitive to corpus growth (no leakage)") {
    val half = docs.filter($"doc_id" < 250)
    val fromHalf = Sampling.split(half, "doc_id").select($"doc_id", $"split".as("s1"))
    val fromFull = Sampling.split(docs, "doc_id").select($"doc_id", $"split".as("s2"))
    val moved = fromHalf.join(fromFull, "doc_id").filter($"s1" =!= $"s2")
    assert(moved.isEmpty, "rows must keep their split when the corpus grows")
  }

  test("stratified sampling respects per-stratum fractions") {
    val frac = Map("en" -> 0.5, "zh" -> 1.0)
    val sampled = Sampling.stratified(docs, "lang", frac, "doc_id")
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseEn = docs.filter($"lang" === "en").count()
    val baseZh = docs.filter($"lang" === "zh").count()
    assert(byLang.keySet.subsetOf(Set("en", "zh")), "unlisted strata are dropped")
    assert(byLang("zh") == baseZh, "fraction 1.0 keeps the whole stratum")
    val enRatio = byLang("en").toDouble / baseEn
    assert(enRatio > 0.35 && enRatio < 0.65, s"en keep-ratio $enRatio should be ~0.5")
  }

  test("HLL approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val both = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx")).head()
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
