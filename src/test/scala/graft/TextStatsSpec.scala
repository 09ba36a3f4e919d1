package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** docFrequency / tfIdfTopTerms — hand-computed corpus statistics. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple banana cherry date"),
    (4L, "date date date")).toDF("doc_id", "text")

  test("docFrequency: per-doc-distinct counts and idf = ln(N/df)") {
    val got = TextAnalysis.docFrequency(docs, "doc_id")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("apple")._1 == 2) // docs 1, 3 — in-doc repeats don't count
    assert(got("banana")._1 == 3)
    assert(got("cherry")._1 == 2)
    assert(got("date")._1 == 2)
    assert(got("banana")._2 == math.rint(math.log(4.0 / 3.0) * 1e6) / 1e6)
  }

  test("tfIdfTopTerms: raw tf times rounded idf, term tie-break, top-k bound") {
    val got = TextAnalysis.tfIdfTopTerms(docs, "doc_id", k = 2)
      .select("doc_id", "rn", "term", "tf")
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // doc 1: apple tf=2·ln(2) ≈ 1.386 beats banana 1·ln(4/3) ≈ 0.288
    assert(got(1L) == Seq(("apple", 2L), ("banana", 1L)))
    // doc 4: only "date", so k=2 yields a single row
    assert(got(4L) == Seq(("date", 3L)))
    // doc 2: banana ln(4/3)=0.288 < cherry ln(2)=0.693
    assert(got(2L) == Seq(("cherry", 1L), ("banana", 1L)))
  }

  test("tfIdfTopTerms: equal rounded scores fall through to the term tie-break") {
    // two terms with identical (tf, df) in one doc → identical tfidf →
    // alphabetical order decides
    val d = Seq((1L, "zz aa"), (2L, "mm")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(d, "doc_id", k = 2)
      .filter(col("doc_id") === 1L).select("rn", "term")
      .as[(Int, String)].collect().sortBy(_._1).map(_._2)
    assert(got.sameElements(Array("aa", "zz")))
  }
}
