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

  test("ngramLogprob: hand-computed add-1 bigram scores on a tiny corpus") {
    // corpus: "a b", "a b", "a c" → N = 6 tokens, V = 3 {a, b, c}
    // c(a)=3 c(b)=2 c(c)=1; bigrams c(a,b)=2 c(a,c)=1
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramLogprob(d, "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // replicate the operator's integer micro-unit scheme: per-token
    // HALF_UP(ln·1e6) as long, integer half-up division for the mean
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def avg(lps: Long*): Double = {
      val s = lps.sum; val n = lps.size
      val t = -s // logprobs are negative here
      -((t * 2 + n) / (2L * n)).toDouble / 1e6
    }
    // doc 1/2: pos1 "a" unigram ln((3+1)/(6+3)); pos2 "b" bigram ln((2+1)/(3+3))
    val lpA = micro(math.log(4.0 / 9.0)); val lpAB = micro(math.log(3.0 / 6.0))
    assert(got(1L) == (2L, avg(lpA, lpAB)) && got(2L) == (2L, avg(lpA, lpAB)))
    // doc 3: "a" unigram + bigram (a,c): ln((1+1)/(3+3))
    val lpAC = micro(math.log(2.0 / 6.0))
    assert(got(3L) == (2L, avg(lpA, lpAC)))
    // the filter signal: repetitive boilerplate (high-count bigrams)
    // scores ABOVE rare-vocabulary text — both tails of the quality cut
    val d2 = Seq((1L, "x y x y x y"), (2L, "q r")).toDF("doc_id", "text")
    val g2 = TextAnalysis.ngramLogprob(d2, "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(g2(1L) > g2(2L))
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
