package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, VectorOps}

/** BM25 ranked retrieval and int8 scalar quantization — hand-computed
  * rankings and reconstruction bounds.
  */
class SearchQuantSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana banana"),
    (2L, "apple apple apple apple"),
    (3L, "cherry"),
    (4L, "banana cherry date apple")).toDF("doc_id", "text")

  private def bm25(queries: Seq[(Long, Seq[String])]): Map[Long, Seq[(Long, Long)]] =
    TextAnalysis.bm25TopK(docs, "doc_id", "text", queries.toDF("qid", "terms"), k = 10)
      .select("qid", "doc_id", "rn", "score_micro")
      .as[(Long, Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)).toSeq).toMap

  test("bm25: tf saturation with length norm, hand-checked ranking") {
    // "apple": df=3, N=4 → idf = ln(1 + 1.5/3.5); avgdl = 12/4 = 3.
    // d2 (tf 4, dl 4) saturates higher than d1 (tf 1, dl 3) and
    // d4 (tf 1, dl 4, longer doc penalized below d1).
    val got = bm25(Seq((0L, Seq("apple"))))(0L)
    assert(got.map(_._1) == Seq(2L, 1L, 4L))
    // hand-compute d1: idf ln(1+1.5/3.5) rounded micro; contribution
    // tf=1, dl=3=avgdl → idf · 2.2/(1 + 1.2) = idf
    val idfMicro = math.rint(math.log(1.0 + 1.5 / 3.5) * 1e6)
    assert(got.find(_._1 == 1L).get._2 ==
      math.rint(idfMicro / 1e6 * (2.2 / (1 + 1.2 * (0.25 + 0.75 * (3.0 / 3.0)))) * 1e6).toLong)
  }

  test("bm25: rare term outweighs common term; absent terms contribute nothing") {
    // "cherry" df=2 has higher idf than "apple" df=3: d3 (cherry only,
    // dl=1) must outrank d2 (apple only) for the combined query.
    val got = bm25(Seq((0L, Seq("apple", "cherry", "zzz_absent"))))(0L)
    assert(got.map(_._1).take(2) == Seq(3L, 4L)) // d4 matches both terms
    assert(got.size == 4)
    // a query of only absent terms returns no rows at all
    assert(bm25(Seq((1L, Seq("zzz", "yyy")))).isEmpty)
  }

  private val vecs = Seq(
    (0L, Array(0.0, 10.0, 5.0)),
    (1L, Array(1.0, 10.0, -5.0)),
    (2L, Array(2.0, 10.0, 0.0)),
    (3L, Array(4.0, 10.0, 2.5))).toDF("id", "vec")

  test("quantizeInt8: codes in [-127,127], constant dims map to 0, reconstruction within half-step") {
    val q = VectorOps.quantizeInt8(vecs, "vec", "q")
      .select("id", "vec", "q").as[(Long, Array[Double], Array[Int])].collect()
    val mns = Array(0.0, 10.0, -5.0); val mxs = Array(4.0, 10.0, 5.0)
    q.foreach { case (_, v, codes) =>
      assert(codes.length == 3 && codes.forall(c => c >= -127 && c <= 127))
      assert(codes(1) == 0) // constant dimension
      for (d <- Seq(0, 2)) {
        val recon = (codes(d) + 127) / 254.0 * (mxs(d) - mns(d)) + mns(d)
        assert(math.abs(recon - v(d)) <= (mxs(d) - mns(d)) / 254.0 / 2 + 1e-9,
          s"dim $d: recon $recon vs ${v(d)}")
      }
    }
    // min and max of a dimension land on the extreme codes
    val byId = q.map(r => r._1 -> r._3).toMap
    assert(byId(0L)(0) == -127 && byId(3L)(0) == 127)
    assert(byId(1L)(2) == -127 && byId(0L)(2) == 127)
  }

  test("quantizedTopK: candidate generation finds the exact top-1 on separated clusters") {
    // 20 corpus vectors in two tight clusters around orthogonal axes;
    // queries sit on the axes, so quantized dot ordering preserves the
    // true nearest cluster and the exact re-rank matches brute force.
    val base = (0 until 20).map { i =>
      val axis = i % 2; val eps = (i / 2) * 0.01
      val v = Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else 0.0) + (if (d == 4) eps else 0.0))
      (i.toLong + 10, v)
    }
    val corpus = base.toDF("id", "vec")
    val queries = Seq(
      (0L, Array.tabulate(8)(d => if (d == 0) 1.0 else 0.0)),
      (1L, Array.tabulate(8)(d => if (d == 1) 1.0 else 0.0))).toDF("qid", "qvec")
    val stats = VectorOps.int8Stats(corpus, "vec")
    val qc = VectorOps.quantizeInt8(corpus, "vec", "q", Some(stats))
    val qq = VectorOps.quantizeInt8(queries, "qvec", "qq", Some(stats))
    val got = VectorOps.quantizedTopK(qc, qq, k = 3, candidates = 8)
      .select("qid", "neighbor_id", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val exact = VectorOps.cosineTopK(corpus, queries, k = 3)
      .select("qid", "neighbor_id", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got(0L).head == exact(0L).head && got(1L).head == exact(1L).head)
    // every returned neighbor lies on the query's own axis-cluster
    assert(got(0L).forall(id => (id - 10) % 2 == 0))
    assert(got(1L).forall(id => (id - 10) % 2 == 1))
  }
}
