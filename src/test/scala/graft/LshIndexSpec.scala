package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Dedup, LshIndex}

/** Incremental LSH signature maintenance: streaming batches must
  * reproduce the one-shot batch dedup exactly, and replays must be
  * idempotent at both the signature table and the pair log.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted near-duplicates: base docs are random token
  // strings; every third doc gets a 1-token-perturbed twin in a LATER
  // batch slice, so cross-batch pairs genuinely occur
  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(41)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (0L until 30L).map { i =>
      (i, (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val twins = base.filter(_._1 % 3 == 0).map { case (i, text) =>
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = "omega"
      (i + 1000L, toks.mkString(" "))
    }
    base ++ twins
  }

  test("3 AvailableNow batches ≡ one-shot minHashLsh over the union") {
    val docs = corpus()
    val sigPath = Files.createTempDirectory("lsh_sig").toString + "/sig"
    val pairsPath = Files.createTempDirectory("lsh_pairs").toString + "/pairs"
    val cp = Files.createTempDirectory("lsh_cp").toString

    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    assert(batches.size == 3)
    for (b <- batches) {
      mem.addData(b: _*)
      val q = LshIndex.start(
        mem.toDF().toDF("doc_id", "text"), sigPath, pairsPath, cp,
        "doc_id", "text", minJaccard = 0.5, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    val streamed = spark.read.parquet(pairsPath)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = Dedup.minHashLsh(docs.toDF("doc_id", "text"), "doc_id", "text",
        minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(oneShot.nonEmpty, "test corpus produced no near-dup pairs")
    assert(streamed == oneShot,
      s"missing=${(oneShot -- streamed).take(5)} spurious=${(streamed -- oneShot).take(5)}")

    // the signature table holds exactly one row per document
    val sigs = spark.read.parquet(sigPath)
    assert(sigs.count() == docs.size && sigs.select("doc_id").distinct().count() == docs.size)
  }

  test("replayed batch is idempotent: signature table and pair partition unchanged") {
    val docs = corpus()
    val sigPath = Files.createTempDirectory("lsh_sig_r").toString + "/sig"
    val pairsPath = Files.createTempDirectory("lsh_pairs_r").toString + "/pairs"
    val (b1, b2) = docs.splitAt(docs.size / 2)

    LshIndex.processBatch(sigPath, pairsPath, b1.toDF("doc_id", "text"), 0L, "doc_id", "text")
    LshIndex.processBatch(sigPath, pairsPath, b2.toDF("doc_id", "text"), 1L, "doc_id", "text")
    def snapshot() = (
      spark.read.parquet(sigPath).select("doc_id", "n_shingles", "sig")
        .collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(pairsPath).select("id_a", "id_b", "est_jaccard", "batch_id")
        .collect().map(_.toString).sorted.toSeq)
    val before = snapshot()
    // at-least-once delivery: batch 1 arrives again with the same id
    LshIndex.processBatch(sigPath, pairsPath, b2.toDF("doc_id", "text"), 1L, "doc_id", "text")
    assert(snapshot() == before, "replay must not change the table or duplicate pairs")
  }

  test("pairsForDelta sees only pairs involving the delta") {
    val docs = corpus()
    val sigPath = Files.createTempDirectory("lsh_sig_d").toString + "/sig"
    LshIndex.updateSignatureTable(sigPath, docs.toDF("doc_id", "text"), "doc_id", "text")
    // a brand-new twin of doc 0 must pair against the stored corpus
    val twin = Seq((5000L, docs.head._2)).toDF("doc_id", "text")
    val got = LshIndex.pairsForDelta(sigPath, twin, "doc_id", "text", minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.exists(p => p._1 == 0L && p._2 == 5000L && p._3 == 1.0),
      s"identical twin should pair at est 1.0: ${got.toSeq}")
    assert(got.forall(p => p._1 == 5000L || p._2 == 5000L),
      "only delta-involving pairs may be emitted")
  }
}
