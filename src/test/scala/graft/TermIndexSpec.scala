package graft

import org.apache.spark.sql.functions._
import graft.operators.{TermIndex, TextAnalysis}

/** Incremental lexical index ≡ one-shot BM25 — the LshIndexSpec contract
  * for the term-statistics store.
  */
class TermIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def queries = Seq(
    (0L, Seq("spark", "window", "join")),
    (1L, Seq("fast", "scan", "table"))).toDF("qid", "terms")

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Long, Long)] =
    df.select("qid", "doc_id", "rn", "n_terms", "score_micro")
      .as[(Long, Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq

  test("three batches ≡ one-shot bm25TopK; replay idempotent; compaction preserves results") {
    val root = java.nio.file.Files.createTempDirectory("termindex").toString
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "text")

    val oneShot = ranked(TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 10))

    // disjoint thirds arrive as separate batches
    for ((m, bid) <- Seq(0, 1, 2).zipWithIndex)
      TermIndex.updateBatch(root, docs.filter(col("doc_id") % 3 === m), bid.toLong)
    val served = ranked(TermIndex.bm25(spark, root, queries, k = 10))
    assert(served == oneShot, "index-served BM25 must equal the one-shot ranking bit-for-bit")

    // replaying the LAST batch must change nothing (dynamic partition
    // overwrite: the batch replaces its own partitions)
    TermIndex.updateBatch(root, docs.filter(col("doc_id") % 3 === 2), 2L)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 10)) == oneShot,
      "batch replay must be idempotent")

    // compaction folds the stats deltas without changing any ranking
    TermIndex.compactStats(spark, root)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 10)) == oneShot,
      "compaction must preserve rankings")
    // and the df store really is a single base partition — at the
    // batch_id=-1 SENTINEL, which no streaming batch id can collide
    // with (a post-compaction replay of streaming batch 0 must land in
    // its own batch_id=0 partition, not overwrite the folded base)
    val parts = new java.io.File(s"$root/df").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(parts.map(_.getName).toSeq == Seq("batch_id=-1"))
  }

  test("tombstones: delete-then-query excludes the doc; stats stay exact; compaction folds; replay safe") {
    val root = java.nio.file.Files.createTempDirectory("termindex_del").toString
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "text")
    TermIndex.updateBatch(root, docs, 0L)
    val full = TermIndex.bm25(spark, root, queries, k = 1000)
    val fullDocs = full.select("doc_id").as[Long].collect().toSet
    assert(fullDocs.nonEmpty)

    // delete half the retrievable docs
    val victims = fullDocs.filter(_ % 2 == 0)
    TermIndex.deleteBatch(root, victims.toSeq.toDF("doc_id"), 1L)
    val afterDel = ranked(TermIndex.bm25(spark, root, queries, k = 1000))
    assert(afterDel.map(_._2).toSet.intersect(victims).isEmpty,
      "tombstoned docs must not be retrievable")
    // exact-stats contract: serving off the mutated index must be
    // BIT-IDENTICAL to a one-shot BM25 over only the surviving docs
    // (df / N / avgdl all adjust, not just the posting rows)
    val oneShotSurvivors = ranked(TextAnalysis.bm25TopK(
      docs.join(victims.toSeq.toDF("doc_id"), Seq("doc_id"), "left_anti"),
      "doc_id", "text", queries, k = 1000))
    assert(afterDel == oneShotSurvivors,
      "post-delete serving must equal one-shot BM25 over the survivors")

    // replaying the delete batch changes nothing (no double subtraction)
    TermIndex.deleteBatch(root, victims.toSeq.toDF("doc_id"), 1L)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 1000)) == oneShotSurvivors,
      "delete-batch replay must be idempotent")
    // deleting an already-deleted doc via a LATER batch is a no-op too
    TermIndex.deleteBatch(root, victims.take(3).toSeq.toDF("doc_id"), 2L)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 1000)) == oneShotSurvivors,
      "cross-batch double delete must not subtract stats twice")

    // full compaction folds tombstones into the postings and preserves
    // rankings bit-for-bit
    TermIndex.compact(spark, root)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 1000)) == oneShotSurvivors,
      "compaction after delete must preserve rankings")
    assert(!new java.io.File(s"$root/deletes").exists(),
      "compaction must clear the tombstone table")
    val postParts = new java.io.File(s"$root/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(postParts.map(_.getName).toSeq == Seq("batch_id=-1"))
    // a pre-compaction DELETE replay is harmless (victims no longer in
    // the postings -> empty deltas), unlike update replays
    TermIndex.deleteBatch(root, victims.take(3).toSeq.toDF("doc_id"), 1L)
    assert(ranked(TermIndex.bm25(spark, root, queries, k = 1000)) == oneShotSurvivors,
      "post-compaction delete replay must be a no-op")
  }

  test("streaming maintenance: AvailableNow micro-batches ≡ one-shot ranking") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("termindex_s").toString + "/idx"
    val cp = java.nio.file.Files.createTempDirectory("termindex_cp").toString
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)].collect().toSeq

    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    for (b <- docs.grouped((docs.size + 1) / 2)) {
      mem.addData(b: _*)
      val q = TermIndex.start(mem.toDF().toDF("doc_id", "text"), root, cp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    val served = ranked(TermIndex.bm25(spark, root, queries, k = 10))
    val oneShot = ranked(TextAnalysis.bm25TopK(
      docs.toDF("doc_id", "text"), "doc_id", "text", queries, k = 10))
    assert(served == oneShot, "stream-maintained index must equal one-shot ranking")
  }

  test("a new batch can only add or re-rank — previously indexed docs stay retrievable") {
    val root = java.nio.file.Files.createTempDirectory("termindex2").toString
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "text")
    TermIndex.updateBatch(root, docs.filter(col("doc_id") < 100), 0L)
    val before = TermIndex.bm25(spark, root, queries, k = 1000)
      .select("doc_id").as[Long].collect().toSet
    TermIndex.updateBatch(root, docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), 1L)
    val after = TermIndex.bm25(spark, root, queries, k = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(before.subsetOf(after),
      "growing the index must never lose a previously retrievable document")
    assert((after -- before).forall(_ >= 100))
  }
}
