package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{IvfIndex, TermIndex, TextAnalysis}
import graft.streaming.IndexPipeline

/** The unified maintenance driver: ONE stream advances the lexical
  * (LSH), semantic (assignment) and term (BM25) stores in lockstep
  * under shared batch ids — consistent at every batch boundary,
  * replay-idempotent together, and each store still serving its own
  * one-shot-equivalent results.
  */
class IndexPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private val cents = IvfIndex.frozenCentroids(8, dims).map { case (c, a) => (c.toLong, a) }

  /** (doc_id, text, embedding): the sf0.001 documents joined with the
    * id-aligned embeddings — the IndexPipeline input contract — plus
    * planted twins (same text, +0.01 embedding, id+100000) so both
    * pair logs genuinely emit: sorted by id, the twins land in LATER
    * batches and their pairs are cross-batch.
    */
  private def corpus(): Seq[(Long, String, Array[Double])] = {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    val base = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
      .flatMap { case (id, v) => docs.get(id).map(t => (id, t, v)) }
    val twins = base.filter(_._1 < 8)
      .map { case (id, t, v) => (id + 100000L, t, v.map(_ + 0.01)) }
    base ++ twins
  }

  private def queries = Seq(
    (0L, Seq("spark", "window", "join")),
    (1L, Seq("fast", "scan", "table"))).toDF("qid", "terms")

  test("one stream, three stores: consistent at every batch boundary, jointly replay-idempotent") {
    val docs = corpus()
    assert(docs.size >= 12, s"fixture too small: ${docs.size}")
    val roots = IndexPipeline.Roots(Files.createTempDirectory("idxpipe").toString + "/idx")
    val cp = Files.createTempDirectory("idxpipe_cp").toString

    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Double])]
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    var delivered = Set.empty[Long]
    for (b <- batches) {
      mem.addData(b: _*)
      val q = IndexPipeline.start(
        mem.toDF().toDF("doc_id", "text", "embedding"), roots, cp, cents,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
      delivered ++= b.map(_._1)
      // BOUNDARY INVARIANT: all three stores index exactly the
      // delivered set — no store ahead of or behind another
      val ids = IndexPipeline.indexedIds(spark, roots)
      assert(ids("corpus") == delivered, s"corpus table diverged at ${delivered.size} docs")
      assert(ids("lsh") == delivered, s"lsh store diverged at ${delivered.size} docs")
      assert(ids("sem") == delivered, s"sem store diverged at ${delivered.size} docs")
      assert(ids("term") == delivered, s"term store diverged at ${delivered.size} docs")
    }

    // each store serves its one-shot-equivalent result off the shared
    // stream (deep equivalence is each index's own spec; here: the
    // term store must rank bit-identically to one-shot BM25, proving
    // the shared driver changed no store's semantics)
    val served = TermIndex.bm25(spark, roots.term, queries, k = 10)
      .select("qid", "doc_id", "rn", "score_micro").as[(Long, Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val oneShot = TextAnalysis.bm25TopK(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), "doc_id", "text", queries, k = 10)
      .select("qid", "doc_id", "rn", "score_micro").as[(Long, Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(served == oneShot, "term store must serve one-shot-equivalent rankings")

    // JOINT REPLAY: re-deliver the last batch under its original batch
    // id (the crash-recovery path) — every store must absorb it as a
    // no-op, together
    def snapshot(): Map[String, Seq[String]] = Map(
      "corpus" -> graft.operators.TableVersions.read(spark, roots.corpus)
        .collect().map(_.toString).sorted.toSeq,
      "lshSig" -> spark.read.parquet(roots.lshSignatures).collect().map(_.toString).sorted.toSeq,
      "lshPairs" -> spark.read.parquet(roots.lshPairs).collect().map(_.toString).sorted.toSeq,
      "semAsg" -> spark.read.parquet(roots.semAssignments).collect().map(_.toString).sorted.toSeq,
      "semPairs" -> spark.read.parquet(roots.semPairs).collect().map(_.toString).sorted.toSeq,
      "termPost" -> spark.read.parquet(s"${roots.term}/postings").collect().map(_.toString).sorted.toSeq,
      "termDf" -> spark.read.parquet(s"${roots.term}/df").collect().map(_.toString).sorted.toSeq,
      "termScalars" -> spark.read.parquet(s"${roots.term}/scalars").collect().map(_.toString).sorted.toSeq)
    // the planted twins must actually have produced pairs in BOTH logs
    // (otherwise the replay check below would vacuously pass on empties)
    assert(spark.read.parquet(roots.lshPairs).count() > 0, "lsh pair log empty")
    assert(spark.read.parquet(roots.semPairs).count() > 0, "sem edge log empty")

    val before = snapshot()
    IndexPipeline.processBatch(roots,
      batches.last.toDF("doc_id", "text", "embedding"), batchId = (batches.size - 1).toLong,
      cents)
    val after = snapshot()
    for ((store, rows) <- before)
      assert(after(store) == rows, s"replay mutated the $store store")
  }

  test("change-feed variant: following a versioned corpus reproduces the stream-fed stores; deletes flow through") {
    import graft.operators.{IndexTombstones, LshIndex, TableVersions}
    val docs = corpus()
    val batches = docs.grouped((docs.size + 1) / 2).toSeq
    assert(batches.size === 2)

    // reference state: the stream-shaped driver, batch ids 0 and 1
    val streamRoots = IndexPipeline.Roots(Files.createTempDirectory("idxcdf").toString + "/s")
    batches.zipWithIndex.foreach { case (b, i) =>
      IndexPipeline.processBatch(streamRoots, b.toDF("doc_id", "text", "embedding"),
        i.toLong, cents)
    }

    // followed state: the corpus is a versioned table someone else
    // appends to (commit versions 0 and 1 — the same ids)
    val roots = IndexPipeline.Roots(Files.createTempDirectory("idxcdf").toString + "/f")
    TableVersions.append(spark, roots.corpus, batches.head.toDF("doc_id", "text", "embedding"))
    // mid-stream catch-up works too: follow after the first commit...
    assert(IndexPipeline.followCorpus(roots, spark, cents) === Seq(0L))
    TableVersions.append(spark, roots.corpus, batches(1).toDF("doc_id", "text", "embedding"))
    assert(IndexPipeline.followCorpus(roots, spark, cents) === Seq(1L))
    assert(IndexPipeline.followCorpus(roots, spark, cents) === Seq.empty, "caught up: no-op")

    def stores(r: IndexPipeline.Roots): Map[String, Seq[String]] = Map(
      "lshSig" -> spark.read.parquet(r.lshSignatures).collect().map(_.toString).sorted.toSeq,
      "lshPairs" -> spark.read.parquet(r.lshPairs).collect().map(_.toString).sorted.toSeq,
      "semAsg" -> spark.read.parquet(r.semAssignments).collect().map(_.toString).sorted.toSeq,
      "semPairs" -> spark.read.parquet(r.semPairs).collect().map(_.toString).sorted.toSeq,
      "termPost" -> spark.read.parquet(s"${r.term}/postings").collect().map(_.toString).sorted.toSeq,
      "termDf" -> spark.read.parquet(s"${r.term}/df").collect().map(_.toString).sorted.toSeq,
      "termScalars" -> spark.read.parquet(s"${r.term}/scalars").collect().map(_.toString).sorted.toSeq)
    val ref = stores(streamRoots)
    val fol = stores(roots)
    for ((store, rows) <- ref)
      assert(fol(store) == rows, s"CDF-fed $store diverged from the stream-fed store")

    // the distributed probe agrees: every store covers the corpus exactly
    val probe = IndexPipeline.consistencyProbe(spark, roots)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(probe.forall(_._3 == 0L), s"vs_corpus differences must be 0: ${probe.toSeq}")
    assert(probe.map(_._2).distinct.length === 1, s"all stores same id count: ${probe.toSeq}")

    // a corpus takedown (row-level delete of one doc) flows to all
    // three indexes as tombstones at the deleting version
    val victim = batches.head.head._1
    val Some(dv) = TableVersions.deleteWhere(spark, roots.corpus,
      col("doc_id") === victim): @unchecked
    assert(IndexPipeline.followCorpus(roots, spark, cents) === Seq(dv))
    val lshLive = IndexTombstones.filterLive(
        spark.read.parquet(roots.lshSignatures), roots.lshSignatures, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(!lshLive.contains(victim), "lsh store must hide the deleted doc")
    val semLive = IndexTombstones.filterLive(
        spark.read.parquet(roots.semAssignments), roots.semAssignments, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(!semLive.contains(victim), "sem store must hide the deleted doc")
    assert(TermIndex.bm25(spark, roots.term, queries, k = 1000)
      .filter(col("doc_id") === victim).count() === 0, "bm25 must not serve the deleted doc")
    // deleted pairs go stale in the served pair log
    val livePairIds = LshIndex.livePairs(spark, roots.lshPairs, roots.lshSignatures, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!livePairIds.exists(p => p._1 == victim || p._2 == victim))

    // crash-replay: the marker is written AFTER each version's stores
    // advance, so a crash replays exactly the in-flight version — roll
    // the marker back one boundary and rerun: every store absorbs the
    // replayed version as a no-op. (Replaying OLDER versions against a
    // newer store is out of contract — the pair logs would pair the old
    // batch against corpus state it never saw; the per-version marker
    // write is what bounds replay to the idempotent window.)
    val marker = new java.io.File(roots.root, "_follow_progress")
    assert(marker.exists)
    val preReplay = stores(roots)
    val mfs = new org.apache.hadoop.fs.Path(roots.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mout = mfs.create(new org.apache.hadoop.fs.Path(roots.root, "_follow_progress"), true)
    try mout.write((dv - 1).toString.getBytes) finally mout.close()
    assert(IndexPipeline.followCorpus(roots, spark, cents) === Seq(dv), "replays the in-flight version")
    val postReplay = stores(roots)
    for ((store, rows) <- preReplay)
      assert(postReplay(store) == rows, s"crash replay of version $dv mutated the $store store")

    // an upsert of an EXISTING id is rejected loudly (new generations
    // take new ids — tombstoned ids cannot re-index)
    val survivor = batches.head.drop(1).head
    TableVersions.upsert(spark, roots.corpus,
      Seq((survivor._1, "rewritten text", survivor._3)).toDF("doc_id", "text", "embedding"),
      "doc_id")
    val e = intercept[IllegalArgumentException] {
      IndexPipeline.followCorpus(roots, spark, cents)
    }
    assert(e.getMessage.contains("append + delete only"))
  }
}
