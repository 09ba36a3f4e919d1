package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexTombstones, IvfIndex, LshIndex, SemIndex}

/** Tombstone deletion for the LSH and semantic indexes (the
  * [[graft.operators.IndexTombstones]] lifecycle; TermIndexSpec covers
  * the stats-bearing variant): a deleted doc stops pairing, its old
  * pairs go stale behind livePairs, the next merge folds the tombstones
  * away, and delete replays are idempotent.
  */
class IndexDeletionSpec extends SparkSpec {
  import spark.implicits._

  // three mutually-near-dup docs (1-token perturbations) + filler
  private val docs: Seq[(Long, String)] = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq(
      1L -> base,
      2L -> base.replace("beta", "omega"),
      3L -> base.replace("kappa", "sigma"),
      10L -> "one two three four five six seven eight nine ten eleven twelve",
      11L -> "red green blue cyan magenta yellow black white gray pink brown teal")
  }

  test("LSH: delete stops future pairing, hides old pairs, folds at next merge, replays idempotently") {
    val sig = Files.createTempDirectory("lshdel").toString + "/sig"
    val pairs = Files.createTempDirectory("lshdel").toString + "/pairs"

    LshIndex.processBatch(sig, pairs, docs.toDF("doc_id", "text"), 0L, "doc_id", "text",
      minJaccard = 0.5)
    // doc 3 arrives in batch 1 and pairs with BOTH 1 and 2
    val d3 = docs.filter(_._1 == 3L)
    LshIndex.processBatch(sig, pairs,
      d3.toDF("doc_id", "text"), 1L, "doc_id", "text", minJaccard = 0.5)
    val before = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 2 and 3 are each 1 token from 1 (J≈0.6) but 2 tokens from each
    // other (J≈0.33 < 0.5) — the live pairs are exactly via doc 1
    assert(before.contains((1L, 2L)) && before.contains((1L, 3L)))

    // delete doc 2: its pairs go stale immediately, no table rewrite yet
    LshIndex.deleteBatch(sig, Seq(2L).toDF("doc_id"), "doc_id", delBatchId = 0L)
    val after = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after === before.filterNot(p => p._1 == 2L || p._2 == 2L))
    assert(spark.read.parquet(sig).filter(col("doc_id") === 2L).count() == 1,
      "delete must NOT rewrite the signature table")

    // a new twin of doc 2 pairs with 1 and 3, never with deleted 2
    val d4 = Seq(4L -> docs.head._2.replace("mu", "nu"))
    val newPairs = LshIndex.pairsForDelta(sig, d4.toDF("doc_id", "text"),
        "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(newPairs.exists(_._2 == 4L) && !newPairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"deleted doc resurfaced in $newPairs")

    // the next merge folds the tombstone: table row gone, tombstones cleared
    LshIndex.updateSignatureTable(sig, d4.toDF("doc_id", "text"), "doc_id", "text")
    assert(spark.read.parquet(sig).filter(col("doc_id") === 2L).count() == 0)
    assert(!new java.io.File(IndexTombstones.tombstonePath(sig)).exists(),
      "tombstones must clear once folded")
    // stale pair-log rows STAY hidden after the fold (endpoint absent from table)
    val folded = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(folded === after)

    // replaying the delete batch after the fold is a harmless no-op
    LshIndex.deleteBatch(sig, Seq(2L).toDF("doc_id"), "doc_id", delBatchId = 0L)
    val replayed = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(replayed === after)
  }

  test("LSH: deleting an id that was never indexed is a harmless no-op") {
    val sig = Files.createTempDirectory("lshdel").toString + "/sig"
    val pairs = Files.createTempDirectory("lshdel").toString + "/pairs"
    LshIndex.processBatch(sig, pairs, docs.toDF("doc_id", "text"), 0L, "doc_id", "text",
      minJaccard = 0.5)
    val before = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    LshIndex.deleteBatch(sig, Seq(424242L).toDF("doc_id"), "doc_id", delBatchId = 0L)
    val after = LshIndex.livePairs(spark, pairs, sig, "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after === before)
    assert(spark.read.parquet(sig).count() === docs.size.toLong)
    // the next merge folds the pointless tombstone away without damage
    LshIndex.updateSignatureTable(sig,
      Seq(500L -> "completely unrelated new words here now").toDF("doc_id", "text"),
      "doc_id", "text")
    assert(spark.read.parquet(sig).count() === docs.size.toLong + 1)
  }

  test("SEM: delete stops future edges, hides old edges, folds at next merge") {
    val cents = IvfIndex.frozenCentroids(8, 8).map { case (c, a) => (c.toLong, a) }
    // vectors 1,2,3 nearly identical; 10,11 far away
    val v = Array(1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3)
    val vecs = Seq(
      1L -> v,
      2L -> v.map(_ + 0.005),
      3L -> v.map(_ + 0.01),
      10L -> Array(-1.0, 0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3),
      11L -> Array(0.1, -0.9, 0.8, -0.7, 0.6, -0.5, 0.4, -0.3))
    val asg = Files.createTempDirectory("semdel").toString + "/asg"
    val pairs = Files.createTempDirectory("semdel").toString + "/pairs"

    SemIndex.processBatch(asg, pairs, vecs.toDF("vec_id", "vec"), 0L, "vec_id", "vec", cents)
    SemIndex.deleteBatch(asg, Seq(2L).toDF("vec_id"), "vec_id", delBatchId = 0L)

    val after = SemIndex.livePairs(spark, pairs, asg, "vec_id")
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(after === Set((1L, 3L)), s"expected only the 1-3 edge to stay live, got $after")

    // a new twin of the deleted vector pairs with 1 and 3 only
    val d4 = Seq(4L -> v.map(_ + 0.002))
    val newEdges = SemIndex.pairsForDelta(asg, d4.toDF("vec_id", "vec"),
        "vec_id", "vec", cents)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(newEdges === Set((1L, 4L), (3L, 4L)), s"got $newEdges")

    SemIndex.updateAssignmentTable(asg, d4.toDF("vec_id", "vec"), "vec_id", "vec", cents)
    assert(spark.read.parquet(asg).filter(col("vec_id") === 2L).count() == 0)
    assert(!new java.io.File(IndexTombstones.tombstonePath(asg)).exists())
  }

  test("clearBatches drops only the batches a merge captured: a delete recorded meanwhile survives") {
    val idx = Files.createTempDirectory("tomb").toString + "/table"
    Seq(1L -> "a", 2L -> "b", 3L -> "c", 10L -> "d").toDF("id", "v")
      .write.parquet(idx)
    IndexTombstones.delete(idx, Seq(2L).toDF("id"), "id", delBatchId = 0L)
    IndexTombstones.delete(idx, Seq(3L).toDF("id"), "id", delBatchId = 1L)
    // a merge captures the on-disk batches, THEN a new delete lands
    // (the interleaving the old clear-all silently undid)
    val captured = IndexTombstones.currentBatches(spark, idx)
    assert(captured.sorted === Seq(0L, 1L))
    IndexTombstones.delete(idx, Seq(10L).toDF("id"), "id", delBatchId = 2L)
    IndexTombstones.clearBatches(spark, idx, captured)
    assert(IndexTombstones.currentBatches(spark, idx) === Seq(2L),
      "the concurrent delete's tombstones must survive the scoped clear")
    val live = IndexTombstones.filterLive(spark.read.parquet(idx), idx, "id")
      .select("id").as[Long].collect().toSet
    assert(!live.contains(10L), "the surviving tombstone still hides its victim")
    // clearing the remainder empties the tombstone dir entirely
    IndexTombstones.clearBatches(spark, idx, Seq(2L))
    assert(!new java.io.File(IndexTombstones.tombstonePath(idx)).exists())
  }
}
