package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared TOMBSTONE lifecycle for the rename-swap summary-table indexes
  * ([[LshIndex]] signatures, [[SemIndex]] assignments) — the deletion
  * half of the contract [[TermIndex]] implements with stats deltas.
  * These two stores need no stats adjustment (rows are per-document),
  * so deletion reduces to three index-agnostic pieces:
  *
  *   1. `delete` — record victim ids in a tombstone table partitioned by
  *      `del_batch` with dynamic partition overwrite: replaying a delete
  *      batch overwrites its own partition, the same idempotence stance
  *      as the pair logs. A delete is O(|victims|) — it NEVER rewrites
  *      the summary table (which is why this isn't "just anti-join and
  *      rewrite": at 100 TB the summary table is tens of GB and a
  *      20-row takedown request shouldn't pay a full-table write).
  *   2. `filterLive` — serve-side anti-join against the tombstones;
  *      every read path (pair generation, consumers) goes through it.
  *   3. `currentBatches` + `clearBatches` — the next summary-table
  *      MERGE rewrites the table anyway; it captures the on-disk batch
  *      ids, reads through `filterLive` (so the rewritten table no
  *      longer contains those victims), and after the swap drops
  *      EXACTLY the captured batches: a delete recorded while the merge
  *      ran keeps its partition and folds next merge, instead of being
  *      silently undone by a clear-all. Crash between swap and clear is
  *      safe: leftover tombstones anti-join ids that no longer exist —
  *      a no-op, re-cleared on the next merge. (Single concurrent
  *      maintenance writer per index, the contract all three indexes
  *      already state.)
  *
  * Pair-log rows referencing a deleted id go stale rather than being
  * rewritten (log-structured stance); [[livePairs]] is the read-side
  * filter — both endpoints must still be live. Re-indexing a deleted id
  * is out of contract: new document generations take new ids.
  */
object IndexTombstones {

  def tombstonePath(indexPath: String): String = indexPath + "__tombstones"

  private def exists(spark: SparkSession, path: String): Boolean =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(path))

  /** Record victim ids for `indexPath`. Idempotent per `delBatchId`. */
  def delete(indexPath: String, victims: DataFrame, idCol: String,
      delBatchId: Long): Unit =
    victims.select(col(idCol).as("id")).distinct()
      .withColumn("del_batch", lit(delBatchId))
      .write.options(WriteOpts.data).mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("del_batch")
      .parquet(tombstonePath(indexPath))

  /** Serve-side view of a summary table: rows whose id has no tombstone. */
  def filterLive(table: DataFrame, indexPath: String, idCol: String): DataFrame = {
    val spark = table.sparkSession
    val tp = tombstonePath(indexPath)
    if (!exists(spark, tp)) table
    else table.join(
      spark.read.parquet(tp).select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** Tombstone batch ids currently on disk — capture BEFORE a merge
    * reads through [[filterLive]], so [[clearBatches]] after the swap
    * drops exactly what was folded and nothing recorded since.
    */
  def currentBatches(spark: SparkSession, indexPath: String): Seq[Long] = {
    val tp = new org.apache.hadoop.fs.Path(tombstonePath(indexPath))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) Seq.empty
    else fs.listStatus(tp).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("del_batch=") =>
        n.stripPrefix("del_batch=").toLong }
  }

  /** Drop exactly the tombstone batches a merge folded (the ids captured
    * with [[currentBatches]] before its [[filterLive]] read). A
    * `deleteBatch` recorded AFTER the capture keeps its partition and is
    * folded by the next merge — clearing everything here would silently
    * undo it. Call strictly AFTER the rename-swap commits. A replayed
    * delete of an already-cleared batch recreates tombstones for ids
    * that no longer exist — a harmless anti-join no-op, re-cleared on
    * the next merge.
    */
  def clearBatches(spark: SparkSession, indexPath: String, batches: Seq[Long]): Unit = {
    val tp = new org.apache.hadoop.fs.Path(tombstonePath(indexPath))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) return
    batches.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(tp, s"del_batch=$b"), true); ()
    }
    // Drop the now-empty dir so filterLive's existence probe stays
    // cheap. NON-recursive deletes only: a concurrent deleteBatch can
    // land a fresh del_batch partition between the listing and the
    // delete, and a recursive delete would silently wipe it (TOCTOU).
    // Sweep the marker files one by one, then try the dir itself — if
    // anything landed meanwhile the non-recursive delete fails, which
    // is exactly the safe outcome (the next merge re-clears).
    val leftover = fs.listStatus(tp).toSeq
    if (leftover.forall(s => s.getPath.getName.startsWith("_"))) {
      leftover.filter(_.isFile).foreach { s =>
        try { fs.delete(s.getPath, false); () }
        catch { case _: java.io.IOException => () }
      }
      try { fs.delete(tp, false); () }
      catch { case _: java.io.IOException => () }
    }
  }

  /** Pair-log liveness: keep rows where BOTH endpoints are still in the
    * (tombstone-filtered) summary table. Two semi-joins on the id —
    * hash joins on the summary table, never a pair-log rewrite.
    */
  def livePairs(pairs: DataFrame, indexPath: String, aCol: String, bCol: String,
      idCol: String): DataFrame = {
    val spark = pairs.sparkSession
    val live = filterLive(spark.read.parquet(indexPath), indexPath, idCol)
      .select(col(idCol))
    pairs
      .join(live.select(col(idCol).as(aCol)), Seq(aCol), "left_semi")
      .join(live.select(col(idCol).as(bCol)), Seq(bCol), "left_semi")
  }
}
