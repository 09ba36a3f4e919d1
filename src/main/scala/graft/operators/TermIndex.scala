package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental LEXICAL index maintenance — the BM25-serving analogue of
  * [[LshIndex]] (minhash signatures) and [[SemIndex]] (embedding
  * assignments): new document batches fold into a persisted postings +
  * statistics store, and ranked retrieval runs off the store WITHOUT
  * ever re-tokenizing the historical corpus.
  *
  * Layout under `root/`, every table partitioned by `batch_id` and
  * written with dynamic partition overwrite, so a REPLAYED batch
  * overwrites its own partition instead of double-counting — the same
  * exactly-once stance as LshIndex's pair log:
  *
  *  - `postings/` (id, term, tf, dl) — one row per (doc, term)
  *  - `df/`       (term, df) — the batch's document-frequency DELTA
  *  - `scalars/`  (n_docs, sum_dl) — the batch's corpus-scalar delta
  *
  * Counts are additive across disjoint batches, so serving aggregates
  * the deltas: `df(term) = Σ batches`, `N = Σ n_docs`,
  * `avgdl = Σ sum_dl / N` — exact integers, bit-equal to a one-shot
  * computation over the concatenated corpus. [[bm25]] feeds them into
  * the SAME scoring core as the from-text path
  * ([[TextAnalysis.bm25Rank]]), so index-served rankings are
  * bit-identical to `bm25TopK` over the same documents (spec-pinned).
  *
  * The index is append-only: re-delivering a batch id is idempotent,
  * but mutating a document requires rebuild (or a compact-then-rewrite
  * cycle) — the standard contract of log-structured text indexes.
  * [[compactStats]] folds the accumulated delta partitions into a
  * single base partition (rename-swap, no crash window); after
  * compaction, replays of pre-compaction batch ids are NO LONGER
  * idempotent (their partitions were folded into the base) — compaction
  * is a watermark, as with any compacted log.
  *
  * 100 TB shape: maintenance cost is linear in the DELTA (tokenize the
  * batch, two aggregations); serving reads the posting rows of the
  * query terms only after the df/scalars aggregations (|vocab| and
  * |batches| sized, not corpus-sized).
  */
object TermIndex {

  private def postingsPath(root: String) = s"$root/postings"
  private def dfPath(root: String) = s"$root/df"
  private def scalarsPath(root: String) = s"$root/scalars"

  /** Fold one document batch into the index (idempotent per batchId). */
  def updateBatch(root: String, batch: DataFrame, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val toks = TextAnalysis.bm25Tokens(batch.dropDuplicates(idCol), idCol, textCol)
    val tf = graft.CacheScope.trackCheckpoint(
      TextAnalysis.bm25Postings(toks, idCol).localCheckpoint(true))
    def write(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    write(tf, postingsPath(root))
    write(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), dfPath(root))
    write(toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")),
      scalarsPath(root))
  }

  /** BM25 top-k served from the index — no text, no re-tokenization.
    * Same output contract (and bit-identical results) as
    * [[TextAnalysis.bm25TopK]] over the indexed documents.
    */
  def bm25(spark: SparkSession, root: String, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id"): DataFrame = {
    val post = spark.read.parquet(postingsPath(root)).drop("batch_id")
    val dfc = spark.read.parquet(dfPath(root))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(scalarsPath(root))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    TextAnalysis.bm25Rank(post, dfc, stats, queries, idCol, k, k1, b)
  }

  /** Fold the df/scalars delta partitions into a single base partition
    * (batch_id = 0) so the per-query delta aggregation stays O(vocab),
    * not O(vocab · batches). Rename-swap per table — no crash window
    * (the LshIndex signature-table mechanics). Establishes a replay
    * watermark: see the object scaladoc.
    */
  def compactStats(spark: SparkSession, root: String): Unit = {
    def fold(path: String, agg: DataFrame => DataFrame): Unit = {
      val merged = agg(spark.read.parquet(path))
        .withColumn("batch_id", lit(0L))
        .localCheckpoint(true)
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hconf)
      val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
      merged.write.mode("overwrite").partitionBy("batch_id").parquet(tmp.toString)
      graft.CacheScope.freeCheckpoint(merged)
      val old = new org.apache.hadoop.fs.Path(path + "__precompact")
      fs.delete(old, true)
      require(fs.rename(p, old), s"compactStats: could not move $p aside")
      if (!fs.rename(tmp, p)) {
        val restored = fs.rename(old, p)
        throw new IllegalStateException(
          s"compactStats: could not activate $tmp; " +
            (if (restored) s"restored original at $p"
             else s"RESTORE FAILED — stats are at $old, manual rename required"))
      }
      fs.delete(old, true)
    }
    fold(dfPath(root), df => df.groupBy(col("term")).agg(sum(col("df")).as("df")))
    fold(scalarsPath(root), df =>
      df.agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))
  }

  /** Streaming wiring (the [[LshIndex.start]] shape): maintain the index
    * from a document stream; Structured Streaming's batch ids + the
    * dynamic-overwrite layout give exactly-once folds across restarts.
    */
  def start(docs: DataFrame, root: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("term_index_maintenance")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) updateBatch(root, batch, batchId, idCol, textCol)
      }
      .start()
}
