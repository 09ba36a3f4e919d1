package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{LshIndex, SemIndex, TableVersions, TermIndex}

/** UNIFIED incremental-index maintenance: one streaming job feeds the
  * same document batches — under the SAME Structured Streaming batch
  * ids — into all three serving indexes:
  *
  *  - [[LshIndex]]   minhash signature table + near-dup pair log
  *  - [[SemIndex]]   embedding assignment table + semantic edge log
  *  - [[TermIndex]]  BM25 postings + corpus statistics
  *
  * This is the deployment shape of the 100 TB curation story: a corpus
  * delta lands once, and lexical dedup, semantic dedup and ranked
  * retrieval all advance in lockstep. Because every store is
  * batch_id-idempotent (dynamic partition overwrite for the logs and
  * stats deltas; replace-on-id rename-swap for the summary tables), a
  * crash between the three updates is repaired by the stream's replay
  * of the same batch id: the already-updated stores absorb the replay
  * as a no-op and the missed ones catch up — the batch id is the
  * consistency token that makes the tri-store update atomic-in-effect
  * without a cross-store transaction.
  *
  * Update ORDER inside a batch still matters for the pair logs: each
  * index emits its batch's pairs against the PRE-batch corpus before
  * folding the batch in ([[LshIndex.processBatch]] /
  * [[SemIndex.processBatch]] do this internally), so a replayed batch
  * recomputes identical pairs. IndexPipelineSpec pins tri-store
  * consistency at every batch boundary and joint replay idempotence.
  *
  * The batch is persisted once here: the three maintenance paths scan
  * it ~5 times between them, and re-pulling a source micro-batch that
  * many times is wasted I/O at scale.
  */
object IndexPipeline {

  /** Store layout under one root. */
  case class Roots(root: String) {
    val corpus = s"$root/corpus"
    val lshSignatures = s"$root/lsh/signatures"
    val lshPairs = s"$root/lsh/pairs"
    val semAssignments = s"$root/sem/assignments"
    val semPairs = s"$root/sem/pairs"
    val term = s"$root/term"
  }

  /** Fold one (doc_id, text, embedding) batch into the CORPUS TABLE and
    * all three indexes under one batch id. The corpus lands FIRST as a
    * [[TableVersions.appendTxn]] commit (exactly-once via the txn
    * record), so at every batch boundary the versioned table IS the
    * ground truth the indexes serve — a reader can join retrieval
    * results back to a consistent corpus snapshot by version.
    * Idempotent per batchId (each store's own contract); safe to re-run
    * after a partial failure.
    */
  def processBatch(roots: Roots, batch: DataFrame, batchId: Long,
      centArr: Seq[(Long, Array[Double])],
      idCol: String = "doc_id", textCol: String = "text", vecCol: String = "embedding",
      threshold: Double = 0.95, subCellBits: Int = 0,
      numHashes: Int = 32, bands: Int = 8, minJaccard: Double = 0.5,
      k: Int = 3, portable: Boolean = true): Unit = {
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      TableVersions.appendTxn(b.sparkSession, roots.corpus,
        b.select(col(idCol), col(textCol), col(vecCol)), "index_pipeline", batchId)
      // the three stores are independent (disjoint paths, each
      // batch-id-idempotent) — overlap their maintenance jobs
      // (optimization-guide §2.6); a crash leaving any subset updated
      // is repaired by the same replay that repaired the serialized
      // form, order across stores never mattered (scaladoc above)
      graft.operators.Par.run(Seq(
        () => LshIndex.processBatch(roots.lshSignatures, roots.lshPairs,
          b.select(col(idCol), col(textCol)), batchId, idCol, textCol,
          numHashes, bands, minJaccard, k, portable),
        () => SemIndex.processBatch(roots.semAssignments, roots.semPairs,
          b.select(col(idCol), col(vecCol)), batchId, idCol, vecCol,
          centArr, threshold, subCellBits),
        () => TermIndex.updateBatch(roots.term, b.select(col(idCol), col(textCol)),
          batchId, idCol, textCol)))
    } finally b.unpersist(blocking = false)
  }

  /** Streaming wiring: one query, three stores, shared batch ids. */
  def start(docs: DataFrame, roots: Roots, checkpoint: String,
      centArr: Seq[(Long, Array[Double])],
      idCol: String = "doc_id", textCol: String = "text", vecCol: String = "embedding",
      threshold: Double = 0.95, subCellBits: Int = 0,
      numHashes: Int = 32, bands: Int = 8, minJaccard: Double = 0.5,
      k: Int = 3, portable: Boolean = true,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("unified_index_maintenance")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(roots, batch, batchId, centArr, idCol, textCol, vecCol,
            threshold, subCellBits, numHashes, bands, minJaccard, k, portable)
      }
      .start()

  // ------------------------------------------------------------------
  // CHANGE-FEED-DRIVEN variant: the corpus is a versioned table SOMEONE
  // ELSE maintains (e.g. [[TableVersions.startAppend]] ingest, CDC
  // apply); the indexes follow it through [[TableVersions.readChanges]]
  // instead of a separate document stream. The commit VERSION is the
  // batch id, so every store inherits the same idempotence story — a
  // crash mid-version is repaired by re-running followCorpus (the
  // stores absorb the replayed version as a no-op) — and the versioned
  // table is by construction the ground truth at every boundary.
  // ------------------------------------------------------------------

  private def progressPath(roots: Roots) =
    new org.apache.hadoop.fs.Path(roots.root, "_follow_progress")

  private def readProgress(spark: SparkSession, roots: Roots): Long = {
    val p = progressPath(roots)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
  }

  private def writeProgress(spark: SparkSession, roots: Roots, v: Long): Unit = {
    val p = progressPath(roots)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes) finally out.close()
  }

  /** Advance all three indexes to the corpus table's CURRENT version by
    * consuming its change feed from the last followed version: inserts
    * index as a batch with batchId = commit version, deletes tombstone
    * under the same id. The progress marker is written per applied
    * version AFTER its stores advance, so a crash replays EXACTLY the
    * in-flight version into idempotent stores (spec-pinned). The
    * marker must never be reset below the last applied version:
    * replaying an older version against a newer store is out of
    * contract — the pair logs would pair that batch against corpus
    * state it never saw (the same last-batch-only replay window the
    * stream-fed driver inherits from Structured Streaming's
    * checkpoint). Pure layout rewrites (compaction, Z-order) emit no
    * changes and cost nothing here.
    *
    * Contract: a FOLLOWED corpus is append + whole-document-delete
    * (takedown); re-writing an existing doc id (upsert of a followed
    * id) is rejected loudly — document generations take new ids, the
    * same stance as [[graft.operators.IndexTombstones]] (a tombstoned
    * id must not be re-indexed).
    *
    * Returns the versions applied (empty when already caught up).
    */
  def followCorpus(roots: Roots, spark: SparkSession,
      centArr: Seq[(Long, Array[Double])],
      idCol: String = "doc_id", textCol: String = "text", vecCol: String = "embedding",
      threshold: Double = 0.95, subCellBits: Int = 0,
      numHashes: Int = 32, bands: Int = 8, minJaccard: Double = 0.5,
      k: Int = 3, portable: Boolean = true): Seq[Long] = {
    val cur = TableVersions.currentVersion(spark, roots.corpus).getOrElse(return Seq.empty)
    val from = readProgress(spark, roots)
    if (cur <= from) return Seq.empty
    val changes = TableVersions.readChanges(spark, roots.corpus, from, cur)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val versions = changes.select("_commit_version").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      versions.foreach { v =>
        val step = changes.filter(col("_commit_version") === v)
        val ins = step.filter(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version")
        val del = step.filter(col("_change_type") === "delete")
          .drop("_change_type", "_commit_version")
        val overlap = ins.select(col(idCol))
          .join(del.select(col(idCol)), Seq(idCol), "left_semi").limit(1).count()
        require(overlap == 0L,
          s"followCorpus: corpus version $v rewrites existing document ids; " +
            "a followed corpus is append + delete only — new document " +
            "generations must take new ids (tombstoned ids cannot re-index)")
        // per store the delete→insert order holds (each store's thunk
        // is not split); ACROSS stores the updates are independent and
        // overlap (guide §2.6) — the per-version marker below is still
        // written only after ALL stores advance, so the crash-replay
        // window is unchanged
        if (!del.isEmpty) {
          val victims = del.select(col(idCol))
          graft.operators.Par.run(Seq(
            () => LshIndex.deleteBatch(roots.lshSignatures, victims, idCol, v),
            () => SemIndex.deleteBatch(roots.semAssignments, victims, idCol, v),
            () => TermIndex.deleteBatch(roots.term, victims, v, idCol)))
        }
        if (!ins.isEmpty) {
          graft.operators.Par.run(Seq(
            () => LshIndex.processBatch(roots.lshSignatures, roots.lshPairs,
              ins.select(col(idCol), col(textCol)), v, idCol, textCol,
              numHashes, bands, minJaccard, k, portable),
            () => SemIndex.processBatch(roots.semAssignments, roots.semPairs,
              ins.select(col(idCol), col(vecCol)), v, idCol, vecCol,
              centArr, threshold, subCellBits),
            () => TermIndex.updateBatch(roots.term, ins.select(col(idCol), col(textCol)),
              v, idCol, textCol)))
        }
        writeProgress(spark, roots, v)
      }
      // catch up past trailing change-free versions (pure layout rewrites)
      writeProgress(spark, roots, cur)
      versions
    } finally { changes.unpersist(blocking = false); () }
  }

  /** DISTRIBUTED consistency probe — the production-scale form of
    * [[indexedIds]]: per-store distinct-id counts plus each store's
    * symmetric-difference size against the corpus, computed with
    * distributed anti-joins (nothing but the final scalar row reaches
    * the driver). All three `vs_corpus` differences are 0 at every
    * batch boundary by construction.
    */
  def consistencyProbe(spark: SparkSession, roots: Roots,
      idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    def ids(df: DataFrame, c: String): DataFrame =
      df.select(col(c).cast("long").as("id")).distinct()
    val corpus = ids(TableVersions.read(spark, roots.corpus), idCol)
    val stores = Seq(
      "lsh" -> ids(spark.read.parquet(roots.lshSignatures), idCol),
      "sem" -> ids(spark.read.parquet(roots.semAssignments), idCol),
      "term" -> ids(spark.read.parquet(s"${roots.term}/postings"), idCol))
    val rows = ("corpus", corpus.count(), 0L) +: stores.map { case (name, s) =>
      val missing = corpus.join(s, Seq("id"), "left_anti").count()
      val extra = s.join(corpus, Seq("id"), "left_anti").count()
      (name, s.count(), missing + extra)
    }
    rows.toDF("store", "n_ids", "vs_corpus")
  }

  /** Spec-facing consistency probe: the indexed document-id set of each
    * store — equal at every batch boundary by construction
    * (spec-pinned). Collects every distinct id to the driver; tests
    * only — production monitoring uses [[consistencyProbe]].
    */
  def indexedIds(spark: SparkSession, roots: Roots,
      idCol: String = "doc_id"): Map[String, Set[Long]] = {
    def ids(path: String, c: String): Set[Long] =
      spark.read.parquet(path).select(col(c).cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
    Map(
      "corpus" -> TableVersions.read(spark, roots.corpus)
        .select(col(idCol).cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet,
      "lsh" -> ids(roots.lshSignatures, idCol),
      "sem" -> ids(roots.semAssignments, idCol),
      "term" -> ids(s"${roots.term}/postings", idCol))
  }
}
