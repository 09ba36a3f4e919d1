package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Versioned parquet tables — ATOMIC commits, TIME TRAVEL, and
  * optimistic concurrency over plain parquet files, the minimal core of
  * what Delta/Iceberg layer onto a lake (and what the reference gets
  * implicitly from BigQuery's managed storage). Together with
  * [[FileManifest]] (file-level stats) and [[Compaction]] (bin
  * packing), this completes a self-contained table format:
  *
  * Layout:
  * {{{
  *   <root>/data/<batch-uuid>/part-*.parquet   immutable data files
  *   <root>/_versions/v<N>.commit              version N's COMMIT FILE:
  *                                             the full file listing
  * }}}
  *
  * COMMIT PROTOCOL: data files are written first (invisible until
  * committed — readers only follow commit files), then the commit file
  * is created with `FileSystem.create(path, overwrite = false)` — one
  * atomic operation that BOTH claims version N and carries its content
  * (the Delta-log stance: the claim and the listing cannot diverge
  * because they are the same file). Exactly one concurrent writer's
  * create succeeds; the loser re-reads the new latest version, rebases
  * its file delta, and retries at N+1. Appends always rebase cleanly
  * (they only ADD files); [[compact]] aborts on conflict instead (its
  * removals may overlap the winner's — single maintenance writer, the
  * same contract as the incremental indexes). A writer crashing
  * mid-write leaves a commit file without the `#END <n>` sentinel;
  * readers treat such versions as never committed.
  *
  * TIME TRAVEL: a version's listing references immutable files, so
  * `read(root, Some(v))` reproduces any retained version bit-for-bit —
  * compaction rewrites the FUTURE listing, never the files an old
  * version points to. [[vacuum]] deletes files unreachable from the
  * retained versions (and is the only thing that ever deletes data).
  *
  * Scale shape: a commit is one metadata file (one line per file — KBs
  * to MBs even for huge tables); readers do one `_versions` listing +
  * one small read before the real scan. No data file is ever rewritten
  * in place, so readers racing writers always see a consistent
  * version. Stats-pruned reads compose via
  * [[FileManifest.collectFiles]] over the listing.
  */
object TableVersions {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(root: String) = new Path(root, "_versions")
  private def commitPath(root: String, v: Long) = new Path(versionsDir(root), s"v$v.commit")

  /** Parse a commit file; None if absent or torn (no matching #END). */
  private def readCommit(spark: SparkSession, root: String, v: Long): Option[Seq[(String, Long)]] = {
    val f = fs(spark, root)
    val p = commitPath(root, v)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    if (lines.isEmpty || !lines.last.startsWith("#END ")) return None
    // '#'-prefixed lines are metadata (txn records); the #END count
    // covers the FILE lines only
    val files = lines.init.filterNot(_.startsWith("#")).map { l =>
      val i = l.lastIndexOf('\t')
      (l.substring(0, i), l.substring(i + 1).toLong)
    }.toSeq
    if (lines.last != s"#END ${files.size}") None else Some(files)
  }

  /** Every version NUMBER with a commit file, torn or not — torn ones
    * are burned (their name is claimed) but carry no readable state.
    */
  private def claimedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val vd = versionsDir(root)
    if (!f.exists(vd)) Seq.empty
    else f.listStatus(vd).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".commit") =>
        n.stripPrefix("v").stripSuffix(".commit").toLong }
  }

  /** Highest fully-committed version, if any (torn commits skipped). */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    claimedVersions(spark, root)
      .sorted(Ordering[Long].reverse)
      .find(v => readCommit(spark, root, v).isDefined)

  /** The file listing of `version` (default: latest): (file, n_bytes). */
  def listing(spark: SparkSession, root: String, version: Option[Long] = None): Seq[(String, Long)] = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $root"))
    readCommit(spark, root, v)
      .getOrElse(throw new IllegalArgumentException(s"version $v absent or torn at $root"))
  }

  /** Read the table at `version` (default: latest). `mergeSchema`
    * reconciles files committed under EVOLVED schemas (appends that
    * added columns): older files null-fill the new columns, the usual
    * additive-evolution contract. Off by default — schema merging
    * footer-reads every file, which the common fixed-schema read
    * shouldn't pay.
    */
  def read(spark: SparkSession, root: String, version: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val files = listing(spark, root, version).map(_._1)
    require(files.nonEmpty, s"empty version at $root")
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(files: _*)
  }

  /** Try to claim version `v` with `files` as its listing: the create is
    * the atomic claim; content follows in the same stream. True = owned.
    */
  private def tryCommit(spark: SparkSession, root: String, v: Long,
      files: Seq[(String, Long)]): Boolean =
    tryCommitLines(spark, root, v, files, Seq.empty)

  private def tryCommitLines(spark: SparkSession, root: String, v: Long,
      files: Seq[(String, Long)], meta: Seq[String]): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(versionsDir(root))
    val out =
      try f.create(commitPath(root, v), false)
      catch { case _: java.io.IOException => return false } // another writer claimed v
    try {
      val sb = new StringBuilder
      meta.foreach(m => sb.append(m).append('\n'))
      files.foreach { case (p, b) => sb.append(p).append('\t').append(b).append('\n') }
      sb.append(s"#END ${files.size}\n")
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    true
  }

  /** Stage `df` as new data files and commit them as an APPEND. Returns
    * the committed version. Safe under concurrent appends: on commit
    * conflict the file delta is rebased onto the winner's listing and
    * retried (appends commute).
    */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val f = fs(spark, root)
    val batchDir = new Path(root, s"data/batch-${java.util.UUID.randomUUID()}")
    df.write.parquet(batchDir.toString)
    val added = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    var attempt = 0
    while (attempt < 100) {
      val base = currentVersion(spark, root)
      val prev = base.map(v => listing(spark, root, Some(v))).getOrElse(Seq.empty)
      // claim PAST every existing commit file: a torn commit burns its
      // number (the name is taken even though the state is unreadable)
      val v = (claimedVersions(spark, root) ++ base).foldLeft(-1L)(math.max) + 1
      if (tryCommitLines(spark, root, v, prev ++ added,
          renderTxns(currentTxns(spark, root)))) return v
      attempt += 1
    }
    throw new IllegalStateException(s"append: lost $attempt commit races at $root")
  }

  /** Rewrite undersized files into ~`targetBytes` bins
    * ([[Compaction.plan]] over the live listing — the listing is
    * metadata, so the single-window plan is a driver-sized job) and
    * commit the new layout as the next version. Old versions keep
    * reading their original files — compaction is invisible to time
    * travel until [[vacuum]]. Returns the new version, or None when
    * there is nothing to merge or the commit raced a concurrent writer
    * (removals don't rebase; the staged rewrite is abandoned).
    */
  def compact(spark: SparkSession, root: String, targetBytes: Long): Option[Long] = {
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"nothing committed at $root"))
    val files = listing(spark, root, Some(base))
    import spark.implicits._
    val planned = Compaction.plan(files.toDF("file", "bytes"), Seq.empty, "file", "bytes",
        targetBytes)
      .select("file", "bytes", "bin", "bin_files")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toMerge = planned.filter(_._4 > 1).groupBy(_._3) // only multi-file bins rewrite
    if (toMerge.isEmpty) return None
    val outDir = new Path(root, s"data/compact-${java.util.UUID.randomUUID()}")
    val newFiles = toMerge.toSeq.sortBy(_._1).flatMap { case (bin, members) =>
      val binDir = new Path(outDir, s"bin-$bin")
      spark.read.parquet(members.map(_._1): _*).coalesce(1).write.parquet(binDir.toString)
      f.listStatus(binDir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.toString, s.getLen))
    }
    val merged = toMerge.values.flatten.map(_._1).toSet
    val kept = files.filterNot { case (p, _) => merged(p) }
    // claim past torn commits too, but only if no GOOD commit landed
    // since `base` — removals don't rebase
    val v = (claimedVersions(spark, root) :+ base).max + 1
    if (currentVersion(spark, root).contains(base) &&
        tryCommitLines(spark, root, v, kept ++ newFiles,
          renderTxns(txnsOf(spark, root, base)))) Some(v)
    else { f.delete(outDir, true); None } // conflict: abandon the rewrite
  }

  /** Row-level DELETE — the takedown/GDPR path, Delta's DELETE shape:
    * find the files that COULD hold matching rows (the [[FileManifest]]
    * stats prune when `bounds` are given — a 20-row deletion against a
    * Z-ordered 100 TB table rewrites a handful of files, not the
    * table), rewrite only those files with the predicate inverted, and
    * commit kept + rewritten as the next version. Untouched files are
    * carried by reference. Old versions still see the deleted rows
    * until [[vacuum]] — point-in-time reads are the feature, not a
    * leak; vacuum is the compliance boundary. Returns the new version,
    * or None when no file could match (nothing to do) or the commit
    * raced a concurrent writer (removals don't rebase — same contract
    * as [[compact]]).
    */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column,
      bounds: Map[String, (Double, Double)] = Map.empty): Option[Long] = {
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"nothing committed at $root"))
    val files = listing(spark, root, Some(base))
    val candidates =
      if (bounds.isEmpty) files.map(_._1)
      else FileManifest.candidateFiles(
        FileManifest.collectFiles(spark, files, bounds.keys.toSeq), bounds)
    if (candidates.isEmpty) return None
    val outDir = new Path(root, s"data/delete-${java.util.UUID.randomUUID()}")
    val survivors = spark.read.parquet(candidates: _*).filter(!predicate)
    survivors.write.parquet(outDir.toString)
    val newFiles = f.listStatus(outDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val touched = candidates.toSet
    val kept = files.filterNot { case (p, _) => touched(p) }
    val v = (claimedVersions(spark, root) :+ base).max + 1
    if (currentVersion(spark, root).contains(base) &&
        tryCommitLines(spark, root, v, kept ++ newFiles,
          renderTxns(txnsOf(spark, root, base)))) Some(v)
    else { f.delete(outDir, true); None }
  }

  /** UPSERT (MERGE by key) — the CDC-apply primitive: rows in `updates`
    * REPLACE same-key rows and new keys INSERT. File selection is
    * stats-driven like [[deleteWhere]]: the files whose recorded key
    * range intersects the updates' key range are rewritten (existing
    * rows anti-joined against the update keys, then the updates
    * appended); every other file carries by reference — conservative by
    * the same argument (a file outside the updates' key range cannot
    * hold a key being replaced). Clustered tables therefore pay
    * O(touched files), not O(table), per CDC batch; unclustered tables
    * degrade to a full rewrite, which is what clustering is for.
    * Returns the new version; None on commit conflict (removals don't
    * rebase — single maintenance writer).
    *
    * Contract: `updates` carries the table's schema with at most one
    * row per key — pre-aggregate a CDC stream to last-writer-wins
    * upstream; duplicate keys here would land as duplicate rows (the
    * union semantics say so rather than silently electing a winner).
    */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCol: String): Option[Long] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"nothing committed at $root"))
    val files = listing(spark, root, Some(base))
    val range = updates.agg(
      min(col(keyCol).cast("double")), max(col(keyCol).cast("double"))).head()
    if (range.isNullAt(0)) return Some(base) // empty updates: no-op
    val candidates = FileManifest.candidateFiles(
      FileManifest.collectFiles(spark, files, Seq(keyCol)),
      Map(keyCol -> (range.getDouble(0), range.getDouble(1))))
    val outDir = new Path(root, s"data/upsert-${java.util.UUID.randomUUID()}")
    val rewritten =
      if (candidates.isEmpty) updates // pure insert
      else spark.read.parquet(candidates: _*)
        .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(updates)
    rewritten.write.parquet(outDir.toString)
    val newFiles = f.listStatus(outDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val touched = candidates.toSet
    val kept = files.filterNot { case (p, _) => touched(p) }
    val v = (claimedVersions(spark, root) :+ base).max + 1
    if (currentVersion(spark, root).contains(base) &&
        tryCommitLines(spark, root, v, kept ++ newFiles,
          renderTxns(txnsOf(spark, root, base)))) Some(v)
    else { f.delete(outDir, true); None }
  }

  /** OPTIMIZE ZORDER — rewrite the CURRENT version's data Z-ordered on
    * `keys` ([[ZOrder.cluster]]) and commit as the next version, so
    * subsequent [[prunedRead]]s skip files on multi-column boxes. Same
    * conflict contract as [[compact]].
    */
  def optimizeZOrder(spark: SparkSession, root: String, keys: Seq[String],
      numFiles: Int): Option[Long] = {
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"nothing committed at $root"))
    val files = listing(spark, root, Some(base))
    val outDir = new Path(root, s"data/zorder-${java.util.UUID.randomUUID()}")
    ZOrder.cluster(spark.read.parquet(files.map(_._1): _*), keys, numFiles)
      .write.parquet(outDir.toString)
    val newFiles = f.listStatus(outDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    val v = (claimedVersions(spark, root) :+ base).max + 1
    if (currentVersion(spark, root).contains(base) &&
        tryCommitLines(spark, root, v, newFiles,
          renderTxns(txnsOf(spark, root, base)))) Some(v)
    else { f.delete(outDir, true); None }
  }

  /** Delete data files unreachable from the newest `keepVersions`
    * versions, then drop the older commit files. The only destructive
    * operation in the format.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1)
    val f = fs(spark, root)
    val latest = currentVersion(spark, root).getOrElse(return)
    val keepFrom = math.max(0L, latest - keepVersions + 1)
    val vd = versionsDir(root)
    val all = f.listStatus(vd).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".commit") =>
        n.stripPrefix("v").stripSuffix(".commit").toLong }.sorted
    val live = all.filter(_ >= keepFrom)
      .flatMap(v => readCommit(spark, root, v).toSeq.flatten.map(_._1)).toSet
    val dataDir = new Path(root, "data")
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val dead = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !live(st.getPath.toString)) dead += st.getPath
      }
      dead.foreach(p => f.delete(p, false))
    }
    all.filter(_ < keepFrom).foreach { v => f.delete(commitPath(root, v), false); () }
  }

  /** Stats-pruned read of the latest version: [[FileManifest]] over the
    * listing, then only the candidate files for `bounds`.
    */
  def prunedRead(spark: SparkSession, root: String, statCols: Seq[String],
      bounds: Map[String, (Double, Double)]): DataFrame = {
    val manifest = FileManifest.collectFiles(spark, listing(spark, root, None), statCols)
    FileManifest.prunedScan(spark, manifest, bounds)
  }

  /** Commit HISTORY, newest first: (version, n_files, n_bytes, txns) —
    * one metadata read per retained version, no data access.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    claimedVersions(spark, root).sorted(Ordering[Long].reverse)
      .flatMap { v =>
        readCommit(spark, root, v).map { files =>
          (v, files.size.toLong, files.map(_._2).sum,
            renderTxns(txnsOf(spark, root, v)).mkString(";"))
        }
      }
      .toDF("version", "n_files", "n_bytes", "txns")
  }

  /** METADATA-only diff between two versions: which files were added
    * and removed — how compaction/delete/optimize impact is audited
    * without touching data.
    */
  def diffListing(spark: SparkSession, root: String, from: Long, to: Long): DataFrame = {
    import spark.implicits._
    val a = listing(spark, root, Some(from)).toMap
    val b = listing(spark, root, Some(to)).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(f => (f, b(f), "added")) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(f => (f, a(f), "removed"))
    rows.toDF("file", "n_bytes", "change")
  }

  /** CONTENT diff between two versions: rows present in exactly one
    * (bag semantics — duplicates count). A full shuffle of both
    * versions; for a cheap audit use [[diffListing]] — this is the
    * row-accurate form for compliance checks ("which rows did the
    * takedown actually remove").
    */
  def diffRows(spark: SparkSession, root: String, from: Long, to: Long): DataFrame = {
    val a = read(spark, root, Some(from))
    val b = read(spark, root, Some(to))
    b.exceptAll(a).withColumn("change", org.apache.spark.sql.functions.lit("added"))
      .unionByName(a.exceptAll(b)
        .withColumn("change", org.apache.spark.sql.functions.lit("removed")))
  }

  // ------------------------------------------------------------------
  // EXACTLY-ONCE streaming ingest: the commit file records which
  // (txnApp, txnBatch) produced it — the Delta `txn` action. A replayed
  // foreachBatch sees its batch id already committed and skips, so a
  // crash between the table commit and the streaming checkpoint write
  // cannot double-append.
  // ------------------------------------------------------------------

  private def txnLine(app: String, batch: Long) = s"#TXN $app $batch"

  /** Per-app latest txn batch ids recorded in a GOOD version's commit
    * file. Every commit carries the full map forward (see the writers
    * below), so only the latest version ever needs reading — a torn
    * commit's txn lines never count (its data never landed), and
    * compaction or another writer committing on top cannot orphan a
    * stream's txn state.
    */
  private def txnsOf(spark: SparkSession, root: String, v: Long): Map[String, Long] = {
    if (readCommit(spark, root, v).isEmpty) return Map.empty // torn: nothing applied
    val f = fs(spark, root)
    val in = f.open(commitPath(root, v))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    text.split("\n").filter(_.startsWith("#TXN ")).map { l =>
      val Array(_, app, b) = l.split(" ", 3)
      app -> b.toLong
    }.groupMapReduce(_._1)(_._2)(math.max)
  }

  private def currentTxns(spark: SparkSession, root: String): Map[String, Long] =
    currentVersion(spark, root).map(v => txnsOf(spark, root, v)).getOrElse(Map.empty)

  private def renderTxns(t: Map[String, Long]): Seq[String] =
    t.toSeq.sortBy(_._1).map { case (a, b) => txnLine(a, b) }

  /** Highest batch id committed for `app`, if any. */
  def lastTxn(spark: SparkSession, root: String, app: String): Option[Long] =
    currentTxns(spark, root).get(app)

  /** [[append]] tagged with a transaction id: a no-op when (`app`,
    * `batchId`) is already committed. Returns the version holding the
    * batch (existing or new).
    */
  def appendTxn(spark: SparkSession, root: String, df: DataFrame,
      app: String, batchId: Long): Long = {
    if (lastTxn(spark, root, app).exists(_ >= batchId))
      return currentVersion(spark, root).get // replay — already applied
    val f = fs(spark, root)
    val batchDir = new Path(root, s"data/batch-${java.util.UUID.randomUUID()}")
    df.write.parquet(batchDir.toString)
    val added = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
    var attempt = 0
    while (attempt < 100) {
      if (lastTxn(spark, root, app).exists(_ >= batchId)) { // raced a replayed twin
        f.delete(batchDir, true)
        return currentVersion(spark, root).get
      }
      val base = currentVersion(spark, root)
      val prev = base.map(v => listing(spark, root, Some(v))).getOrElse(Seq.empty)
      val v = (claimedVersions(spark, root) ++ base).foldLeft(-1L)(math.max) + 1
      val txns = currentTxns(spark, root) + (app -> batchId)
      if (tryCommitLines(spark, root, v, prev ++ added, renderTxns(txns)))
        return v
      attempt += 1
    }
    throw new IllegalStateException(s"appendTxn: lost $attempt commit races at $root")
  }

  /** Stream `df` into the table with exactly-once appends: one commit
    * per micro-batch, idempotent under foreachBatch replay via the txn
    * record above.
    */
  def startAppend(df: DataFrame, root: String, checkpoint: String, app: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .queryName(s"table_versions_append_$app")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { appendTxn(batch.sparkSession, root, batch, app, batchId); () }
      }
      .start()
}
