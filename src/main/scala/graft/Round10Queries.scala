package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{ChangeFeed, TableVersions}

/** Round-10 oracle queries: atomic dynamic-partition replacement
  * (q131 — [[TableVersions.replacePartitions]], the incremental-
  * materialization primitive the versioned lakehouse refresh runs on)
  * and change-feed-driven materialized-view maintenance (q132 —
  * [[ChangeFeed.refreshPartitionsFrom]], a summary table fed purely by
  * the source's CDF). Both build a temp versioned table from the sf
  * tables, drive the operator, and read the final state so DuckDB can
  * hash the exact semantics from plain SQL.
  */
object Round10Queries {
  import Tables.t

  private def rmTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path).getParentFile)
  }

  /** REPLACE PARTITIONS (q131): orders land partitioned by order year;
    * a correction batch atomically swaps 1995 for a re-priced copy AND
    * drops 1996 in the same commit (`drop` — a refresh that empties a
    * partition must not leave stale files); a replayed commit with the
    * same txn id is a no-op. The oracle computes the same final state
    * in SQL: 1995 re-priced, 1996 absent, everything else untouched.
    *
    * Scale shape: the swap is O(staged batch + commit metadata) — the
    * untouched years carry by reference (zero data motion), partition
    * selection reads the commit, and readers only ever see a whole
    * version. This is the fact-refresh primitive at 100 TB: a
    * 15-minute cycle rewrites a handful of date partitions, never the
    * table.
    */
  def q131ReplacePartitions(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_rp"
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("yr", year(col("o_orderdate")))
    TableVersions.append(spark, root, orders.repartition(4), partitionBy = Seq("yr"))
    val correction = orders.filter(col("yr") === 1995)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
    TableVersions.replacePartitions(spark, root, correction,
      txn = Some("correction" -> 1L), drop = Seq(Map("yr" -> "1996")))
    // exactly-once: the replayed batch must change nothing
    val v = TableVersions.replacePartitions(spark, root, correction,
      txn = Some("correction" -> 1L), drop = Seq(Map("yr" -> "1996")))
    require(v == TableVersions.currentVersion(spark, root).get)
    val res = TableVersions.read(spark, root)
      .groupBy(col("yr"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("yr")
  }

  val q131Sql: String =
    """WITH c AS (
      |  SELECT o_orderkey, o_orderdate,
      |    CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
      |      THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
      |    EXTRACT(year FROM o_orderdate) AS yr
      |  FROM orders WHERE EXTRACT(year FROM o_orderdate) <> 1996)
      |SELECT CAST(yr AS INT) AS yr, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM c GROUP BY 1 ORDER BY yr""".stripMargin

  /** CHANGE-FEED-FED MATERIALIZED VIEW (q132): orders land versioned in
    * three commits (initial load, an append batch, a partition
    * replacement), and a downstream per-year summary table is
    * maintained PURELY from the source's change feed by
    * [[ChangeFeed.refreshPartitionsFrom]] — each source version
    * recomputes only the years whose rows changed and swaps them
    * exactly-once (txn = consumer, source version). The query reads the
    * SUMMARY table; the oracle computes the same summary from the final
    * source state directly — feed-driven maintenance must converge to
    * the one-shot answer.
    *
    * Scale shape: per source commit the consumer pays O(changed
    * partitions), not O(view); catch-up is one readChanges plan; a
    * crash replays one version into a txn-guarded no-op. This is the
    * generalized form of the index-maintenance follower, usable by any
    * partition-wise view.
    */
  def q132CdfView(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_tv").toString
    val root = base + "/orders_src"
    val viewRoot = base + "/orders_summary"
    val ckpt = base + "/_ckpt"
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("yr", year(col("o_orderdate")))
    def summarize(src: DataFrame): DataFrame =
      src.groupBy(col("yr"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
            .as("total_price"))
    def catchUp(): Seq[Long] = ChangeFeed.refreshPartitionsFrom(
      spark, root, viewRoot, ckpt, "summary", "yr")(summarize)

    TableVersions.append(spark, root,
      orders.filter(col("o_orderkey") % 3 =!= 0).repartition(4), partitionBy = Seq("yr"))
    catchUp() // consumer reaches the initial load
    TableVersions.append(spark, root, orders.filter(col("o_orderkey") % 3 === 0).repartition(2))
    TableVersions.replacePartitions(spark, root,
      orders.filter(col("yr") === 1994)
        .withColumn("o_totalprice", col("o_totalprice") - 5.0))
    catchUp() // two more source versions flow through the feed
    require(catchUp().isEmpty) // caught up: the feed is drained
    val res = TableVersions.read(spark, viewRoot)
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("yr")
  }

  val q132Sql: String =
    """WITH c AS (
      |  SELECT EXTRACT(year FROM o_orderdate) AS yr,
      |    CASE WHEN EXTRACT(year FROM o_orderdate) = 1994
      |      THEN o_totalprice - 5.0 ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT CAST(yr AS INT) AS yr, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM c GROUP BY 1 ORDER BY yr""".stripMargin

  /** DELETION VECTORS end-to-end (q133): orders land Z-ordered on the
    * key, a small takedown runs as a MERGE-ON-READ delete (positional
    * tombstone sidecar — no data file rewritten), a second DV delete
    * merges the first's tombstones forward, a too-large delete falls
    * back to the rewrite path, and compaction folds the remaining DVs
    * away. The result reads the final state; the oracle applies the
    * same three predicates in SQL — the tombstone/fold machinery must
    * be invisible to query semantics at every point.
    *
    * Scale shape: the takedowns write O(deleted rows) bytes against a
    * table whose candidate files are stats-pruned from the commit; the
    * fraction guard keeps sidecars small so every read's anti-join
    * build side stays broadcast-sized; rewrites re-materialize
    * tombstones away so they never accumulate past the next
    * maintenance pass.
    */
  def q133DeletionVectors(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_mor"
    val tv = TableVersions
    tv.append(spark, root, t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")))
    tv.optimizeZOrder(spark, root, Seq("o_orderkey"), numFiles = 8)
    // small takedowns: merge-on-read (verified: the listing is unchanged).
    // The fraction guard is per CANDIDATE file, so the delete ranges are
    // SCALE-RELATIVE (keys here are dense 0..m): a 2%-of-keyspace range
    // is ~16% of the one Z-ordered file holding it at EVERY sf, keeping
    // the DV-vs-rewrite routing deterministic across scales. The oracle
    // mirrors the ranges with m = max(o_orderkey) scalar subqueries.
    val m = t(spark, dir, "orders").agg(max(col("o_orderkey"))).head().getLong(0)
    val files0 = tv.listing(spark, root).map(_._1).toSet
    tv.deleteWhere(spark, root, col("o_orderkey").between(100L, 100L + m / 50),
      bounds = Map("o_orderkey" -> (100.0, (100L + m / 50).toDouble)), maxDvFraction = 0.2)
    tv.deleteWhere(spark, root, col("o_orderkey").between(m / 2, m / 2 + m / 100),
      bounds = Map("o_orderkey" -> ((m / 2).toDouble, (m / 2 + m / 100).toDouble)),
      maxDvFraction = 0.2)
    require(tv.listing(spark, root).map(_._1).toSet == files0,
      "small deletes must not rewrite data files")
    require(tv.commitState(spark, root).dvs.nonEmpty)
    // a bulk delete (the top fifth of the keyspace) exceeds the
    // fraction guard and rewrites
    tv.deleteWhere(spark, root, col("o_orderkey") > m * 4 / 5,
      bounds = Map("o_orderkey" -> ((m * 4 / 5).toDouble, Double.MaxValue)),
      maxDvFraction = 0.2)
    // compaction folds whatever tombstones remain
    tv.compact(spark, root, targetBytes = 64L << 20)
    val res = tv.read(spark, root)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("month")
  }

  val q133Sql: String =
    """WITH mx AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS m FROM orders)
      |SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM orders, mx
      |WHERE o_orderkey NOT BETWEEN 100 AND 100 + m // 50
      |  AND o_orderkey NOT BETWEEN m // 2 AND m // 2 + m // 100
      |  AND o_orderkey <= m * 4 // 5
      |GROUP BY 1 ORDER BY month""".stripMargin
}
