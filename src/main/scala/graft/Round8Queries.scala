package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.TableVersions

/** Round-8 oracle queries: the full fact-grain twin (q127 — the last
  * `hc_fact_encounters` shape certified only by specs until now), the
  * partitioned versioned table end-to-end (q128), and the change feed
  * against an oracle-computed diff (q129).
  */
object Round8Queries {
  import Tables.t

  /** FACT-GRAIN TWIN (q127): the exact `fact_patient_encounters` shape
    * (SURVEY J1+J2+W1+W2+A1-A3, `fact_patient_encounters.sql:81-239`)
    * over the events table so the DuckDB oracle can hash the FULL grain:
    * purchases (vitals) LEFT band-join clicks (claims) within ±6h with a
    * ROW_NUMBER proximity rank, the result LEFT band-joins views (EHR)
    * with a second rank, then the wide GROUP BY over the whole grain —
    * conditional counts, the weighted complexity score and the
    * encounter-type/risk categorizations, with rank=1 primary
    * projections. Unlike the reference model, every window order is a
    * TOTAL order (diff, id tiebreaks) so the ranks are engine-exact.
    *
    * Scale shape (same as the fact): both joins and both windows
    * cluster on `user_id`, so Catalyst plans ONE exchange and reuses it
    * through both joins and both sorts; the band predicates stay
    * residuals on the equi-join, bounded by per-user event counts in
    * the ±6h window. The grain GROUP BY rides the same clustering.
    */
  def q127FactGrainTwin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        col("ts").as("c_ts"), col("value").as("c_value"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("vu"), col("ts").as("v_ts"))
    val cDiff = abs(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
    val j1 = p.join(c, col("user_id") === col("cu") && cDiff <= 21600000000L, "left")
      .withColumn("c_diff_us", cDiff)
      .withColumn("click_rank", row_number().over(
        Window.partitionBy(col("user_id"), col("p_id"))
          .orderBy(cDiff.asc, col("c_id").asc)))
      .drop("cu", "c_ts")
    val vDiff = abs(unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
    // W2 ranks over the J1 grain (click rows included), exactly like the
    // fact's ehr_proximity_rank — the c_id tiebreak totalizes the order
    val j2 = j1.join(v, col("user_id") === col("vu") && vDiff <= 21600000000L, "left")
      .withColumn("v_diff_us", vDiff)
      .withColumn("view_rank", row_number().over(
        Window.partitionBy(col("user_id"), col("p_id"))
          .orderBy(vDiff.asc, col("v_id").asc, col("c_id").asc)))
      .drop("vu", "v_ts")
    val grain = Seq("p_id", "user_id", "p_ts", "p_value", "c_id", "c_value",
      "c_diff_us", "click_rank", "v_id", "v_diff_us", "view_rank")
    j2.groupBy(grain.map(col): _*)
      .agg(
        countDistinct(col("c_id")).as("total_clicks"),
        countDistinct(col("v_id")).as("total_views"),
        sum(when(col("c_value") > 300.0, 1L).otherwise(0L)).as("high_value_clicks"))
      .withColumn("primary_click_id", when(col("click_rank") === 1, col("c_id")))
      .withColumn("primary_click_diff_us", when(col("click_rank") === 1, col("c_diff_us")))
      .withColumn("primary_view_id", when(col("view_rank") === 1, col("v_id")))
      // weighted composite (A3): integer weights in tenths, one exact
      // final division — engine-identical, no float accumulation
      .withColumn("complexity_score",
        (col("total_clicks") * 3 + col("total_views") * 2 +
          col("high_value_clicks") * 5) / lit(10.0))
      .withColumn("engagement_type",
        when(col("total_clicks") > 0 && col("total_views") > 0, "comprehensive")
          .when(col("total_clicks") > 0, "clicks_only")
          .when(col("total_views") > 0, "views_only")
          .otherwise("purchase_only"))
      .withColumn("value_band",
        when(col("p_value") > 400.0, "high")
          .when(col("p_value") > 200.0, "medium")
          .otherwise("low"))
      .select(col("p_id"), col("user_id"), col("p_ts"),
        col("primary_click_id"), col("primary_click_diff_us"), col("primary_view_id"),
        col("total_clicks"), col("total_views"), col("high_value_clicks"),
        col("complexity_score"), col("engagement_type"), col("value_band"))
      .orderBy("p_id", "primary_click_id", "primary_view_id")
  }

  val q127Sql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts, value AS p_value FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id AS cu, CAST(ts AS TIMESTAMP) AS c_ts, value AS c_value FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id AS v_id, user_id AS vu, CAST(ts AS TIMESTAMP) AS v_ts FROM events WHERE event_type = 'view'),
      |j1 AS (SELECT p.p_id, p.user_id, p.p_ts, p.p_value, c.c_id, c.c_value,
      |    abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) AS c_diff_us,
      |    ROW_NUMBER() OVER (PARTITION BY p.user_id, p.p_id
      |      ORDER BY abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) ASC, c.c_id ASC) AS click_rank
      |  FROM p LEFT JOIN c ON p.user_id = c.cu
      |    AND abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) <= 21600000000),
      |j2 AS (SELECT j1.p_id, j1.user_id, j1.p_ts, j1.p_value, j1.c_id, j1.c_value,
      |    j1.c_diff_us, j1.click_rank, v.v_id,
      |    abs(epoch_us(j1.p_ts) - epoch_us(v.v_ts)) AS v_diff_us,
      |    ROW_NUMBER() OVER (PARTITION BY j1.user_id, j1.p_id
      |      ORDER BY abs(epoch_us(j1.p_ts) - epoch_us(v.v_ts)) ASC, v.v_id ASC, j1.c_id ASC) AS view_rank
      |  FROM j1 LEFT JOIN v ON j1.user_id = v.vu
      |    AND abs(epoch_us(j1.p_ts) - epoch_us(v.v_ts)) <= 21600000000),
      |g AS (SELECT p_id, user_id, p_ts, p_value, c_id, c_value, c_diff_us, click_rank,
      |    v_id, v_diff_us, view_rank,
      |    COUNT(DISTINCT c_id) AS total_clicks,
      |    COUNT(DISTINCT v_id) AS total_views,
      |    CAST(SUM(CASE WHEN c_value > 300 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_clicks
      |  FROM j2
      |  GROUP BY p_id, user_id, p_ts, p_value, c_id, c_value, c_diff_us, click_rank,
      |    v_id, v_diff_us, view_rank)
      |SELECT p_id, user_id, p_ts,
      |  CASE WHEN click_rank = 1 THEN c_id END AS primary_click_id,
      |  CASE WHEN click_rank = 1 THEN c_diff_us END AS primary_click_diff_us,
      |  CASE WHEN view_rank = 1 THEN v_id END AS primary_view_id,
      |  total_clicks, total_views, high_value_clicks,
      |  (total_clicks * 3 + total_views * 2 + high_value_clicks * 5) / 10.0 AS complexity_score,
      |  CASE WHEN total_clicks > 0 AND total_views > 0 THEN 'comprehensive'
      |       WHEN total_clicks > 0 THEN 'clicks_only'
      |       WHEN total_views > 0 THEN 'views_only'
      |       ELSE 'purchase_only' END AS engagement_type,
      |  CASE WHEN p_value > 400 THEN 'high'
      |       WHEN p_value > 200 THEN 'medium'
      |       ELSE 'low' END AS value_band
      |FROM g ORDER BY p_id, primary_click_id, primary_view_id""".stripMargin

  private def rmTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path).getParentFile)
  }

  /** PARTITIONED versioned table end-to-end (q128,
    * [[TableVersions.append]] with `partitionBy` + [[TableVersions
    * .readPartitions]]): orders lands month-partitioned in two appends
    * (the second inherits the partitioning), one partition is compacted
    * (per-partition maintenance), then three months are read back
    * PARTITION-PRUNED — file selection from commit metadata only — and
    * aggregated. The oracle aggregates orders under the same month
    * filter: data-equality through partitioned commit/inherit/compact/
    * prune is what the format must preserve. The result is checkpointed
    * so the temp table can be deleted before returning.
    */
  def q128PartitionedTable(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_p"
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("year", date_format(col("o_orderdate"), "yyyy"))
    TableVersions.append(spark, root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), partitionBy = Seq("year"))
    TableVersions.append(spark, root,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1))
    // per-partition maintenance on a DIFFERENT partition than the read:
    // the pruned read below must not see or pay for it
    TableVersions.compact(spark, root, targetBytes = 8L << 20,
      partition = Map("year" -> "1994"))
    val res = TableVersions.readPartitions(spark, root, Map("year" -> "1995"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("month")
  }

  val q128Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y') = '1995'
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** CHANGE FEED vs oracle diff (q129, [[TableVersions.readChanges]]):
    * two appends, a row-level delete and a compaction on a fresh
    * versioned table, then the full change feed — the oracle
    * reconstructs the exact (row, change_type, version) set from the
    * orders table: appends emit their rows as inserts at their version,
    * the delete emits exactly the deleted rows at its version, and the
    * compaction (a pure layout rewrite) emits NOTHING — the property
    * that makes a 100 TB change feed O(changed data), not O(table).
    */
  def q129ChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_c"
    val orders = t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    // range-clustered appends: the delete's stats bounds then prune to
    // the files actually covering [1000, 5000] — the CDF delete step
    // diffs only those, not the table
    TableVersions.append(spark, root, orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
    TableVersions.append(spark, root, orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
      .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("o_orderkey").between(1000L, 5000L),
      bounds = Map("o_orderkey" -> (1000.0, 5000.0))): @unchecked
    val cv = TableVersions.compact(spark, root, targetBytes = 8L << 20).getOrElse(dv)
    val res = TableVersions.readChanges(spark, root, fromExclusive = -1L, to = cv)
      .select(col("o_orderkey"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("version"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("version", "change_type", "o_orderkey")
  }

  /** RESTORE + SHALLOW CLONE end-to-end (q130): orders lands versioned,
    * a range delete goes wrong, [[TableVersions.restore]] rolls it back
    * by committing forward, then a zero-copy [[TableVersions
    * .shallowClone]] takes the restored table and receives a correction
    * batch the SOURCE must never see. The result reads the CLONE's
    * monthly aggregate; the oracle computes orders + the correction
    * batch directly — data-equality through delete/restore/clone/append
    * is exactly what the rollback and branching machinery must
    * preserve. (The restored source equals plain orders; the q121/q128
    * family already certifies that read path.)
    */
  def q130RestoreClone(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_tv").toString
    val root = base + "/orders_r"
    val cloneRoot = base + "/orders_r_clone"
    val orders = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    TableVersions.append(spark, root,
      orders.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey"))
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("o_orderkey").between(1000L, 5000L),
      bounds = Map("o_orderkey" -> (1000.0, 5000.0))): @unchecked
    TableVersions.restore(spark, root, dv - 1) // the delete was a mistake
    TableVersions.shallowClone(spark, root, cloneRoot)
    // the correction batch lands on the CLONE only
    TableVersions.append(spark, cloneRoot,
      orders.filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    val res = TableVersions.read(spark, cloneRoot)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    rmTree(root)
    out.orderBy("month")
  }

  val q130Sql: String =
    """WITH c AS (
      |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_orderdate, o_totalprice
      |  FROM orders WHERE o_orderkey % 97 = 0)
      |SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM c GROUP BY 1 ORDER BY month""".stripMargin

  val q129Sql: String =
    """WITH ch AS (
      |  SELECT o_orderkey, 'insert' AS change_type, CAST(0 AS BIGINT) AS version
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'insert', 1 FROM orders WHERE o_orderkey % 3 = 1
      |  UNION ALL
      |  SELECT o_orderkey, 'delete', 2 FROM orders
      |  WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey BETWEEN 1000 AND 5000)
      |SELECT o_orderkey, change_type, version
      |FROM ch ORDER BY version, change_type, o_orderkey""".stripMargin
}
