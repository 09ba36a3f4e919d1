package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver's deterministic test tables (TESTDATA.md). */
object Tables {

  /** Tables whose downstream work is heavy enough that scan parallelism
    * matters (big facts; small-but-expensive text/vector corpora).
    * Whether they actually GET the compensating exchange is decided per
    * layout below — dimension tables are never listed (they broadcast).
    */
  private val scanHeavyTables =
    Set("lineitem", "orders", "events", "documents", "embeddings")

  /** Parquet's split unit is the row group (Spark assigns each row
    * group to the task owning its byte midpoint), so a table's
    * achievable scan parallelism is its TOTAL ROW-GROUP COUNT across
    * files. Counted from the footers once per path (cached — the footer
    * is also what the scan itself reads, so this adds one metadata read
    * per table per session).
    */
  private val rowGroupCache = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  private def totalRowGroups(spark: SparkSession, path: String): Int =
    rowGroupCache.computeIfAbsent(path, { p =>
      val hconf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(hconf)
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).toSeq.map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        else Seq(root)
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf))
        try r.getRowGroups.size finally r.close()
      }.sum
    })

  /** Scan-heavy tables get one small post-scan exchange ONLY when the
    * measured layout cannot feed the cores by itself (row groups <
    * default parallelism — the driver's testdata ships each table as a
    * single row group, where without help every scan-heavy stage runs
    * single-threaded; measured: q01's map-side decimal aggregation
    * alone, 2.0s → 0.76s with the repartition). Filters and column
    * pruning still push through the Repartition to the scan. On
    * production data — thousands of row groups — the gate self-disables
    * and the plan is the exchange-free scan → partial-agg shape
    * (Round7PlanSpec pins both directions).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    if (scanHeavyTables(name) &&
        totalRowGroups(spark, path) < spark.sparkContext.defaultParallelism)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** Unrepartitioned scan — for consumers that fan out into MANY small
    * independent branches (e.g. the per-column profiler union): there
    * the compensating exchange above is paid once PER BRANCH while
    * parallelism already comes from running the branches concurrently
    * (measured: q84 2.1 s → 0.8 s at sf0.1).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` normalization, adaptive to the generator's physical
    * layout (it has shipped three): whatever arrives, downstream sees
    * TimestampType micros matching the DuckDB oracle's naive reading of
    * the same file — WITHOUT losing parquet predicate pushdown on `ts`
    * (the reference's bread-and-butter lookback filters, P6/A5-A10,
    * must row-group-skip at 100 TB):
    *
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=true): TimestampType natively.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): read with
    *    `inferTimestampNTZ` scoped OFF for this one read, so the column
    *    arrives as TimestampType straight from the scan (the stored
    *    micros ARE the session-UTC micros — the same value the previous
    *    post-scan `cast(ntz as timestamp)` produced, but filters now
    *    reach the scan: a predicate on a cast-derived column does not
    *    push, a predicate on the scanned column does).
    *  - INT64 TIMESTAMP(NANOS) — which Spark's reader only accepts as
    *    long via the legacy conf — truncates to microseconds
    *    (`div 1000`, bit-identical to DuckDB's `CAST(ts AS TIMESTAMP)`).
    *    Time predicates then compare against the derived column, so
    *    [[graft.plans.RawTimeBoundsRewrite]] (registered here) derives
    *    pushable raw-long bounds next to them.
    *
    * LayoutSpec pins value-equality of all three normalizations;
    * Round7PlanSpec pins PushedFilters in the NTZ and nanos layouts.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val inferKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    // schema inference is eager at read-time, so restoring the conf
    // immediately after does not affect this frame's execution
    val df = try t(spark, dir, "events") finally spark.conf.set(inferKey, prev)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // unreachable with the infer conf scoped off; kept as a belt
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}

/** The oracle-checked query inventory: every operator family of SURVEY §2
  * expressed over the driver's test tables, each paired with equivalent
  * DuckDB SQL in [[SparkEntry.oracleSql]].
  *
  * Determinism rules used throughout (these queries are hash-compared
  * against DuckDB by the driver):
  *  - double SUM/AVG go through DECIMAL so the result is order-independent
  *    and engine-independent: `SUM(CAST(x AS DECIMAL(...)))` then cast back
  *    to double (both engines do exact decimal addition; per-row
  *    double→decimal conversion is identical);
  *  - every query ends in a total ORDER BY with unique tie-breaks;
  *  - window ORDER BYs carry unique tie-break columns;
  *  - `CURRENT_TIMESTAMP`-style anchors are fixed literals.
  */
object Queries {
  import Tables.{events, t}

  private val D = DecimalType(18, 2)
  private val DP = DecimalType(24, 8) // for products of price-like doubles

  /** Order-independent double sum via DECIMAL, rounded to 4dp after the
    * cast back: the decimal sum is exact and engine-identical, but
    * DuckDB's int128→double conversion is not correctly rounded at
    * magnitudes ≳1e9 (diverges from the JVM in the last ulp) — rounding
    * well above that noise keeps hash parity at every scale factor.
    */
  private def decSum(c: Column, dt: DecimalType = D): Column =
    round(sum(c.cast(dt)).cast("double"), 4)

  /** A1/A2 wide aggregation with conditional counts (TPC-H Q1 shape;
    * mirrors `fact_patient_encounters.sql:188-196`). Single hash-agg with
    * partial map-side combine; no join, one shuffle on the 6-value group
    * key — optimal at any scale.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), DP).as("sum_disc_price"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), DP).as("sum_charge"),
        (decSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (decSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (decSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"),
        sum(when(col("l_quantity") > 30, 1).otherwise(0)).cast("long").as("high_qty_lines"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
      |  round(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))) AS DOUBLE), 4) AS sum_disc_price,
      |  round(CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,8))) AS DOUBLE), 4) AS sum_charge,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)/COUNT(*) AS avg_qty,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4)/COUNT(*) AS avg_price,
      |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)/COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS high_qty_lines
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1+J3+W1+O2: proximity band LEFT JOIN + as-of closest-match selection,
    * the exact shape of `fact_patient_encounters.sql:81-115` (equi key +
    * theta band residual, ROW_NUMBER rank, rank=1 filter). Each purchase
    * event finds its temporally nearest click by the same user within ±6h.
    *
    * Scale: both the join and the window cluster on `user_id`, so Catalyst
    * plans ONE shuffle; the window adds only a sort (HashPartitioning on
    * the join key satisfies the window's ClusteredDistribution). The
    * rank=1 filter triggers Spark's WindowGroupLimit top-k pushdown.
    */
  def q02AsofBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val diff = abs(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
    p.join(c, col("user_id") === col("c_user") && diff <= 21600000000L, "left")
      .withColumn("diff_us", diff)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("p_id")).orderBy(diff.asc, col("c_id").asc)))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("c_id").as("nearest_click_id"), col("diff_us"))
      .orderBy("p_id")
  }

  val q02Sql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id AS c_id, user_id AS c_user, CAST(ts AS TIMESTAMP) AS c_ts FROM events WHERE event_type = 'click'),
      |     j AS (SELECT p.p_id, p.user_id, c.c_id,
      |             abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) AS diff_us,
      |             ROW_NUMBER() OVER (PARTITION BY p.user_id, p.p_id
      |               ORDER BY abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) ASC, c.c_id ASC) AS rn
      |           FROM p LEFT JOIN c ON p.user_id = c.c_user
      |             AND abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) <= 21600000000)
      |SELECT p_id, user_id, c_id AS nearest_click_id, diff_us FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin

  /** Multi-way star join with broadcast dims (TPC-H Q5 shape): revenue by
    * nation for one region over a date range. Dims (`region`, `nation`) are
    * broadcast explicitly; `customer` stays well under the AQE broadcast
    * threshold at every SF, so the only real shuffle is orders⋈lineitem.
    */
  def q03RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nationRegion = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    t(spark, dir, "customer")
      .join(broadcast(nationRegion), col("c_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"))
      .join(t(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), DP).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q03Sql: String =
    """SELECT n_name,
      |  round(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,8))) AS DOUBLE), 4) AS revenue,
      |  COUNT(*) AS line_count
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |JOIN orders ON c_custkey = o_custkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** W1/O2: per-group top-k via ROW_NUMBER + rank filter (the
    * rank-then-keep pattern of `fact_patient_encounters.sql:107-110,
    * 173-186`, expressed the `filter(rank<=k)` way so Spark's
    * InferWindowGroupLimit turns it into a per-partition top-k instead of
    * a full sort — SURVEY §4).
    */
  def q04TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")

  val q04Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** A7: daily monitoring report — group by day, conditional alert counts,
    * averages, ordered DESC (`healthcare_data_pipeline_dag.py:215-228`
    * mapped onto events; fixed as-of anchor 2024-01-31).
    */
  def q05DailyEventReport(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-24 00:00:00")))
      .groupBy(to_date(col("ts")).as("date"))
      .agg(
        count(lit(1)).as("total_events"),
        count(when(col("event_type") === "error", 1)).as("error_count"),
        count(when(col("event_type") === "purchase", 1)).as("purchase_count"),
        count(when(col("value") > 400, 1)).as("high_value_count"),
        (decSum(col("value")) / count(lit(1))).as("avg_value"))
      .orderBy(col("date").desc)

  val q05Sql: String =
    """SELECT CAST(ts AS DATE) AS date,
      |  COUNT(*) AS total_events,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |  COUNT(CASE WHEN value > 400 THEN 1 END) AS high_value_count,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)/COUNT(*) AS avg_value
      |FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24 00:00:00'
      |GROUP BY CAST(ts AS DATE) ORDER BY date DESC""".stripMargin

  /** A8: claims-processing daily report shape
    * (`healthcare_data_pipeline_dag.py:243-255` on orders: daily volumes,
    * value, per-status conditional counts, averages).
    */
  def q06OrderDailyReport(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
      .groupBy(to_date(col("o_orderdate")).as("date"))
      .agg(
        count(lit(1)).as("total_orders"),
        decSum(col("o_totalprice")).as("total_value"),
        count(when(col("o_orderstatus") === "F", 1)).as("finished_orders"),
        count(when(col("o_orderstatus") === "O", 1)).as("open_orders"),
        count(when(col("o_orderstatus") === "P", 1)).as("pending_orders"),
        (decSum(col("o_totalprice")) / count(lit(1))).as("avg_order_value"))
      .orderBy(col("date").desc)

  val q06Sql: String =
    """SELECT CAST(o_orderdate AS DATE) AS date,
      |  COUNT(*) AS total_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_orders,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)/COUNT(*) AS avg_order_value
      |FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
      |GROUP BY CAST(o_orderdate AS DATE) ORDER BY date DESC""".stripMargin

  /** A11: the row-wise quality-score fold (start 1.0, fixed penalties,
    * clamp ≥0 — `healthcare_etl_pipeline.py:143-159`) aggregated per type.
    */
  def q07QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val score = greatest(lit(0.0),
      lit(1.0)
        - when(col("value") > 400, 0.3).otherwise(0.0)
        - when(col("event_type") === "error", 0.2).otherwise(0.0)
        - when(col("props").isNull, 0.2).otherwise(0.0))
    events(spark, dir)
      // rounded to 6dp: Spark computes the penalties in binary doubles
      // (1.0-0.3-0.2 = 0.4999...94) while DuckDB folds the same literals
      // as exact decimals (= 0.5); rounding reconciles the two
      .withColumn("q", round(score, 6))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("q").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_quality"),
        min(col("q")).as("min_quality"),
        max(col("q")).as("max_quality"))
      .orderBy("event_type")
  }

  val q07Sql: String =
    """WITH scored AS (
      |  SELECT event_type,
      |    round(greatest(0.0, 1.0
      |      - (CASE WHEN value > 400 THEN 0.3 ELSE 0.0 END)
      |      - (CASE WHEN event_type = 'error' THEN 0.2 ELSE 0.0 END)
      |      - (CASE WHEN props IS NULL THEN 0.2 ELSE 0.0 END)), 6) AS q
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  round(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE), 4)/COUNT(*) AS avg_quality,
      |  MIN(q) AS min_quality, MAX(q) AS max_quality
      |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin

  /** P2+P5: range-validate-to-NULL projection plus anomaly flags, per row
    * (`stg_patient_vitals.sql:24-58` / `healthcare_etl_pipeline.py:84-100`
    * shape on events).
    */
  def q08RangeValidate(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      col("user_id"),
      when(col("value").between(1.0, 450.0), col("value")).as("value_validated"),
      when(col("value").between(1.0, 450.0), false).otherwise(true).as("value_anomaly"),
      when(col("event_type").isin("click", "view", "purchase", "signup", "error"), col("event_type"))
        .as("event_type_validated"))
      .orderBy("event_id")

  val q08Sql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN value BETWEEN 1.0 AND 450.0 THEN value END AS value_validated,
      |  CASE WHEN value BETWEEN 1.0 AND 450.0 THEN FALSE ELSE TRUE END AS value_anomaly,
      |  CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN event_type END AS event_type_validated
      |FROM events ORDER BY event_id""".stripMargin

  /** P1+P3: required-field + range quality filter
    * (`healthcare_etl_pipeline.py:109-121` shape).
    */
  def q09QualityFilter(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type").isNotNull && col("props").isNotNull &&
        col("value").between(0.01, 100000.0) && !(col("value") > 450))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  val q09Sql: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE event_type IS NOT NULL AND props IS NOT NULL
      |  AND value BETWEEN 0.01 AND 100000.0 AND NOT (value > 450)
      |ORDER BY event_id""".stripMargin

  /** F22/F17: chained CASE bucketing + lifecycle mapping
    * (`stg_insurance_claims.sql:120-159` shape) with grouped rollup.
    */
  def q10ValueCategorize(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("value_category",
        when(col("o_totalprice") < 1000, "low_value")
          .when(col("o_totalprice") < 10000, "medium_value")
          .when(col("o_totalprice") < 100000, "high_value")
          .otherwise("very_high_value"))
      .withColumn("lifecycle_stage",
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "P", "pending")
          .otherwise("unknown"))
      .groupBy("value_category", "lifecycle_stage")
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_value"))
      .orderBy("value_category", "lifecycle_stage")

  val q10Sql: String =
    """SELECT
      |  CASE WHEN o_totalprice < 1000 THEN 'low_value'
      |       WHEN o_totalprice < 10000 THEN 'medium_value'
      |       WHEN o_totalprice < 100000 THEN 'high_value'
      |       ELSE 'very_high_value' END AS value_category,
      |  CASE WHEN o_orderstatus = 'O' THEN 'open'
      |       WHEN o_orderstatus = 'F' THEN 'finished'
      |       WHEN o_orderstatus = 'P' THEN 'pending'
      |       ELSE 'unknown' END AS lifecycle_stage,
      |  COUNT(*) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM orders GROUP BY 1, 2 ORDER BY value_category, lifecycle_stage""".stripMargin

  /** A5+A10+F6: freshness & staleness probe with a fixed as-of anchor
    * (`healthcare_data_pipeline_dag.py:163-169,312-317`).
    * Anchor 2024-01-31T00:00:00Z = 1706659200000000 µs.
    */
  def q11Freshness(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(
      count(when(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-30 00:00:00")), 1))
        .as("recent_records"),
      max(col("ts")).as("latest_timestamp"),
      ((lit(1706659200000000L) - unix_micros(max(col("ts")))) / lit(60000000L)).cast("long")
        .as("minutes_since_last_update"))

  val q11Sql: String =
    """SELECT
      |  COUNT(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-30 00:00:00' THEN 1 END) AS recent_records,
      |  MAX(CAST(ts AS TIMESTAMP)) AS latest_timestamp,
      |  CAST((1706659200000000 - epoch_us(MAX(CAST(ts AS TIMESTAMP)))) // 60000000 AS BIGINT) AS minutes_since_last_update
      |FROM events""".stripMargin

  /** O1/O3: ordered top-10 page (`hipaa_compliance_checker.py:183-190`). */
  def q12TopEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .orderBy(col("value").desc, col("event_id").asc)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .limit(10)

  val q12Sql: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY value DESC, event_id ASC LIMIT 10""".stripMargin

  /** §2.7 set operation: INTERSECT of two filtered projections. */
  def q13BuyerErrorUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    e.filter(col("event_type") === "purchase").select(col("user_id"))
      .intersect(e.filter(col("event_type") === "error").select(col("user_id")))
      .orderBy("user_id")
  }

  val q13Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** Text analysis — token counting (whitespace) + dedup-grade content
    * hash (F15/F16 + the text-pipeline token-count operator). md5 parity
    * with the oracle validates the hash-based dedup path end-to-end.
    */
  def q14DocTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("word_count"),
        size(array_distinct(split(col("text"), " "))).as("distinct_words"),
        md5(col("text")).as("text_md5"))
      .withColumn("dup_word_ratio",
        round(lit(1.0) - col("distinct_words").cast("double") / col("word_count"), 6))
      .orderBy("doc_id")

  val q14Sql: String =
    """SELECT doc_id, lang, source, n_chars,
      |  len(string_split(text, ' ')) AS word_count,
      |  len(list_distinct(string_split(text, ' '))) AS distinct_words,
      |  md5(text) AS text_md5,
      |  round(1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')), 6) AS dup_word_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact deduplication by key (hash-groupBy dedup): collapse each
    * customer's orders to the earliest, reporting duplicate cardinality —
    * the canonical exact-dedup shape (groupBy key → keeper + count).
    */
  def q15ExactDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("keeper_orderkey"),
        decSum(col("o_totalprice")).as("total_value"))
      .filter(col("n_orders") > 1)
      .orderBy("o_custkey")

  val q15Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders, MIN(o_orderkey) AS keeper_orderkey,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1 ORDER BY o_custkey""".stripMargin

  /** Text quality scoring: stopword ratio via higher-order array functions
    * (codegen-free but still native, no UDF), length stats, quality bucket
    * (the text-pipeline quality-score operator).
    */
  def q16TextQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("word_count", size(split(col("text"), " ")))
      .withColumn("stopword_count",
        expr("size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'and')))"))
      .withColumn("stopword_ratio",
        round(col("stopword_count").cast("double") / col("word_count"), 6))
      .withColumn("avg_word_len",
        round(col("n_chars").cast("double") / col("word_count"), 6))
      .withColumn("quality_bucket",
        when(col("word_count") < 16, "too_short")
          .when(col("stopword_ratio") > 0.25, "boilerplate")
          .when(col("stopword_ratio") > 0.05, "good")
          .otherwise("low_stopword"))
      .select("doc_id", "word_count", "stopword_count", "stopword_ratio", "avg_word_len", "quality_bucket")
      .orderBy("doc_id")

  val q16Sql: String =
    """WITH m AS (
      |  SELECT doc_id, n_chars,
      |    len(string_split(text, ' ')) AS word_count,
      |    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'of', 'and'))) AS stopword_count
      |  FROM documents)
      |SELECT doc_id, word_count, stopword_count,
      |  round(CAST(stopword_count AS DOUBLE)/word_count, 6) AS stopword_ratio,
      |  round(CAST(n_chars AS DOUBLE)/word_count, 6) AS avg_word_len,
      |  CASE WHEN word_count < 16 THEN 'too_short'
      |       WHEN round(CAST(stopword_count AS DOUBLE)/word_count, 6) > 0.25 THEN 'boilerplate'
      |       WHEN round(CAST(stopword_count AS DOUBLE)/word_count, 6) > 0.05 THEN 'good'
      |       ELSE 'low_stopword' END AS quality_bucket
      |FROM m ORDER BY doc_id""".stripMargin

  /** Brute-force cosine top-k over the embedding column — the ANN
    * baseline. Query set = vec_id < 5 (broadcast); corpus = the rest.
    * Dot/norm computed as sequential double folds (identical fold order in
    * both engines), cosine rounded to 6dp BEFORE ranking so the rank
    * comparison is engine-stable; unique tie-break on neighbor id.
    *
    * Scale: query side broadcast, corpus scanned once, per-partition
    * top-k via WindowGroupLimit — no shuffle of the corpus. The
    * LSH-bucketed variant for huge corpora is `VectorOps.cosineLshTopK`.
    */
  def q17AnnCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = em.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = em.filter(col("vec_id") >= 5)
    corpus.crossJoin(broadcast(q))
      // codegen'd VecDot — same left-to-right fold order as the DuckDB
      // oracle's list_dot_product, rounded to 6dp before ranking
      .withColumn("cosine", round(
        graft.operators.VectorOps.fastCosine(spark)(col("emb"), col("q_emb")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Engine-completeness window functions beyond the reference's
    * ROW_NUMBER: lag/lead with event-time deltas per user session.
    */
  def q29WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("prev_purchase_id", lag(col("event_id"), 1).over(w))
      .withColumn("next_purchase_id", lead(col("event_id"), 1).over(w))
      .withColumn("us_since_prev", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("purchase_seq", row_number().over(w))
      .select(col("event_id"), col("user_id"), col("purchase_seq"),
        col("prev_purchase_id"), col("next_purchase_id"), col("us_since_prev"))
      .orderBy("event_id")
  }

  val q29Sql: String =
    """SELECT event_id, user_id,
      |  ROW_NUMBER() OVER w AS purchase_seq,
      |  LAG(event_id, 1) OVER w AS prev_purchase_id,
      |  LEAD(event_id, 1) OVER w AS next_purchase_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS us_since_prev
      |FROM events WHERE event_type = 'purchase'
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** Rollup aggregation (multi-level subtotals in one pass). */
  def q30Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("total_value"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val q30Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Semi + anti joins: customers who bought in 2001 but never with
    * priority 1-URGENT (left semi against one subquery, left anti against
    * another — the classic EXISTS / NOT EXISTS pair).
    */
  def q31SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val orders2001 = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
    val urgent = t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    t(spark, dir, "customer")
      .join(orders2001, col("c_custkey") === orders2001("o_custkey"), "left_semi")
      .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val q31Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Sessionization (batch twin of the streaming `session_window`): a new
    * session starts after a >30-minute gap per user; classic lag +
    * cumulative-sum formulation, then per-session stats.
    */
  def q33Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapped = events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1000000L)).cast("long")
          .as("duration_s"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .orderBy("user_id", "session_seq")
  }

  val q33Sql: String =
    """WITH g AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |    LAG(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)),
      |s AS (
      |  SELECT *, CAST(SUM(CASE WHEN prev_ts IS NULL
      |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM g)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_s,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
      |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin

  /** Exact interpolated percentiles per group (both engines use linear
    * interpolation over the sorted values — order-independent and
    * engine-portable; rounded 6dp for residual float safety).
    */
  def q34Percentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        round(expr("percentile(value, 1.0)"), 6).as("p100"))
      .orderBy("event_type")

  val q34Sql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99,
      |  round(quantile_cont(value, 1.0), 6) AS p100
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CUBE with grouping_id: all 4 subtotal combinations in one pass
    * (completes the grouping-set family next to q30's ROLLUP).
    */
  def q36Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_value"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("total_value"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q36Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Pivot: per-day event counts, one column per event type (fixed value
    * list for schema determinism; coalesce to 0 because pivot yields null
    * for absent combinations while conditional COUNT yields 0).
    */
  def q37Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
      .orderBy("day")
  }

  val q37Sql: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Correlated scalar aggregate: per customer, orders priced above that
    * customer's own average. Spark formulation is the decorrelated
    * groupBy+join plan (what Catalyst rewrites the subquery to); the
    * oracle keeps the correlated-subquery form. The average is an exact
    * decimal sum cast to double, so both engines compare against the
    * identical value.
    */
  def q38AboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val avgs = o.groupBy(col("o_custkey").as("ak"))
      .agg((sum(col("o_totalprice").cast(D)).cast("double") / count(lit(1))).as("avg_price"))
    o.join(avgs, col("o_custkey") === col("ak"))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_above"), decSum(col("o_totalprice")).as("value_above"))
      .orderBy("o_custkey")
  }

  val q38Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_above,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS value_above
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Explode/unnest + top-k: the 20 most frequent (lang, word) pairs
    * across the corpus (generator/flatMap operator family).
    */
  def q39WordTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lang"), col("word"))
      .limit(20)

  val q39Sql: String =
    """SELECT lang, word, COUNT(*) AS n
      |FROM (SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
      |WHERE word <> '' GROUP BY lang, word
      |ORDER BY n DESC, lang, word LIMIT 20""".stripMargin

  /** ntile deciles over account balance with per-decile stats (global
    * analytic window — inherently single-partition sort; at 100 TB the
    * same shape runs per-partition-key or via approx quantiles, q34).
    */
  def q40Deciles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn("decile", ntile(10).over(
        Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        decSum(col("c_acctbal")).as("total_bal"))
      .orderBy("decile")

  val q40Sql: String =
    """WITH d AS (
      |  SELECT c_acctbal, ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
      |  FROM customer)
      |SELECT decile, COUNT(*) AS n_customers, MIN(c_acctbal) AS min_bal,
      |  MAX(c_acctbal) AS max_bal,
      |  round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_bal
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  /** Weekly revenue with a running cumulative total. The cumulative sum
    * runs over DECIMAL so the running value is exact in both engines
    * (sequential double accumulation would be engine-private).
    */
  def q41WeeklyCumulative(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("wk"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice").cast(D)).as("wk_rev_d"))
      .withColumn("cum_rev", round(sum(col("wk_rev_d")).over(
        Window.orderBy(col("wk").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"), 4))
      .select(col("wk"), col("n_orders"),
        round(col("wk_rev_d").cast("double"), 4).as("wk_rev"), col("cum_rev"))
      .orderBy("wk")

  val q41Sql: String =
    """WITH w AS (
      |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
      |    COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS wk_rev_d
      |  FROM orders GROUP BY 1)
      |SELECT wk, n_orders, round(CAST(wk_rev_d AS DOUBLE), 4) AS wk_rev,
      |  round(CAST(SUM(wk_rev_d) OVER (ORDER BY wk ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS cum_rev
      |FROM w ORDER BY wk""".stripMargin

  /** String-function suite over customer names (all in the portable
    * Java∩DuckDB semantics subset; names are ASCII).
    */
  def q42Strings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lpad(col("c_name"), 25, "*").as("padded"),
        substring(col("c_name"), 1, 8).as("prefix"),
        translate(col("c_name"), "0123456789", "##########").as("masked"),
        levenshtein(lower(col("c_name")), lit("customer")).as("lev"),
        length(col("c_name")).as("len"))
      .orderBy("c_custkey")

  val q42Sql: String =
    """SELECT c_custkey, upper(c_name) AS uname, lpad(c_name, 25, '*') AS padded,
      |  substring(c_name, 1, 8) AS prefix,
      |  translate(c_name, '0123456789', '##########') AS masked,
      |  CAST(levenshtein(lower(c_name), 'customer') AS INT) AS lev,
      |  CAST(length(c_name) AS INT) AS len
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** As-of join ([[graft.operators.AsOfJoin]]): each error event picks up
    * the user's latest preceding purchase (point-in-time enrichment).
    * Oracle is DuckDB's native ASOF LEFT JOIN. Purchases are
    * pre-aggregated to one row per (user, ts) — both the sweep and ASOF
    * need tie-free right sides for determinism.
    */
  def q43AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val pur = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(col("event_id")).as("pid"), max(col("value")).as("pval"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.asOf(err, pur,
        "user_id", "user_id", "ts", "pts", Seq("pts", "pid", "pval"))
      .orderBy("event_id")
  }

  val q43Sql: String =
    """WITH pur AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
      |    max(event_id) AS pid, max(value) AS pval
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |err AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'error')
      |SELECT err.event_id, err.user_id, err.ts, pur.pts, pur.pid, pur.pval
      |FROM err ASOF LEFT JOIN pur
      |  ON err.user_id = pur.user_id AND pur.pts <= err.ts
      |ORDER BY err.event_id""".stripMargin

  /** JSON extraction + aggregation over the events.props payload
    * (semi-structured column family: get_json_object ↔ ->> ).
    */
  def q44Json(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        (sum(col("k").cast(D)).cast("double") / count(lit(1))).as("avg_k_raw"))
      .select(col("event_type"), col("n"), col("min_k"), col("max_k"),
        round(col("avg_k_raw"), 6).as("avg_k"))
      .orderBy("event_type")

  val q44Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(MIN(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
      |  CAST(MAX(CAST(props->>'$.k' AS INT)) AS INT) AS max_k,
      |  round(CAST(SUM(CAST(CAST(props->>'$.k' AS INT) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact COUNT(DISTINCT) per group outside the fact grain (the HLL
    * approximate twin is spec-checked against this in SamplingHllSpec —
    * sketches aren't portable SQL).
    */
  def q45DistinctUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_active_days"))
      .orderBy("event_type")

  val q45Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
      |  COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_active_days
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The full ranking-function family over one deterministic ordering
    * (rank/dense_rank ties are real: o_totalprice collides). percent_rank
    * and cume_dist are exact small-integer ratios — identical IEEE
    * division in both engines.
    */
  def q46RankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .filter(col("rn") <= 50)
      .orderBy("o_orderpriority", "rn")
  }

  val q46Sql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |    round(percent_rank() OVER w, 6) AS prank, round(cume_dist() OVER w, 6) AS cdist
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC))
      |SELECT * FROM r WHERE rn <= 50 ORDER BY o_orderpriority, rn""".stripMargin

  /** Date/time function suite in the portable Spark∩DuckDB subset:
    * extract family, truncation, date arithmetic, last_day.
    */
  def q47DatetimeSuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(to_date(col("o_orderdate")), 90).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), to_date(col("o_orderdate"))).as("age_days"))
      .orderBy("o_orderkey")

  val q47Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS due_date,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
      |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin

  /** Episode extraction over the event stream: maximal runs of ≥3
    * consecutive high-value events per user (the oracle-gated face of
    * [[graft.operators.Episodes]]; same lag+cumsum run-id idiom with the
    * q33 tie-break discipline — (ts, event_id) total order per user).
    */
  def q51Episodes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .withColumn("abn", col("value") > 50.0)
      .withColumn("entered",
        when(col("abn") && !coalesce(lag(col("abn"), 1).over(w), lit(false)), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("entered")).over(run))
      .filter(col("abn"))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"), round(max(col("value")), 4).as("peak_value"))
      .filter(col("n_events") >= 3)
      .select(col("user_id"), col("start_ts"), col("end_ts"), col("n_events"), col("peak_value"))
      .orderBy("user_id", "start_ts")
  }

  val q51Sql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    value > 50.0 AS abn,
      |    LAG(value > 50.0, 1) OVER w AS prev_abn
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)),
      |r AS (
      |  SELECT *, CAST(SUM(CASE WHEN abn AND NOT COALESCE(prev_abn, false)
      |      THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      |  FROM g)
      |SELECT user_id, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
      |  COUNT(*) AS n_events, round(MAX(value), 4) AS peak_value
      |FROM r WHERE abn GROUP BY user_id, run_id
      |HAVING COUNT(*) >= 3
      |ORDER BY user_id, start_ts""".stripMargin

  /** Value-positional window functions (first/last/nth over an explicit
    * ROWS frame — the default RANGE frame cuts last_value at the current
    * row, so the full-partition frame is spelled out identically in both
    * engines) plus boolean aggregates.
    */
  def q52ValueWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .groupBy(col("o_custkey"))
      .agg(max(col("first_order")).as("first_order"),
        max(col("last_order")).as("last_order"),
        max(col("second_order")).as("second_order"),
        count(lit(1)).as("n_orders"),
        bool_and(col("o_orderkey") > 0).as("all_positive"),
        bool_or(col("o_orderkey") % 100 === 0).as("any_century"))
      .orderBy("o_custkey")
  }

  val q52Sql: String =
    """WITH v AS (
      |  SELECT o_custkey, o_orderkey,
      |    first_value(o_orderkey) OVER w AS first_order,
      |    last_value(o_orderkey) OVER w AS last_order,
      |    nth_value(o_orderkey, 2) OVER w AS second_order
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT o_custkey, MAX(first_order) AS first_order, MAX(last_order) AS last_order,
      |  MAX(second_order) AS second_order, COUNT(*) AS n_orders,
      |  bool_and(o_orderkey > 0) AS all_positive,
      |  bool_or(o_orderkey % 100 = 0) AS any_century
      |FROM v GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Conditional null-handling suite: nullif / ifnull / least / greatest
    * with nulls (both engines skip nulls in least/greatest) over primary
    * claim-ish shapes.
    */
  def q54NullFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("seg_defaulted"),
        least(col("c_acctbal"), lit(0.0)).as("neg_part"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_part"),
        when(col("c_acctbal") < 0, col("c_acctbal")).as("bal_if_neg"),
        least(when(col("c_acctbal") < 0, col("c_acctbal")), lit(-1.0)).as("least_with_null"))
      .orderBy("c_custkey")

  val q54Sql: String =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_defaulted,
      |  least(c_acctbal, 0.0) AS neg_part,
      |  greatest(c_acctbal, 0.0) AS pos_part,
      |  CASE WHEN c_acctbal < 0 THEN c_acctbal END AS bal_if_neg,
      |  least(CASE WHEN c_acctbal < 0 THEN c_acctbal END, -1.0) AS least_with_null
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Statistical aggregates with engine-portable determinism: variance
    * and stddev derived from exact decimal Σx and Σx² (the built-in
    * stddev/var are single-pass float accumulations whose result depends
    * on partitioning), rounded 4dp.
    */
  def q55Stats(spark: SparkSession, dir: String): DataFrame = {
    val sx = sum(col("value").cast(DP))
    val sx2 = sum((col("value") * col("value")).cast(DP))
    val n = count(lit(1)).cast("double")
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(((sx2.cast("double") - sx.cast("double") * sx.cast("double") / n) / (n - 1)), 4)
          .as("var_samp"),
        round(sqrt((sx2.cast("double") - sx.cast("double") * sx.cast("double") / n) / (n - 1)), 4)
          .as("stddev_samp"))
      .orderBy("event_type")
  }

  val q55Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  round((CAST(SUM(CAST(value*value AS DECIMAL(24,8))) AS DOUBLE)
      |    - CAST(SUM(CAST(value AS DECIMAL(24,8))) AS DOUBLE)
      |      * CAST(SUM(CAST(value AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*))
      |    / (COUNT(*) - 1), 4) AS var_samp,
      |  round(sqrt((CAST(SUM(CAST(value*value AS DECIMAL(24,8))) AS DOUBLE)
      |    - CAST(SUM(CAST(value AS DECIMAL(24,8))) AS DOUBLE)
      |      * CAST(SUM(CAST(value AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*))
      |    / (COUNT(*) - 1)), 4) AS stddev_samp
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Set-operation chain — ((A UNION B) EXCEPT C) INTERSECT D — with
    * regexp_extract capture groups on the way out (both engines return ''
    * on no-match). Completes §2.7 beyond q13's INTERSECT and q31's
    * EXISTS/NOT EXISTS pair.
    */
  def q49SetOpsRegexp(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val excl = c.filter(col("c_nationkey") < 5).select("c_custkey")
    val withOrders = t(spark, dir, "orders").select(col("o_custkey").as("c_custkey"))
    val keys = a.union(b).distinct().except(excl).intersect(withOrders)
    keys.join(c, "c_custkey")
      .select(col("c_custkey"), col("c_name"),
        regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).cast("long").as("cust_num"))
      .orderBy("c_custkey")
  }

  val q49Sql: String =
    """WITH k AS (
      |  ((SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    UNION
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |   EXCEPT
      |   SELECT c_custkey FROM customer WHERE c_nationkey < 5)
      |  INTERSECT
      |  SELECT o_custkey FROM orders)
      |SELECT c.c_custkey, c.c_name,
      |  CAST(regexp_extract(c.c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS cust_num
      |FROM k JOIN customer c ON k.c_custkey = c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin

  /** Sliding time-range window frame (RANGE BETWEEN interval PRECEDING):
    * per event, activity of the same user in the trailing hour — the
    * batch twin of a streaming sliding-window aggregation. Both engines
    * frame over epoch-second integers so the range arithmetic is exact.
    */
  def q48SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    // Frame over epoch MICROseconds as exact integers: unix_timestamp
    // would truncate to seconds while DuckDB's epoch() keeps fractions —
    // boundary rows would land in different frames.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    events(spark, dir)
      .filter(col("event_type") === "click")
      .withColumn("epoch_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("clicks_trailing_hour"),
        round(sum(col("value").cast(D)).over(w).cast("double"), 4).as("value_trailing_hour"))
      .orderBy("event_id")
  }

  val q48Sql: String =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |  COUNT(*) OVER w AS clicks_trailing_hour,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS value_trailing_hour
      |FROM events WHERE event_type = 'click'
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  val q17Sql: String =
    """WITH em AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM em WHERE vec_id < 5),
      |c AS (SELECT vec_id, emb FROM em WHERE vec_id >= 5),
      |s AS (SELECT q.q_id, c.vec_id,
      |        round(list_dot_product(c.emb, q.q_emb) /
      |          (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cosine
      |      FROM c CROSS JOIN q),
      |r AS (SELECT q_id, vec_id, cosine,
      |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rn
      |      FROM s)
      |SELECT q_id, vec_id AS neighbor_id, cosine, rn FROM r WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin

  /** Correlation / linear-regression aggregates (corr, covar, slope,
    * intercept, r²) from exact decimal moments Σx, Σy, Σxy, Σx², Σy² —
    * the built-in corr/regr_* are single-pass float accumulations whose
    * low bits depend on partitioning, so both engines derive the
    * statistics from the same order-independent decimal sums instead
    * (same final double formula on both sides). One hash-agg, one
    * shuffle on the group key — the moment sums combine map-side, so
    * this scales like q01 (partial aggregation, no row movement beyond
    * the 3-value key).
    */
  def q56CorrRegr(spark: SparkSession, dir: String): DataFrame = {
    val DW = DecimalType(38, 8)
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val sx = sum(x.cast(DW)).cast("double")
    val sy = sum(y.cast(DW)).cast("double")
    val sxy = sum((x * y).cast(DW)).cast("double")
    val sxx = sum((x * x).cast(DW)).cast("double")
    val syy = sum((y * y).cast(DW)).cast("double")
    val n = count(lit(1)).cast("double")
    val covNum = sxy - sx * sy / n
    val varXNum = sxx - sx * sx / n
    val varYNum = syy - sy * sy / n
    val slope = covNum / varXNum
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(covNum / (n - 1), 4).as("covar_samp"),
        round(covNum / sqrt(varXNum * varYNum), 6).as("corr"),
        round(slope, 6).as("regr_slope"),
        round((sy - slope * sx) / n, 4).as("regr_intercept"),
        round((covNum * covNum) / (varXNum * varYNum), 6).as("regr_r2"))
      .orderBy("l_returnflag")
  }

  val q56Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((sxy - sx*sy/n) / (n - 1), 4) AS covar_samp,
      |  round((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS corr,
      |  round((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS regr_slope,
      |  round((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n, 4) AS regr_intercept,
      |  round(((sxy - sx*sy/n) * (sxy - sx*sy/n)) / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS regr_r2
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Time-series gap-fill: per-user daily activity re-gridded onto the
    * full calendar span (dense date scaffold via sequence/explode), with
    * missing days flagged and forward-filled from the last observed
    * value (`last(…, ignoreNulls)` over an unbounded-preceding frame —
    * the standard LOCF resample).
    *
    * Scale: the scaffold is |users| × |days| rows built by a broadcast
    * cross join of two tiny aggregates; the fill is one window sorted
    * within the existing per-user partitioning. No shuffle touches the
    * raw events beyond the daily pre-aggregation.
    */
  def q57GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).filter(col("user_id") < 30)
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(decSum(col("value")).as("day_value"), count(lit(1)).as("n_events"))
    val bounds = ev.agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value").isNull.as("was_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("ffill_value"))
      .orderBy("user_id", "d")
  }

  val q57Sql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events WHERE user_id < 30),
      |daily AS (SELECT user_id, d,
      |    round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS day_value,
      |    count(*) AS n_events
      |  FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
      |grid AS (SELECT u.user_id, CAST(g.d AS DATE) AS d
      |  FROM (SELECT DISTINCT user_id FROM ev) u,
      |       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM b) g)
      |SELECT grid.user_id, grid.d,
      |  CAST(coalesce(daily.n_events, 0) AS BIGINT) AS n_events,
      |  daily.day_value IS NULL AS was_gap,
      |  last_value(daily.day_value IGNORE NULLS) OVER (
      |    PARTITION BY grid.user_id ORDER BY grid.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
      |FROM grid LEFT JOIN daily ON grid.user_id = daily.user_id AND grid.d = daily.d
      |ORDER BY grid.user_id, grid.d""".stripMargin

  /** Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    * duplicate cardinalities, unlike q49's distinct-set chain: a customer
    * appearing 3× on one side and 1× on the other survives EXCEPT ALL
    * twice. Operands are the per-order customer keys of two disjoint
    * status slices, so duplicates are real.
    */
  def q61BagSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val closed = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val exceptAll = open.exceptAll(closed)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_except_all"))
    val intersectAll = open.intersectAll(closed)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_intersect_all"))
    exceptAll.join(intersectAll, Seq("o_custkey"), "full")
      .select(col("o_custkey"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
      .orderBy("o_custkey")
  }

  val q61Sql: String =
    """WITH open_k AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |closed_k AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |ea AS (SELECT o_custkey, count(*) AS n_except_all
      |       FROM (SELECT * FROM open_k EXCEPT ALL SELECT * FROM closed_k) GROUP BY 1),
      |ia AS (SELECT o_custkey, count(*) AS n_intersect_all
      |       FROM (SELECT * FROM open_k INTERSECT ALL SELECT * FROM closed_k) GROUP BY 1)
      |SELECT coalesce(ea.o_custkey, ia.o_custkey) AS o_custkey,
      |  CAST(coalesce(ea.n_except_all, 0) AS BIGINT) AS n_except_all,
      |  CAST(coalesce(ia.n_intersect_all, 0) AS BIGINT) AS n_intersect_all
      |FROM ea FULL JOIN ia ON ea.o_custkey = ia.o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Array aggregation + element access suite: collect per-order line
    * quantities into a sorted array, then read it back with element/
    * slice/containment/fold functions — the ARRAY column surface
    * (collect_list/sort_array/element_at/slice/array_contains/
    * aggregate) against DuckDB's list functions.
    */
  def q62ArraySuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("qtys"))
      .select(col("l_orderkey"),
        // arrays stringify for the cross-engine hash (ndarray vs list
        // renderings differ); the array ops themselves stay native
        array_join(col("qtys"), ",").as("qtys_csv"),
        size(col("qtys")).as("n_lines"),
        element_at(col("qtys"), 1).as("min_qty"),
        element_at(col("qtys"), -1).as("max_qty"),
        array_join(slice(col("qtys"), 1, 2), ",").as("two_smallest_csv"),
        array_contains(col("qtys"), 30).as("has_qty_30"),
        aggregate(col("qtys"), lit(0), (a, x) => a + x).as("sum_qty"))
      .orderBy("l_orderkey")

  val q62Sql: String =
    """WITH g AS (
      |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qtys
      |  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey)
      |SELECT l_orderkey, array_to_string(qtys, ',') AS qtys_csv,
      |  CAST(len(qtys) AS INT) AS n_lines,
      |  qtys[1] AS min_qty,
      |  qtys[-1] AS max_qty,
      |  array_to_string(qtys[1:2], ',') AS two_smallest_csv,
      |  list_contains(qtys, 30) AS has_qty_30,
      |  CAST(list_sum(qtys) AS INT) AS sum_qty
      |FROM g ORDER BY l_orderkey""".stripMargin

  /** Native tumbling event-time window (`window($"ts", "6 hours")`) in
    * batch — the same groupBy(window) that runs under Structured
    * Streaming (R2's fixed windows, here at 6h). Oracle buckets by epoch
    * arithmetic (Spark's window origin is the epoch; 6h divides a day so
    * the boundaries are engine-independent).
    */
  def q63TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  val q63Sql: String =
    """SELECT CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600) AS TIMESTAMP) AS w_start,
      |  CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 + 21600) AS TIMESTAMP) AS w_end,
      |  event_type, COUNT(*) AS n,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin
}
