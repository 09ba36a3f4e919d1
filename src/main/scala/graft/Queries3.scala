package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{RangeJoin, ZOrder}

/** Round-3 oracle-checked queries: grouping sets, ordered list
  * aggregation + engine-agnostic mode, bucketized range join, TPC-H
  * Q7/Q18-shaped multi-joins, Z-order curve values, and an exact
  * integer-cents histogram. Same determinism rules as [[Queries]]
  * (decimal sums rounded 4dp, total ORDER BY with unique tie-breaks,
  * identical aliases on both engines).
  */
object Queries3 {
  import Tables.t

  private val D = DecimalType(18, 2)
  private val DP = DecimalType(24, 8)

  private def decSum(c: org.apache.spark.sql.Column, dt: DecimalType = D) =
    round(sum(c.cast(dt)).cast("double"), 4)

  /** GROUPING SETS with an explicit set list — finer than ROLLUP/CUBE
    * (q30/q36): ((status, priority), (status), ()) but NOT (priority)
    * alone. One pass, Expand-based: Catalyst plans a single aggregation
    * over an Expand that replicates each row once per set — no
    * re-reading the table per set, which is what a UNION ALL of three
    * GROUP BYs would do at 100 TB.
    */
  def q65GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_value"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("total_value"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q65Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Ordered list aggregation (LISTAGG/STRING_AGG) + engine-agnostic
    * MODE: per order year, the sorted distinct statuses as a csv and the
    * most frequent priority. Mode is computed as an explicit two-level
    * aggregate with a total tie-break (count desc, value asc) rather
    * than either engine's native `mode()` — native modes break ties
    * nondeterministically, which can never hash-match across engines.
    * The csv goes through sort_array(collect_set(...)) so the result is
    * independent of partial-aggregation order — collect_list order is
    * execution-dependent and must never reach query output.
    */
  def q66ListaggMode(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"), col("o_orderpriority"))
    val mode = base.groupBy(col("yr"), col("o_orderpriority")).agg(count(lit(1)).as("c"))
      .groupBy(col("yr"))
      .agg(min(struct((-col("c")).as("negc"), col("o_orderpriority").as("p"))).as("best"))
      .select(col("yr"), col("best.p").as("mode_priority"), (-col("best.negc")).as("mode_count"))
    base.groupBy(col("yr"))
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses_csv"),
        count(lit(1)).as("n_orders"))
      .join(mode, Seq("yr"))
      .select(col("yr"), col("statuses_csv"), col("mode_priority"), col("mode_count"), col("n_orders"))
      .orderBy("yr")
  }

  val q66Sql: String =
    """WITH base AS (
      |  SELECT EXTRACT(year FROM o_orderdate) AS yr, o_orderstatus, o_orderpriority FROM orders
      |), pc AS (
      |  SELECT yr, o_orderpriority AS p, COUNT(*) AS c FROM base GROUP BY 1, 2
      |), md AS (
      |  SELECT yr, p AS mode_priority, c AS mode_count,
      |    ROW_NUMBER() OVER (PARTITION BY yr ORDER BY c DESC, p ASC) AS rn
      |  FROM pc
      |)
      |SELECT b.yr AS yr, array_to_string(list_sort(list_distinct(list(b.o_orderstatus))), ',') AS statuses_csv,
      |  ANY_VALUE(md.mode_priority) AS mode_priority,
      |  CAST(ANY_VALUE(md.mode_count) AS BIGINT) AS mode_count,
      |  COUNT(*) AS n_orders
      |FROM base b JOIN md ON md.yr = b.yr AND md.rn = 1
      |GROUP BY b.yr
      |ORDER BY 1""".stripMargin

  /** Bucketized point-in-interval join ([[RangeJoin.pointInInterval]]):
    * lineitem prices against OVERLAPPING price bands (overlap is what
    * makes this a real range join — a non-overlapping banding is just
    * width_bucket). The oracle is the naive BETWEEN theta join; the
    * Spark side runs the grid-cell equi-join, so the hash match also
    * certifies the rewrite's correctness at sf scale.
    */
  def q67RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val bands = Seq(
      ("band_00", 0.0, 10000.0), ("band_01", 5000.0, 20000.0),
      ("band_02", 15000.0, 40000.0), ("band_03", 30000.0, 70000.0),
      ("band_04", 60000.0, 120000.0)).toDF("band", "lo", "hi")
    RangeJoin.pointInInterval(
      t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      "l_extendedprice", bands, "lo", "hi", bucketWidth = 5000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"), decSum(col("l_extendedprice")).as("band_value"))
      .orderBy("band")
  }

  val q67Sql: String =
    """SELECT b.band, COUNT(*) AS n_items,
      |  round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS band_value
      |FROM lineitem l
      |JOIN (VALUES ('band_00', 0.0, 10000.0), ('band_01', 5000.0, 20000.0),
      |             ('band_02', 15000.0, 40000.0), ('band_03', 30000.0, 70000.0),
      |             ('band_04', 60000.0, 120000.0)) b(band, lo, hi)
      |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
      |GROUP BY b.band ORDER BY b.band""".stripMargin

  /** TPC-H Q7-shaped volume shipping: bidirectional nation-pair revenue
    * by ship year through a 5-way star join (lineitem ⋈ orders ⋈
    * supplier ⋈ customer ⋈ nation×2). All four dimension sides are
    * small → AQE broadcasts every one; the only shuffle left is the
    * final 3-column aggregation. The nation filter pushes into BOTH
    * nation scans before the joins (PushedFilters), so the big fact
    * side is filtered by two broadcast joins, never materializing the
    * unfiltered join.
    */
  def q68VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(
        lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
        lit(java.sql.Timestamp.valueOf("1996-12-31 00:00:00"))))
    val n1 = t(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin("NATION_1", "NATION_2"))
    val n2 = t(spark, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin("NATION_1", "NATION_2"))
    li.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), DP).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q68Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  EXTRACT(year FROM l.l_shipdate) AS l_year,
      |  round(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE), 4) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey AND n1.n_name IN ('NATION_1','NATION_2')
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey AND n2.n_name IN ('NATION_1','NATION_2')
      |WHERE l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q18-shaped large-volume orders: HAVING-filtered aggregate as
    * a semi-join back onto the fact. The inner aggregate groups the
    * full lineitem by orderkey; only qualifying keys (sum qty > 250)
    * join back — at scale the qualifying set is small, so AQE turns the
    * re-join into a broadcast. The whole query is two shuffles (the
    * groupBy, then nothing: both back-joins broadcast).
    */
  def q69LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity").cast(D)).cast("double"), 4).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    big.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey").asc)
  }

  val q69Sql: String =
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, q.sum_qty
      |FROM (SELECT l_orderkey,
      |        round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty
      |      FROM lineitem GROUP BY 1
      |      HAVING round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) > 250.0) q
      |JOIN orders o ON q.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY q.sum_qty DESC, o.o_orderkey ASC""".stripMargin

  /** Z-order curve positions ([[ZOrder.zValue]]): the Morton interleave
    * of (custkey, order epoch-day) as a plain column expression, hash-
    * checked against DuckDB computing the identical bit arithmetic.
    * This pins the curve math the [[ZOrder.cluster]] layout job sorts
    * by (the layout itself — file-level min/max narrowing — is asserted
    * in LayoutSpec, since file statistics aren't SQL-observable).
    */
  def q70ZOrderValues(spark: SparkSession, dir: String): DataFrame = {
    val epochDay = datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1970-01-01")))
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        ZOrder.zValue(Seq(
          col("o_custkey").bitwiseAND(lit(65535L)),
          epochDay.cast("long").bitwiseAND(lit(65535L))), bits = 16).as("zval"))
      .orderBy(col("zval"), col("o_orderkey"))
      .limit(1000)
  }

  val q70Sql: String =
    """SELECT o_orderkey, CAST(list_sum(list_transform(range(0, 16), i ->
      |    (((o_custkey & 65535) >> i) & 1) * (1::BIGINT << (2*i)) +
      |    (((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 65535) >> i) & 1) * (1::BIGINT << (2*i + 1))
      |  )) AS BIGINT) AS zval
      |FROM orders
      |ORDER BY zval, o_orderkey LIMIT 1000""".stripMargin

  /** Exact equi-width histogram over prices, computed in integer cents
    * so bucket edges are exact on both engines (TPC-H prices are
    * cents-exact doubles; `round(x*100)` reconstructs the integer
    * before the truncating division — no float-boundary ambiguity).
    * Shape: single hash aggregation on the derived bucket id.
    */
  def q71Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .withColumn("bucket", expr("cents div 500000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_items"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .orderBy("bucket")

  val q71Sql: String =
    """SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 500000 AS bucket,
      |  COUNT(*) AS n_items,
      |  round(MIN(l_extendedprice), 2) AS min_price,
      |  round(MAX(l_extendedprice), 2) AS max_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-phase salted aggregation ([[graft.operators.Skew.saltedAgg]])
    * hash-matched against a PLAIN GROUP BY oracle — the match certifies
    * that salting is semantically invisible: the salt only splits the
    * hot key's reducer, the phase-2 merge reconstructs the exact
    * aggregate. The summed column is pre-cast to DECIMAL so the
    * extra merge level cannot introduce float reassociation drift
    * (double addition is not associative; decimal is).
    */
  def q72SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val in = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").cast(D).as("price_dec"),
        col("l_quantity").cast(D).as("qty_dec"))
    graft.operators.Skew.saltedAgg(in, keys = Seq("l_returnflag"), saltBuckets = 16,
      sums = Seq("price_dec", "qty_dec"), mins = Seq("price_dec"), maxs = Seq("price_dec"))
      .select(col("l_returnflag"),
        round(col("price_dec_sum").cast("double"), 4).as("sum_price"),
        round(col("qty_dec_sum").cast("double"), 4).as("sum_qty"),
        col("row_count"),
        round(col("price_dec_min").cast("double"), 2).as("min_price"),
        round(col("price_dec_max").cast("double"), 2).as("max_price"))
      .orderBy("l_returnflag")
  }

  val q72Sql: String =
    """SELECT l_returnflag,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_price,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
      |  COUNT(*) AS row_count,
      |  round(CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price,
      |  round(CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SCD2 snapshot replay ([[graft.operators.Scd2.snapshot]]): orders
    * date-sliced into three update batches, folded through three
    * snapshot passes; the FULL resulting version history — closed and
    * current rows, valid_from/valid_to chains — is hash-matched against
    * a DuckDB window derivation (per key: latest row per batch, lead()
    * for the closing timestamp). Updates are pre-deduplicated to one
    * row per (key, updated_at) with a max-orderkey tie-break, because
    * SCD2's "latest per key per batch" is otherwise nondeterministic on
    * same-timestamp ties.
    */
  def q73Scd2Replay(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scd2
    val orders = t(spark, dir, "orders")
    val upd = orders
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)))
      .filter(col("__rn") === 1)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      // three batch filters + three snapshot passes all re-derive this
      // frame; materialize the scan+window once
      .localCheckpoint(true)
    val cuts = Seq("1997-01-01 00:00:00", "1999-01-01 00:00:00").map(java.sql.Timestamp.valueOf)
    val batches = Seq(
      upd.filter(col("o_orderdate") < cuts(0)),
      upd.filter(col("o_orderdate") >= cuts(0) && col("o_orderdate") < cuts(1)),
      upd.filter(col("o_orderdate") >= cuts(1)))
    val hist = batches.foldLeft(Scd2.emptyHistory(spark, upd, "o_orderdate")) {
      (h, b) =>
        val next = Scd2.snapshot(h, b, "o_custkey", "o_orderdate").localCheckpoint(true)
        // the fold's previous state is dead once `next` materializes —
        // free its blocks now (only the FINAL history feeds the plan)
        graft.CacheScope.freeCheckpoint(h)
        next
    }
    // upd fed the batch builds; the returned plan reads only `hist`
    graft.CacheScope.freeCheckpoint(upd)
    graft.CacheScope.trackCheckpoint(hist)
    hist.select(col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").as("valid_from"), col("valid_to"))
      .orderBy(col("o_custkey"), col("valid_from"))
  }

  val q73Sql: String =
    """WITH d AS (
      |  SELECT o_custkey, o_totalprice, o_orderdate,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |  FROM orders
      |), u AS (
      |  SELECT o_custkey, o_totalprice, o_orderdate,
      |    CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00' THEN 0
      |         WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00' THEN 1
      |         ELSE 2 END AS b
      |  FROM d WHERE rn = 1
      |), lat AS (
      |  SELECT o_custkey, o_totalprice, o_orderdate, b,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey, b ORDER BY o_orderdate DESC) AS rn
      |  FROM u
      |)
      |SELECT o_custkey, o_totalprice, o_orderdate AS valid_from,
      |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY b) AS valid_to
      |FROM lat WHERE rn = 1
      |ORDER BY o_custkey, valid_from""".stripMargin

  /** Corpus document-frequency / IDF table
    * ([[graft.operators.TextAnalysis.docFrequency]]) restricted to
    * boilerplate-grade terms (df ≥ 100 over ~N/5 docs). The IDF builder
    * behind q75; also the "scrub list" a C4-style cleaner would subtract.
    */
  def q74DocFreq(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.docFrequency(t(spark, dir, "documents"), "doc_id")
      .filter(col("doc_freq") >= 100)
      .orderBy(col("doc_freq").desc, col("term").asc)

  val q74Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS term
      |  FROM documents
      |), df AS (
      |  SELECT term, COUNT(*) AS doc_freq FROM terms GROUP BY 1
      |)
      |SELECT term, doc_freq,
      |  round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / doc_freq), 6) AS idf
      |FROM df WHERE doc_freq >= 100
      |ORDER BY doc_freq DESC, term ASC""".stripMargin

  /** TF-IDF top-3 terms per document
    * ([[graft.operators.TextAnalysis.tfIdfTopTerms]]): rank order is
    * engine-stable because both factors round before composing (see the
    * operator scaladoc for the 2·ln(20) = ln(400) hazard).
    */
  def q75TfIdf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.tfIdfTopTerms(t(spark, dir, "documents"), "doc_id", k = 3)
      .orderBy(col("doc_id"), col("rn"))

  val q75Sql: String =
    """WITH tf AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), tfc AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2
      |), idf AS (
      |  SELECT term, round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / COUNT(DISTINCT doc_id)), 6) AS idf
      |  FROM tf GROUP BY term
      |), scored AS (
      |  SELECT tfc.doc_id, tfc.term, tfc.tf, round(tfc.tf * idf.idf, 6) AS tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY tfc.doc_id ORDER BY round(tfc.tf * idf.idf, 6) DESC, tfc.term ASC) AS rn
      |  FROM tfc JOIN idf USING (term)
      |)
      |SELECT doc_id, CAST(rn AS INT) AS rn, term, tf, tfidf FROM scored WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  /** Custom bounded-heap top-k aggregate
    * ([[graft.expressions.TopKAgg]], a TypedImperativeAggregate): the
    * five largest prices per (returnflag, linestatus) as a sorted-desc
    * array, carrying at most k doubles per group per task at every
    * stage (vs collect_list's whole-group buffers or the window sort).
    * Hash-matched against DuckDB's list aggregation — the oracle
    * certifies the heap's update/merge/serialize path end to end,
    * including map-side partials across 32 input partitions.
    */
  def q76TopkAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(call_function("topk_agg", col("l_extendedprice"), lit(5)).as("top5"),
        count(lit(1)).as("n_items"))
      // flattened to scalar columns: the driver's hash compare sorts rows
      // by value, which array cells break. try_element_at: a group with
      // fewer than 5 rows null-fills (DuckDB slice semantics) instead of
      // throwing INVALID_ARRAY_INDEX under ANSI mode.
      .select(Seq(col("l_returnflag"), col("l_linestatus")) ++
        (1 to 5).map(i => try_element_at(col("top5"), lit(i)).as(s"p$i")) ++ Seq(col("n_items")): _*)
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q76Sql: String =
    """WITH t AS (
      |  SELECT l_returnflag, l_linestatus,
      |    (list_sort(list(l_extendedprice), 'DESC'))[1:5] AS top5,
      |    COUNT(*) AS n_items
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus,
      |  top5[1] AS p1, top5[2] AS p2, top5[3] AS p3, top5[4] AS p4, top5[5] AS p5,
      |  n_items
      |FROM t ORDER BY 1, 2""".stripMargin

  /** Schema-evolution union: two extracts of the same entity with
    * DIFFERENT column sets (an old and a new pipeline version) combined
    * with `unionByName(allowMissingColumns = true)` — absent columns
    * null-fill. This is the lakehouse ingest reality (schema drift
    * between landing batches), and positional UNION silently corrupts
    * it; by-name resolution is the operator under test.
    */
  def q77SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val v1 = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    v1.unionByName(v2, allowMissingColumns = true)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  val q77Sql: String =
    """SELECT o_orderkey, o_totalprice, o_orderstatus FROM (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
      |) ORDER BY o_orderkey""".stripMargin

  /** UNPIVOT (melt) — the inverse of q37's pivot: wide per-status
    * conditional counts unpivoted to (status, metric, val) long form
    * via `Dataset.unpivot`. Long form is what downstream metric stores
    * and chart layers ingest; keeping the transform relational (Expand
    * under the hood, one pass) beats per-metric UNION ALL re-scans.
    */
  def q78Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
        sum(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L)).as("n_low"),
        count(lit(1)).as("n_total"))
    wide.unpivot(
      ids = Array(col("o_orderstatus")),
      values = Array(col("n_urgent"), col("n_low"), col("n_total")),
      variableColumnName = "metric", valueColumnName = "val")
      .orderBy("o_orderstatus", "metric")
  }

  val q78Sql: String =
    """WITH wide AS (
      |  SELECT o_orderstatus,
      |    CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
      |    CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low,
      |    COUNT(*) AS n_total
      |  FROM orders GROUP BY 1)
      |SELECT o_orderstatus, metric, val
      |FROM wide UNPIVOT (val FOR metric IN (n_urgent, n_low, n_total))
      |ORDER BY o_orderstatus, metric""".stripMargin

  /** Bucketed band join certified at SF scale
    * ([[graft.operators.BandJoin.bandedLeftJoinById]]): orders LEFT
    * band-joined to their lineitems shipped within ±30 days, through
    * the date-grid rewrite (probe exploded into adjacent buckets, pure
    * equi-join, residual re-check) — while the ORACLE runs the naive
    * BETWEEN band join. The hash match certifies rewrite ≡ naive on
    * real data, the same pattern q67 uses for the range join. Output
    * aggregated per order so LEFT semantics are visible (unmatched
    * orders keep n_lines = 0).
    */
  def q79BandJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"),
        col("l_linenumber"), col("l_quantity"))
    graft.operators.BandJoin.bandedLeftJoinById(
      orders, li, leftId = "o_orderkey", key = "o_orderkey",
      leftDateCol = "o_orderdate", rightDateCol = "l_shipdate", band = 30)
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_linenumber")).as("n_lines"),
        decSum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  val q79Sql: String =
    """SELECT o.o_orderkey, COUNT(l.l_linenumber) AS n_lines,
      |  round(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty
      |FROM orders o LEFT JOIN lineitem l
      |  ON o.o_orderkey = l.l_orderkey
      |  AND abs(date_diff('day', CAST(l.l_shipdate AS DATE), CAST(o.o_orderdate AS DATE))) <= 30
      |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): walk the implicit
    * binary-heap hierarchy parent(k) = k div 2 over customer keys from
    * root key 1, emitting each node's depth — the org-chart /
    * BOM-explosion query shape. Output is the per-depth roll-up.
    * Recursion depth is log₂(max key) (~14 at sf0.1), far under
    * Spark's recursion row/level limits; each step is one equi-join —
    * the same iterate-join-agg shape ConnectedComponents hand-rolls,
    * here expressed declaratively.
    */
  def q80RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    // every recursion step re-joins against this view — cache the scan
    // so ~14 iterations don't re-read the parquet each time
    // (CacheScope-tracked: unpersisted after the query's terminal action)
    CacheScope.track(t(spark, dir, "customer").cache())
      .createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH RECURSIVE r(k, depth) AS (
        |  SELECT c_custkey, 0 FROM customer_v WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, r.depth + 1
        |  FROM customer_v c JOIN r ON c.c_custkey DIV 2 = r.k
        |)
        |SELECT depth, COUNT(*) AS n_nodes, MIN(k) AS min_key, MAX(k) AS max_key
        |FROM r GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q80Sql: String =
    """WITH RECURSIVE r(k, depth) AS (
      |  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
      |  UNION ALL
      |  SELECT c.c_custkey, r.depth + 1
      |  FROM customer c JOIN r ON c.c_custkey // 2 = r.k
      |)
      |SELECT depth, COUNT(*) AS n_nodes, MIN(k) AS min_key, MAX(k) AS max_key
      |FROM r GROUP BY depth ORDER BY depth""".stripMargin

  /** Native batch `session_window` (the streaming R2 operator run in
    * batch) certified against a first-principles DuckDB islands
    * derivation (lag-gap break + running sum). Boundary semantics
    * verified empirically: an event exactly gap minutes after the
    * previous one MERGES (break strictly >), and session end = last
    * event + gap.
    */
  def q81SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")

  val q81Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |x AS (SELECT user_id, ts,
      |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
      |       THEN 1 ELSE 0 END AS brk FROM e),
      |s AS (SELECT user_id, ts,
      |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Correlated LATERAL subquery with per-row LIMIT: for every region,
    * the top-2 nations by customer count — the "top-n related rows per
    * outer row" shape. Catalyst decorrelates the lateral into a
    * DomainJoin-based plan; the per-group ORDER BY + LIMIT is the
    * lateral analogue of the q04 WindowGroupLimit pattern, expressed
    * as the SQL a BI tool would emit.
    */
  def q82LateralTopN(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("nation_v")
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT r.n_regionkey, t.n_name, t.n_cust
        |FROM (SELECT DISTINCT n_regionkey FROM nation_v) r,
        |LATERAL (
        |  SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
        |  FROM nation_v n LEFT JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.n_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_cust DESC, n.n_name ASC LIMIT 2
        |) t
        |ORDER BY r.n_regionkey, t.n_cust DESC, t.n_name""".stripMargin)
  }

  val q82Sql: String =
    """SELECT r.n_regionkey, t.n_name, t.n_cust
      |FROM (SELECT DISTINCT n_regionkey FROM nation) r,
      |LATERAL (
      |  SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
      |  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.n_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_cust DESC, n.n_name ASC LIMIT 2
      |) t
      |ORDER BY r.n_regionkey, t.n_cust DESC, t.n_name""".stripMargin

  /** TPC-H Q11-shaped share-of-total HAVING: nations whose revenue
    * exceeds 5% of GLOBAL revenue — an uncorrelated scalar subquery
    * inside HAVING. Catalyst plans the scalar as an independent
    * one-row subplan joined in (computed once, broadcast), so the big
    * aggregation runs exactly once — not once per group, and not twice
    * (the naive "compute total then re-aggregate" rewrite). Decimal
    * sums keep the share comparison exact on both engines.
    */
  def q83HavingShare(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("nation_v")
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT n.n_name,
        |  round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS nation_value
        |FROM nation_v n
        |JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        |JOIN orders_v o ON o.o_custkey = c.c_custkey
        |GROUP BY n.n_name
        |HAVING SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) >
        |  0.05 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders_v)
        |ORDER BY nation_value DESC, n_name""".stripMargin)
  }

  val q83Sql: String =
    """SELECT n.n_name,
      |  round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS nation_value
      |FROM nation n
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY n.n_name
      |HAVING SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) >
      |  0.05 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      |ORDER BY nation_value DESC, n_name""".stripMargin

  /** Column profiling ([[graft.analytics.DataChecks.profile]]): the
    * data-catalog statistics table over orders — a union of per-column
    * pruned-scan aggregations (single-distinct branches, no Expand; on
    * columnar storage the branches read the same bytes as one wide
    * scan). Price is pre-cast to DECIMAL so the rendered min/max string
    * is engine-identical (raw double→string rendering differs).
    */
  def q84Profile(spark: SparkSession, dir: String): DataFrame =
    graft.analytics.DataChecks.profile(
      // raw scan: the profiler's branches parallelize across columns, so
      // the single-row-group compensation shuffle would only add one
      // exchange per branch (see Tables.raw)
      Tables.raw(spark, dir, "orders")
        .withColumn("o_totalprice", col("o_totalprice").cast(D)),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
      .orderBy("column_name")

  val q84Sql: String = {
    def one(c: String, expr: String) =
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($expr) AS n_nulls,
         |  COUNT(DISTINCT $expr) AS n_distinct,
         |  CAST(MIN($expr) AS VARCHAR) AS min_value,
         |  CAST(MAX($expr) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    Seq(
      one("o_orderkey", "o_orderkey"),
      one("o_custkey", "o_custkey"),
      one("o_orderstatus", "o_orderstatus"),
      one("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
      one("o_orderdate", "o_orderdate"),
      one("o_orderpriority", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
