package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-12 oracle queries: the MERGE schema-evolution surface under
  * the hash gate.
  *
  * q140 runs Spark's native `MERGE WITH SCHEMA EVOLUTION INTO` against
  * a `graft` catalog table (the clause derives AddColumn changes from
  * the extra source columns and drives them through
  * `GraftCatalog.alterTable` — [[graft.sources.GraftCatalog]] declares
  * `TableCapability.AUTOMATIC_SCHEMA_EVOLUTION`), then aggregates the
  * evolved table; DuckDB reproduces the same full-outer merge algebra
  * from the raw parquet, so rows+schema+hash certify both the
  * evolution commit and the merged values (old rows null-fill the new
  * column).
  */
object Round12Queries {

  /** SQL MERGE WITH SCHEMA EVOLUTION end-to-end (q140): CREATE +
    * INSERT a versioned orders table, evolve it with a merge whose
    * source carries an extra `o_bonus` column (updates by key + keyed
    * inserts), and read the evolved result back through the catalog.
    */
  def q140MergeEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables.t
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    if (!spark.conf.getOption("spark.sql.catalog.graft.warehouse").exists(_.nonEmpty))
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    val tbl = s"graft.db.e_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    try {
      t(spark, dir, "orders").createOrReplaceTempView("orders_src_q140")
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $tbl SELECT o_orderkey, o_orderstatus, " +
        "o_totalprice FROM orders_src_q140")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t USING (
           |  SELECT o_orderkey AS o_orderkey2, 'E' AS o_orderstatus,
           |    o_totalprice + 5 AS o_totalprice,
           |    CAST((o_orderkey % 100) + 0.5 AS DOUBLE) AS o_bonus
           |  FROM orders_src_q140 WHERE o_orderkey % 17 = 0
           |  UNION ALL
           |  SELECT o_orderkey + 60000000, 'E2', 1.25, CAST(2.5 AS DOUBLE)
           |  FROM orders_src_q140 WHERE o_orderkey % 301 = 0) s
           |ON t.o_orderkey = s.o_orderkey2
           |WHEN MATCHED THEN UPDATE SET o_orderstatus = s.o_orderstatus,
           |  o_totalprice = s.o_totalprice, o_bonus = s.o_bonus
           |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice,
           |  o_bonus) VALUES (s.o_orderkey2, s.o_orderstatus, s.o_totalprice,
           |  s.o_bonus)""".stripMargin)
      val res = spark.sql(
        s"""SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           |  round(CAST(sum(CAST(coalesce(o_bonus, 0.0) AS DECIMAL(38,4))) AS DOUBLE), 4)
           |    AS bonus_sum,
           |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4)
           |    AS total_price
           |FROM $tbl GROUP BY o_orderstatus ORDER BY status""".stripMargin)
      graft.CacheScope.trackCheckpoint(res.localCheckpoint(true)).orderBy("status")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      ()
    }
  }

  val q140Sql: String =
    """WITH src AS (
      |  SELECT o_orderkey AS k, 'E' AS st, o_totalprice + 5 AS p,
      |    (o_orderkey % 100) + 0.5 AS b
      |  FROM orders WHERE o_orderkey % 17 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 60000000, 'E2', 1.25, 2.5
      |  FROM orders WHERE o_orderkey % 301 = 0),
      |m AS (
      |  SELECT COALESCE(o.o_orderkey, s.k) AS k,
      |    CASE WHEN s.k IS NOT NULL THEN s.st ELSE o.o_orderstatus END AS st,
      |    CASE WHEN s.k IS NOT NULL THEN s.p ELSE o.o_totalprice END AS p,
      |    s.b AS b
      |  FROM orders o FULL OUTER JOIN src s ON o.o_orderkey = s.k)
      |SELECT st AS status, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_key,
      |  round(CAST(sum(CAST(COALESCE(b, 0.0) AS DECIMAL(38,4))) AS DOUBLE), 4) AS bonus_sum,
      |  round(CAST(sum(CAST(p AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM m GROUP BY 1 ORDER BY status""".stripMargin
}
