package graft

import org.apache.spark.sql.SparkSession

/** One shared `graft` catalog registration for every suite that talks
  * SQL to it: the session caches the catalog instance (and its
  * warehouse) at FIRST use, so two suites registering different
  * warehouses on the shared session would silently read each other's
  * directories. Suites share this warehouse and use disjoint table
  * names.
  */
object TestCatalog {
  @volatile private var wh: String = _

  def warehouse(spark: SparkSession): String = synchronized {
    if (wh == null) {
      wh = java.nio.file.Files.createTempDirectory("gcw").toString
      spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    }
    wh
  }
}
