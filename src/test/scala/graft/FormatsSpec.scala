package graft

import graft.gen.HealthcareGenerator
import graft.model.Config
import graft.runner.Lakehouse

/** Zone format pluggability: the same pipeline over ORC zones produces a
  * byte-equal fact to the Parquet default (SURVEY §1's "everything is
  * format-pluggable" claim, proven).
  */
class FormatsSpec extends SparkSpec {

  test("ORC lakehouse produces the same fact as the Parquet lakehouse") {
    val cfg = Config.default
    val gen = new HealthcareGenerator(42L, cfg.asOf.toLocalDateTime.toLocalDate)
    val raw = gen.messagesJson(spark, 2000).toDF("value").cache()
    try {
      val pRoot = java.nio.file.Files.createTempDirectory("graft_fmt_parquet_").toString
      val oRoot = java.nio.file.Files.createTempDirectory("graft_fmt_orc_").toString
      val pLake = new Lakehouse(spark, pRoot, cfg)
      val oLake = new Lakehouse(spark, oRoot, cfg, format = "orc")
      pLake.runEtl(raw); pLake.buildFact()
      oLake.runEtl(raw); oLake.buildFact()

      val p = pLake.fact
      val o = oLake.fact
      assert(p.count() == o.count() && p.count() > 0)
      assert(p.exceptAll(o).isEmpty && o.exceptAll(p).isEmpty)

      // the ORC zone really is ORC on disk
      val factDir = new java.io.File(s"${oLake.curatedDir}/fact_patient_encounters")
      def orcFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(orcFiles).sum
        else if (f.getName.endsWith(".orc")) 1 else 0
      assert(orcFiles(factDir) > 0, "expected .orc files in the curated zone")
    } finally raw.unpersist()
  }

  test("unsupported zone format is rejected eagerly") {
    intercept[IllegalArgumentException] {
      new Lakehouse(spark, "/tmp/never", Config.default, format = "csv")
    }
  }
}
