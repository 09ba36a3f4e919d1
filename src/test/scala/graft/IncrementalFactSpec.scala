package graft

import graft.gen.HealthcareGenerator
import graft.model.Config
import graft.runner.Lakehouse

/** Incremental fact refresh ≡ full rebuild (dynamic partition overwrite
  * correctness): applying batch 2 incrementally over batch 1's lakehouse
  * must produce exactly the fact a from-scratch build over batch 1+2
  * produces.
  */
class IncrementalFactSpec extends SparkSpec {

  test("incremental refresh equals full rebuild over the combined batches") {
    val cfg = Config.default
    val gen = new HealthcareGenerator(42L, cfg.asOf.toLocalDateTime.toLocalDate)

    // lakehouse A: batch 1 full build, then batch 2 incrementally
    val rootA = java.nio.file.Files.createTempDirectory("inc_a_").toString
    val lakeA = new Lakehouse(spark, rootA, cfg)
    lakeA.runEtl(gen.messagesJson(spark, 2000).toDF("value"))
    lakeA.buildFact()
    val affected = lakeA.refreshFactIncremental(
      gen.messagesJson(spark, 1000, offset = 2000).toDF("value"))
    assert(affected.nonEmpty)

    // lakehouse B: one full build over both batches
    val rootB = java.nio.file.Files.createTempDirectory("inc_b_").toString
    val lakeB = new Lakehouse(spark, rootB, cfg)
    lakeB.runEtl(gen.messagesJson(spark, 3000).toDF("value"))
    lakeB.buildFact()

    val a = lakeA.fact
    val b = lakeB.fact
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
