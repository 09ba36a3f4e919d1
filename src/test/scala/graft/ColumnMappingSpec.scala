package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** COLUMN MAPPING (Delta name-mode): [[TableVersions.renameColumn]] is
  * a metadata-only commit — the physical name (what every immutable
  * file stores) rides the committed schema's field metadata, reads
  * project physical → logical, writes rename logical → physical — so a
  * rename costs one small commit on a 100 TB table, old versions
  * time-travel under their own names, and stats pruning / DVs / CDF /
  * maintenance all keep working across the rename.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("cmap").toString + "/tbl"

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in:\n" + df.queryExecution.executedPlan))
    scan.metrics("numFiles").value
  }

  test("rename is metadata-only: values preserved, zero files rewritten, time travel keeps old names") {
    val root = newRoot()
    val v0 = TableVersions.append(spark, root,
      (1L to 1000L).toDF("k").withColumn("v", col("k") * 7).repartitionByRange(4, col("k")))
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    val v1 = TableVersions.renameColumn(spark, root, "v", "amount")
    assert(TableVersions.listing(spark, root).map(_._1).toSet === files0,
      "a rename must not touch a single data file")
    val t = TableVersions.read(spark, root)
    assert(t.columns.toSeq === Seq("k", "amount"))
    assert(t.filter(col("k") === 10L).select("amount").head().getLong(0) === 70L,
      "values carry through the rename")
    assert(t.agg(sum("amount")).head().getLong(0) === (1L to 1000L).map(_ * 7).sum)
    // time travel: the pre-rename version reads under its own name
    val old = TableVersions.read(spark, root, Some(v0))
    assert(old.columns.toSeq === Seq("k", "v"))
    assert(old.agg(sum("v")).head().getLong(0) === (1L to 1000L).map(_ * 7).sum)
    // stats pruning still fires on the NEW name (stats are physical)
    assert(filesRead(t.filter(col("k") <= 250L)) === 1)
    assert(filesRead(t) === 4)
    assert(v1 === v0 + 1)
  }

  test("appends, upserts, DV deletes, compaction and CDF work across the rename") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 500L).toDF("k").withColumn("v", col("k") * 2).coalesce(1))
    TableVersions.renameColumn(spark, root, "v", "score")
    // append with the NEW logical name: rows line up with pre-rename data
    TableVersions.append(spark, root,
      (501L to 600L).toDF("k").withColumn("score", col("k") * 2).coalesce(1))
    val t1 = TableVersions.read(spark, root)
    assert(t1.count() === 600)
    assert(t1.filter(col("k") === 100L).select("score").head().getLong(0) === 200L)
    assert(t1.filter(col("k") === 550L).select("score").head().getLong(0) === 1100L)
    // appending with the OLD name now fails the evolution contract loudly
    val ex = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root, (601L to 610L).toDF("k").withColumn("v", col("k")))
    }
    assert(ex.getMessage.contains("'score' is missing"))
    // DV delete with a predicate on the renamed column
    val Some(dv) = TableVersions.deleteWhere(spark, root,
      col("score") === 200L, maxDvFraction = 0.1): @unchecked
    assert(TableVersions.read(spark, root).filter(col("k") === 100L).count() === 0)
    assert(TableVersions.commitState(spark, root).dvs.nonEmpty)
    // DV upsert keyed on k replaces a renamed-column value
    val Some(_) = TableVersions.upsert(spark, root,
      Seq((200L, -5L)).toDF("k", "score"), "k", maxDvFraction = 0.1): @unchecked
    assert(TableVersions.read(spark, root)
      .filter(col("k") === 200L).select("score").head().getLong(0) === -5L)
    // CDF across the rename: the feed reads under the LATEST logical
    // names; the DV step's delete image surfaces with `score`
    val cur = TableVersions.currentVersion(spark, root).get
    val cdf = TableVersions.readChanges(spark, root, dv - 1, cur)
    assert(cdf.columns.contains("score") && !cdf.columns.contains("v"))
    assert(cdf.filter(col("_change_type") === "delete" && col("_commit_version") === dv)
      .select("score").head().getLong(0) === 200L)
    // compaction folds DVs and preserves data under the mapping
    val before = TableVersions.read(spark, root).orderBy("k").collect()
    TableVersions.compact(spark, root, targetBytes = 1L << 30)
    assert(TableVersions.commitState(spark, root).dvs.isEmpty)
    assert(TableVersions.read(spark, root).orderBy("k").collect() === before)
    // a second rename stacks on the same physical name
    TableVersions.renameColumn(spark, root, "score", "points")
    val t2 = TableVersions.read(spark, root)
    assert(t2.columns.toSeq === Seq("k", "points"))
    assert(t2.filter(col("k") === 200L).select("points").head().getLong(0) === -5L)
  }

  test("format('graft-table') serves mapped snapshots; upsert key pruning uses physical stats") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 4000L).toDF("id").withColumn("v", col("id") * 3)
        .repartitionByRange(4, col("id")))
    TableVersions.renameColumn(spark, root, "id", "event_id")
    val fmt = spark.read.format("graft-table").load(root)
    assert(fmt.columns.toSeq === Seq("event_id", "v"))
    assert(fmt.count() === 4000)
    fmt.createOrReplaceTempView("gt_mapped")
    assert(spark.sql("SELECT sum(v) FROM gt_mapped WHERE event_id <= 10").head().getLong(0) ===
      (1L to 10L).map(_ * 3).sum)
    // upsert keyed by the RENAMED column stays stats-pruned: only the
    // file covering the key range rewrites
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    val Some(_) = TableVersions.upsert(spark, root,
      Seq((5L, -1L)).toDF("event_id", "v"), "event_id"): @unchecked
    val files1 = TableVersions.listing(spark, root).map(_._1).toSet
    assert((files0 -- files1).size === 1, "only the key-range candidate file rewrites")
    assert(TableVersions.read(spark, root).count() === 4000)
    assert(TableVersions.read(spark, root)
      .filter(col("event_id") === 5L).select("v").head().getLong(0) === -1L)
    // prunedRead with LOGICAL bounds prunes via physical stats
    assert(TableVersions.prunedRead(spark, root, Seq("event_id"),
      Map("event_id" -> (1.0, 100.0))).count() === 100)
  }

  test("rename restrictions are loud: partition columns, existing names, CHECK references") {
    val root = newRoot()
    val df = Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("k", "g", "v")
    TableVersions.append(spark, root, df, partitionBy = Seq("g"))
    TableVersions.addConstraint(spark, root, "v_pos", "v > 0")
    assert(intercept[IllegalArgumentException] {
      TableVersions.renameColumn(spark, root, "g", "grp")
    }.getMessage.contains("partition column"))
    assert(intercept[IllegalArgumentException] {
      TableVersions.renameColumn(spark, root, "k", "v")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      TableVersions.renameColumn(spark, root, "v", "val")
    }.getMessage.contains("v_pos"))
    // dropping the constraint unblocks the rename; the check gate then
    // applies to the new world
    TableVersions.dropConstraint(spark, root, "v_pos")
    TableVersions.renameColumn(spark, root, "v", "val")
    assert(TableVersions.read(spark, root).columns.toSet === Set("k", "g", "val"))
    // partition pruning and bloom point lookup still work on the mapped table
    assert(TableVersions.readPartitions(spark, root, Map("g" -> "a")).count() === 1)
    TableVersions.maintainBloomIndex(spark, root, "val", 100L)
    assert(TableVersions.bloomPointLookup(spark, root, "val", lit(6L))
      .select("k").head().getLong(0) === 2L)
  }

  test("dropColumn is metadata-only; resurrecting dropped/renamed physical names is rejected") {
    val root = newRoot()
    TableVersions.append(spark, root, (1L to 100L).toDF("k")
      .withColumn("v", col("k") * 2).withColumn("extra", col("k") * 3).coalesce(1))
    val files0 = TableVersions.listing(spark, root).map(_._1).toSet
    TableVersions.renameColumn(spark, root, "v", "score")
    // a NEW column named like a renamed column's PHYSICAL would read the
    // old files' stored values — rejected loudly
    val exPhys = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root,
        (101L to 110L).toDF("k").withColumn("score", col("k") * 2)
          .withColumn("extra", col("k") * 3).withColumn("v", lit(0L)))
    }
    assert(exPhys.getMessage.contains("PHYSICAL"))
    // drop: schema-only, files untouched, old version time-travels with it
    val vDrop = TableVersions.dropColumn(spark, root, "extra")
    assert(TableVersions.listing(spark, root).map(_._1).toSet === files0)
    assert(TableVersions.read(spark, root).columns.toSeq === Seq("k", "score"))
    assert(TableVersions.read(spark, root, Some(vDrop - 1)).columns.contains("extra"))
    // re-adding the dropped name would resurrect the stored values
    val exDrop = intercept[IllegalArgumentException] {
      TableVersions.append(spark, root,
        (101L to 110L).toDF("k").withColumn("score", col("k") * 2)
          .withColumn("extra", lit(0L)))
    }
    assert(exDrop.getMessage.contains("DROPPED"))
    // a genuinely fresh column evolves fine; old files null-fill it
    TableVersions.append(spark, root,
      (101L to 110L).toDF("k").withColumn("score", col("k") * 2)
        .withColumn("note", lit("n")).coalesce(1))
    val t = TableVersions.read(spark, root)
    assert(t.count() === 110)
    assert(t.filter(col("k") === 1L).select("note").head().isNullAt(0))
    // the dropped registry survives delta/checkpoint reconstruction
    TableVersions.clearStateCache()
    assert(TableVersions.commitState(spark, root).dropped === Set("extra"))
    // restrictions
    val root2 = newRoot()
    TableVersions.append(spark, root2,
      Seq((1L, "a", 5L)).toDF("k", "g", "w"), partitionBy = Seq("g"))
    assert(intercept[IllegalArgumentException] {
      TableVersions.dropColumn(spark, root2, "g")
    }.getMessage.contains("partition column"))
    TableVersions.addConstraint(spark, root2, "w_pos", "w > 0")
    assert(intercept[IllegalArgumentException] {
      TableVersions.dropColumn(spark, root2, "w")
    }.getMessage.contains("w_pos"))
    TableVersions.dropConstraint(spark, root2, "w_pos")
    TableVersions.dropColumn(spark, root2, "w")
    TableVersions.dropColumn(spark, root2, "k")
    assert(intercept[IllegalArgumentException] {
      TableVersions.dropColumn(spark, root2, "g")
    }.getMessage.contains("last column"))
    assert(TableVersions.read(spark, root2).columns.toSeq === Seq("g"))
  }

  test("delta commits and checkpoints carry the mapping; reconstruction preserves it") {
    val root = newRoot()
    val prev = spark.conf.getOption("graft.table.checkpointInterval")
    spark.conf.set("graft.table.checkpointInterval", "2")
    try {
      TableVersions.append(spark, root, (1L to 50L).toDF("k").withColumn("v", col("k")))
      TableVersions.renameColumn(spark, root, "v", "w") // v1, delta + metadata
      TableVersions.append(spark, root,
        (51L to 60L).toDF("k").withColumn("w", col("k"))) // v2, delta + checkpoint
      TableVersions.clearStateCache()
      val t = TableVersions.read(spark, root)
      assert(t.columns.toSeq === Seq("k", "w"))
      assert(t.count() === 60)
      assert(t.agg(sum("w")).head().getLong(0) === (1L to 60L).sum)
      // the checkpoint-reconstructed schema still maps w -> physical v
      val st = TableVersions.commitState(spark, root)
      val f = st.schema.get.fields.find(_.name == "w").get
      assert(f.metadata.getString("graft_physical") === "v")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("graft.table.checkpointInterval", p)
        case None => spark.conf.unset("graft.table.checkpointInterval")
      }
    }
  }
}
