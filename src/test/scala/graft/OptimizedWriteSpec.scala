package graft

import org.apache.spark.sql.functions._

import graft.operators.TableVersions

/** Round-15 optimization pins: staged file count tracks BYTES (one
  * AQE-coalesced file for a tiny batch) instead of the writer's task
  * count, an EXPLICIT caller layout is never second-guessed (key-disjoint
  * files keep commit-stats pruning working), and the conf opt-out
  * restores the task-count shape. Also pins that data writes carry no
  * `_SUCCESS` marker while checkpoint datasets keep theirs (its readers
  * require it as the completeness signal).
  */
class OptimizedWriteSpec extends SparkSpec {

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("optw").toString + "/t"

  private def dataFiles(root: String): Seq[String] =
    TableVersions.commitState(spark, root).files.map(_.path)

  test("a plain wide-task append stages one bytes-sized file, not one per task") {
    val root = newRoot()
    TableVersions.append(spark, root,
      spark.range(0, 4000, 1, 16).select(col("id").as("k")))
    assert(dataFiles(root).size === 1,
      "16 upstream tasks of a KB-sized batch must coalesce to one staged file")
  }

  test("an explicit caller layout wins: repartitionByRange keeps its key-disjoint files") {
    val root = newRoot()
    TableVersions.append(spark, root,
      spark.range(1, 4001).select(col("id").as("k"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val st = TableVersions.commitState(spark, root)
    assert(st.files.size === 4, "explicit 4-range layout must stage 4 files")
    // the point of honoring the layout: disjoint k-ranges stay prunable
    val mins = st.files.flatMap(_.stats.get("k").flatMap(_.minNum)).sorted
    val maxs = st.files.flatMap(_.stats.get("k").flatMap(_.maxNum)).sorted
    assert(mins.size === 4 && mins.drop(1).zip(maxs.dropRight(1))
      .forall { case (mn, prevMax) => mn > prevMax },
      s"ranges must stay disjoint, got mins=$mins maxs=$maxs")
  }

  test("graft.table.optimizeWrite=false restores the task-count shape") {
    val root = newRoot()
    spark.conf.set("graft.table.optimizeWrite", "false")
    try TableVersions.append(spark, root,
      spark.range(0, 4000, 1, 8).select(col("id").as("k")))
    finally spark.conf.unset("graft.table.optimizeWrite")
    assert(dataFiles(root).size === 8)
  }

  test("data writes skip _SUCCESS; checkpoint datasets keep it") {
    val root = newRoot()
    TableVersions.append(spark, root,
      spark.range(0, 100).select(col("id").as("k")))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
    assert(dataDirs.nonEmpty)
    dataDirs.foreach { d =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_SUCCESS")),
        s"staged batch dir ${d.getPath} must not carry a _SUCCESS marker")
    }
  }
}
