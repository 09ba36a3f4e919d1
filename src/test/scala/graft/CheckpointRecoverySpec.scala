package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Streaming checkpoint recovery: a windowed aggregation writing to a
  * file sink survives a query RESTART — the second query resumes from
  * the checkpoint's offsets and state, and the sink's commit log yields
  * exactly-once output (no lost windows, no duplicated windows), which
  * is the property a 15-minute production cycle actually relies on when
  * executors or the driver die mid-run.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg resumes from checkpoint after restart with exactly-once file output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.TIMESTAMP, org.apache.spark.sql.Encoders.STRING)
    val root = java.nio.file.Files.createTempDirectory("ckpt_").toString
    val outDir = s"$root/out"
    val cpDir = s"$root/cp"

    def startQuery(mem: MemoryStream[(Timestamp, String)]) =
      mem.toDF().toDF("ts", "k")
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "10 minutes"), col("k"))
        .count()
        .select(col("window.start").as("ws"), col("k"), col("count"))
        .writeStream
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .start()

    // run 1: window [10:00,10:10) with 2 events, then 10:15 arrives —
    // the query stops BEFORE any batch runs with a watermark past 10:10,
    // so window 1 sits un-emitted in checkpointed state at the "crash"
    val mem = MemoryStream[(Timestamp, String)]
    val q1 = startQuery(mem)
    mem.addData((ts("2026-06-01 10:01:00"), "a"), (ts("2026-06-01 10:03:00"), "a"))
    q1.processAllAvailable()
    mem.addData((ts("2026-06-01 10:15:00"), "a"))
    q1.processAllAvailable()
    q1.stop() // "crash" with window 1 still in state

    // run 2: NEW query, SAME checkpoint — resumes offsets, state, and
    // watermark; events added while no query was running are picked up
    mem.addData((ts("2026-06-01 10:22:00"), "a"))
    val q2 = startQuery(mem)
    q2.processAllAvailable() // watermark 10:15 → emits window 1 from recovered state
    mem.addData((ts("2026-06-01 10:35:00"), "a"))
    q2.processAllAvailable() // watermark 10:22 → emits [10:10,10:20)
    mem.addData((ts("2026-06-01 10:50:00"), "a"))
    q2.processAllAvailable() // watermark 10:35 → emits [10:20,10:30)
    q2.stop()

    val out = spark.read.parquet(outDir)
      .as[(Timestamp, String, Long)].collect().toSet
    // exactly-once: the window that was sitting in state at the crash is
    // emitted ONCE with both its events; nothing lost, nothing doubled
    // ([10:30,10:40) flushes too — Spark runs a closing no-data batch
    // after 10:50 advances the watermark)
    assert(out == Set(
      (ts("2026-06-01 10:00:00"), "a", 2L),
      (ts("2026-06-01 10:10:00"), "a", 1L),
      (ts("2026-06-01 10:20:00"), "a", 1L),
      (ts("2026-06-01 10:30:00"), "a", 1L)), s"got $out")
  }
}
