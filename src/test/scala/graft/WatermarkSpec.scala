package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Watermark late-data semantics, pinned explicitly: in append mode a
  * windowed aggregate only emits a window once the watermark passes its
  * end, and an event arriving after the watermark has passed its
  * window is DROPPED — the documented engine improvement over the
  * reference (which declares no late-data policy at all, SURVEY §2.9).
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(ts: Timestamp, k: String)
  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode windowed count: on-time data emits on watermark advance; late data is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(Timestamp, String)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.TIMESTAMP, org.apache.spark.sql.Encoders.STRING)
    val mem = MemoryStream[(Timestamp, String)]
    val root = java.nio.file.Files.createTempDirectory("wm_").toString
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
      .select(col("window.start").as("ws"), col("k"), col("count"))
      .writeStream.queryName("wm_test")
      .option("checkpointLocation", s"$root/cp")
      .outputMode("append").format("memory").start()
    try {
      def emitted() = spark.table("wm_test")
        .as[(Timestamp, String, Long)].collect().toSet

      // batch 1: two events in window [10:00, 10:10)
      mem.addData((ts("2026-05-01 10:01:00"), "a"), (ts("2026-05-01 10:04:00"), "a"))
      q.processAllAvailable()
      assert(emitted().isEmpty, "window must not emit before the watermark passes its end")

      // batch 2: event at 10:21 → watermark 10:16 > 10:10 closes window 1
      mem.addData((ts("2026-05-01 10:21:00"), "b"))
      q.processAllAvailable()
      assert(emitted() == Set((ts("2026-05-01 10:00:00"), "a", 2L)))

      // batch 3: a LATE event for the closed [10:00, 10:10) window — dropped,
      // plus one more on-time event for [10:20, 10:30)
      mem.addData((ts("2026-05-01 10:02:00"), "a"), (ts("2026-05-01 10:22:00"), "b"))
      // batch 4: advance watermark past 10:30 to flush window 2
      mem.addData((ts("2026-05-01 10:40:00"), "c"))
      q.processAllAvailable()
      val out = emitted()
      assert(out.contains((ts("2026-05-01 10:20:00"), "b", 2L)),
        s"window 2 must count both b events: $out")
      // the late 10:02 event must NOT have re-emitted or changed window 1
      assert(out.count(_._1 == ts("2026-05-01 10:00:00")) == 1)
      assert(out.collectFirst { case (w, "a", n) if w == ts("2026-05-01 10:00:00") => n }
        .contains(2L), s"late data must be dropped, not merged: $out")
    } finally q.stop()
  }
}
