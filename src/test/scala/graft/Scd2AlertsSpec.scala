package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.streaming.VitalsAlerts
import graft.streaming.VitalsAlerts.{Alert, Reading}

/** SCD2 snapshot semantics and stateful streaming alerts. */
class Scd2AlertsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2: first run opens all rows; newer updates close and re-open; stale updates ignored") {
    val batch1 = Seq(
      ("P1", "ICU", ts("2026-08-01 00:00:00")),
      ("P2", "Emergency", ts("2026-08-01 00:00:00")))
      .toDF("id", "location", "updated_at")
    val h1 = Scd2.snapshot(Scd2.emptyHistory(spark, batch1, "updated_at"), batch1, "id", "updated_at")
    assert(h1.count() == 2)
    assert(h1.filter($"valid_to".isNull).count() == 2)

    val batch2 = Seq(
      ("P1", "Recovery Room", ts("2026-08-05 00:00:00")), // newer → new version
      ("P2", "Emergency", ts("2026-07-20 00:00:00")), // older → ignored
      ("P3", "ICU", ts("2026-08-06 00:00:00"))) // brand new
      .toDF("id", "location", "updated_at")
    val h2 = Scd2.snapshot(h1, batch2, "id", "updated_at").cache()

    assert(h2.count() == 4) // P1 closed + P1 new + P2 untouched + P3 new
    val p1 = h2.filter($"id" === "P1").orderBy($"valid_from").collect()
    assert(p1.length == 2)
    assert(p1(0).getAs[Timestamp]("valid_to") == ts("2026-08-05 00:00:00"))
    assert(p1(1).getAs[String]("location") == "Recovery Room" && p1(1).getAs[Timestamp]("valid_to") == null)
    val p2 = h2.filter($"id" === "P2").collect()
    assert(p2.length == 1 && p2.head.getAs[Timestamp]("valid_to") == null)
    assert(p2.head.getAs[Timestamp]("updated_at") == ts("2026-08-01 00:00:00"))
    assert(h2.filter($"id" === "P3" && $"valid_to".isNull).count() == 1)
  }

  test("scd2: multiple updates for one key in a batch keep only the latest") {
    val b1 = Seq(("P1", "a", ts("2026-08-01 00:00:00"))).toDF("id", "v", "updated_at")
    val h1 = Scd2.snapshot(Scd2.emptyHistory(spark, b1, "updated_at"), b1, "id", "updated_at")
    val b2 = Seq(
      ("P1", "mid", ts("2026-08-02 00:00:00")),
      ("P1", "latest", ts("2026-08-03 00:00:00"))).toDF("id", "v", "updated_at")
    val h2 = Scd2.snapshot(h1, b2, "id", "updated_at")
    val cur = h2.filter($"valid_to".isNull).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("v") == "latest")
  }

  test("scd2: durable parquet snapshot round-trips") {
    val path = java.nio.file.Files.createTempDirectory("scd2_").toString + "/snap"
    val b1 = Seq(("P1", 1, ts("2026-08-01 00:00:00"))).toDF("id", "v", "updated_at")
    Scd2.snapshotTable(spark, path, b1, "id", "updated_at")
    val b2 = Seq(("P1", 2, ts("2026-08-02 00:00:00"))).toDF("id", "v", "updated_at")
    val h = Scd2.snapshotTable(spark, path, b2, "id", "updated_at")
    assert(h.count() == 2)
    assert(h.filter($"valid_to".isNull).head().getAs[Int]("v") == 2)
  }

  test("stateful alerts: fires at 3 consecutive abnormal readings, resets on normal") {
    val readings = Seq(
      Reading("P1", ts("2026-08-11 10:00:00"), 150, 98), // 1
      Reading("P1", ts("2026-08-11 10:01:00"), 150, 98), // 2
      Reading("P1", ts("2026-08-11 10:02:00"), 80, 98), // reset
      Reading("P1", ts("2026-08-11 10:03:00"), 150, 98), // 1
      Reading("P1", ts("2026-08-11 10:04:00"), 40, 98), // 2
      Reading("P1", ts("2026-08-11 10:05:00"), 150, 85), // 3 → alert
      Reading("P1", ts("2026-08-11 10:06:00"), 150, 98), // 4 → alert
      Reading("P2", ts("2026-08-11 10:00:00"), 150, 98),
      Reading("P2", ts("2026-08-11 10:01:00"), 80, 98)).toDS()
    val alerts = VitalsAlerts.detect(readings, threshold = 3).collect().sortBy(_.ts.getTime)
    assert(alerts.length == 2)
    assert(alerts.forall(_.patient_id == "P1"))
    assert(alerts(0).consecutive == 3 && alerts(0).ts == ts("2026-08-11 10:05:00"))
    assert(alerts(1).consecutive == 4)
  }

  test("stateful alerts run as a real stream with state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Reading]
    val root = java.nio.file.Files.createTempDirectory("alerts_").toString
    val q = VitalsAlerts.detect(mem.toDS(), threshold = 3)
      .writeStream.queryName("alerts_test")
      .option("checkpointLocation", s"$root/cp")
      .outputMode("append").format("memory").start()
    // two abnormal readings in batch 1, the third arrives in batch 2 —
    // the alert requires state to survive the batch boundary
    mem.addData(
      Reading("P9", ts("2026-08-11 09:00:00"), 150, 98),
      Reading("P9", ts("2026-08-11 09:01:00"), 150, 98))
    q.processAllAvailable()
    assert(spark.table("alerts_test").count() == 0)
    mem.addData(Reading("P9", ts("2026-08-11 09:02:00"), 150, 98))
    q.processAllAvailable()
    val alerts = spark.table("alerts_test").as[Alert].collect()
    assert(alerts.length == 1 && alerts.head.consecutive == 3)
    q.stop()
  }
}
