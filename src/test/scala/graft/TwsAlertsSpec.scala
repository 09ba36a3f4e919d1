package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{VitalsAlerts, VitalsAlertsTws}
import graft.streaming.VitalsAlerts.{Alert, Reading}

/** `transformWithState` twin of the vitals alert processor: identical
  * semantics to the flatMapGroupsWithState implementation and state
  * surviving micro-batch boundaries on the RocksDB store. (The TTL
  * path is plumbing-only — see the VitalsAlertsTws scaladoc caveat.)
  */
class TwsAlertsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  implicit private val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming: state crosses micro-batch boundaries; alerts equal the fMGWS implementation") {
    withRocksDb {
      val root = Files.createTempDirectory("tws_alerts").toString
      val mem = MemoryStream[Reading]
      val q = VitalsAlertsTws.detect(mem.toDS(), threshold = 3)
        .writeStream.queryName("tws_alerts_test")
        .option("checkpointLocation", s"$root/cp")
        .outputMode("append").format("memory").start()
      val batch1 = Seq(
        Reading("P1", ts("2026-08-11 09:00:00"), 150, 98),
        Reading("P1", ts("2026-08-11 09:01:00"), 150, 98),
        Reading("P2", ts("2026-08-11 09:00:30"), 80, 99))
      val batch2 = Seq(
        Reading("P1", ts("2026-08-11 09:02:00"), 150, 98), // 3rd consecutive → alert
        Reading("P2", ts("2026-08-11 09:01:30"), 40, 99))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(spark.table("tws_alerts_test").count() == 0)
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("tws_alerts_test").as[Alert].collect().toSeq
        .sortBy(a => (a.patient_id, a.ts.getTime))
      q.stop()
      val want = VitalsAlerts.detect((batch1 ++ batch2).toDS(), threshold = 3)
        .collect().toSeq.sortBy(a => (a.patient_id, a.ts.getTime))
      assert(got == want)
      assert(got.length == 1 && got.head.consecutive == 3)
    }
  }

  test("randomized: tws streaming across batches equals fMGWS batch on interleaved readings") {
    withRocksDb {
      val rnd = new scala.util.Random(23)
      val readings = (0 until 300).map { i =>
        Reading("P" + rnd.nextInt(5), ts(f"2026-08-11 ${9 + i / 60}%02d:${i % 60}%02d:00"),
          if (rnd.nextBoolean()) 150 else 80, 95 + rnd.nextInt(5))
      }
      val root = Files.createTempDirectory("tws_alerts_r").toString
      val mem = MemoryStream[Reading]
      val q = VitalsAlertsTws.detect(mem.toDS(), threshold = 2)
        .writeStream.queryName("tws_alerts_rand")
        .option("checkpointLocation", s"$root/cp")
        .outputMode("append").format("memory").start()
      readings.grouped(75).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("tws_alerts_rand").as[Alert].collect().toSeq
        .sortBy(a => (a.patient_id, a.ts.getTime))
      q.stop()
      val want = VitalsAlerts.detect(readings.toDS(), threshold = 2)
        .collect().toSeq.sortBy(a => (a.patient_id, a.ts.getTime))
      assert(got == want && got.nonEmpty)
    }
  }

}
