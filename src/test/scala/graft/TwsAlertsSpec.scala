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

  test("TTL: state expires across query restarts; without TTL it survives the restart") {
    // ROOT CAUSE of the documented "TTL spin": with TimeMode.ProcessingTime
    // the stateful operator keeps reporting that another batch may be
    // needed (a timer/TTL could fire at any moment), so NO trigger ever
    // reaches a terminal "done" — AvailableNow included; the query loops
    // empty batches at full speed (observed: the execution thread burning
    // CPU creating checkpoint files forever). Workaround for testability:
    // pace the batches with a real ProcessingTime interval, WAIT for the
    // data batch to commit (progress with our row counts), and stop the
    // query externally. TTL expiration stamps come from batch processing
    // time, and an expired value reads back as null after restart.
    withRocksDb {
      import java.time.Duration
      import org.apache.spark.sql.streaming.Trigger
      for ((ttl, expectAlert) <- Seq(
          (Some(Duration.ofSeconds(2)), false), (None, true))) {
        val root = Files.createTempDirectory("tws_ttl").toString
        val mem = MemoryStream[Reading]
        // foreachBatch sink: unlike the memory sink it supports restart
        // from an existing checkpoint (run 2 resumes run 1's state)
        val collected = new java.util.concurrent.ConcurrentLinkedQueue[Alert]()
        def runOnce(expectInput: Long): Unit = {
          val q = VitalsAlertsTws.detect(mem.toDS(), threshold = 3, ttl = ttl)
            .writeStream
            .option("checkpointLocation", s"$root/cp")
            .outputMode("append")
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[Alert], _: Long) =>
              batch.collect().foreach(collected.add)
            }
            .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
          // wait until our rows were processed AND a later (empty) batch
          // committed — i.e. the data batch is fully done — then stop
          val deadline = System.currentTimeMillis() + 60000
          def seenAll: Boolean = {
            val p = q.recentProgress
            p.map(_.numInputRows).sum >= expectInput &&
              p.last.numInputRows == 0
          }
          while (!seenAll && System.currentTimeMillis() < deadline)
            Thread.sleep(100)
          assert(seenAll, s"stream never processed $expectInput rows")
          q.stop()
        }
        mem.addData(
          Reading("P1", ts("2026-08-11 09:00:00"), 150, 98),
          Reading("P1", ts("2026-08-11 09:01:00"), 150, 98)) // counter = 2
        runOnce(expectInput = 2)
        assert(collected.isEmpty)
        // sleep past the TTL so the store-side expiration stamp (run-1
        // processing time + 2s) is in the past for run 2
        if (ttl.isDefined) Thread.sleep(4500)
        mem.addData(Reading("P1", ts("2026-08-11 09:02:00"), 150, 98))
        runOnce(expectInput = 1)
        val alerts = scala.jdk.CollectionConverters.CollectionHasAsScala(collected).asScala.toSeq
        if (expectAlert)
          assert(alerts.length == 1 && alerts.head.consecutive == 3,
            s"state should survive restart without TTL: $alerts")
        else
          assert(alerts.isEmpty,
            s"TTL should have dropped P1's counter before run 2: $alerts")
      }
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
