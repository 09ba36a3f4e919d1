package graft

import java.sql.Timestamp

import graft.streaming.StreamJoins

/** Stream-stream interval join: semantics on a hand-computed case, and
  * streaming-over-micro-batches ≡ the same function run in batch.
  */
object StreamJoinsSpec {
  case class Imp(k: String, ts: Timestamp, impId: Long)
  case class Click(k: String, ts: Timestamp, clickId: Long)
}

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._
  import StreamJoinsSpec.{Click, Imp}

  private def ts(s: String) = Timestamp.valueOf(s)

  private val imps = Seq(
    Imp("u1", ts("2026-03-01 10:00:00"), 1L),
    Imp("u1", ts("2026-03-01 10:20:00"), 2L),
    Imp("u2", ts("2026-03-01 10:05:00"), 3L))
  private val clicks = Seq(
    Click("u1", ts("2026-03-01 10:04:00"), 100L), // within 10m of imp 1
    Click("u1", ts("2026-03-01 10:25:00"), 101L), // within 10m of imp 2 only
    Click("u2", ts("2026-03-01 10:30:00"), 102L), // 25m after imp 3 → no match
    Click("u3", ts("2026-03-01 10:00:00"), 103L)) // no impression at all

  private val expected = Set((1L, 100L), (2L, 101L))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.selectExpr("l_payload.impId", "r_payload.clickId")
      .as[(Long, Long)].collect().toSet

  test("interval join semantics in batch: click attributes to impressions within the window") {
    val got = pairs(StreamJoins.intervalJoin(imps.toDF(), clicks.toDF(), "10 minutes"))
    assert(got == expected)
  }

  test("streaming micro-batches produce the same attribution as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impStream = MemoryStream[Imp]
    val clickStream = MemoryStream[Click]
    val root = java.nio.file.Files.createTempDirectory("ssj_").toString
    val q = StreamJoins.intervalJoin(impStream.toDF(), clickStream.toDF(), "10 minutes")
      .writeStream.queryName("ssj_test")
      .option("checkpointLocation", s"$root/cp")
      .outputMode("append").format("memory").start()
    try {
      // two micro-batches: the second click arrives a batch after its
      // impression — the join state must hold imp 2 across batches
      impStream.addData(imps.take(2): _*)
      clickStream.addData(clicks.head)
      q.processAllAvailable()
      impStream.addData(imps.drop(2): _*)
      clickStream.addData(clicks.tail: _*)
      q.processAllAvailable()
      assert(pairs(spark.table("ssj_test")) == expected)
    } finally q.stop()
  }
}
