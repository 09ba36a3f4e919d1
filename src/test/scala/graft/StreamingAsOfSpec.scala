package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{leftMsg, rightMsg, Enriched, Msg}

class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of enrichment semantics: latest preceding snapshot, inclusive, null before first") {
    val msgs = Seq(
      rightMsg("A", ts("2026-01-01 10:00:00"), 1.0),
      rightMsg("A", ts("2026-01-01 12:00:00"), 2.0),
      leftMsg("A", ts("2026-01-01 09:00:00"), 100.0), // before any snapshot
      leftMsg("A", ts("2026-01-01 10:00:00"), 101.0), // equal ts: snapshot visible
      leftMsg("A", ts("2026-01-01 11:59:00"), 102.0), // between snapshots
      leftMsg("A", ts("2026-01-01 13:00:00"), 103.0), // after newest
      leftMsg("B", ts("2026-01-01 10:00:00"), 200.0) // key with no snapshots
    ).toDS()
    val got = StreamingAsOf.enrich(msgs).collect()
      .map(e => (e.k, e.ts, e.v, e.asof_payload)).toSet
    assert(got == Set(
      ("A", ts("2026-01-01 09:00:00"), 100.0, None),
      ("A", ts("2026-01-01 10:00:00"), 101.0, Some(1.0)),
      ("A", ts("2026-01-01 11:59:00"), 102.0, Some(1.0)),
      ("A", ts("2026-01-01 13:00:00"), 103.0, Some(2.0)),
      ("B", ts("2026-01-01 10:00:00"), 200.0, None)))
  }

  test("streaming over micro-batches equals the batch as-of join under ordered delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Msg]
    val root = java.nio.file.Files.createTempDirectory("asof_stream_").toString
    val q = StreamingAsOf.enrich(mem.toDS())
      .writeStream.queryName("asof_stream_test")
      .option("checkpointLocation", s"$root/cp")
      .outputMode("append").format("memory").start()

    // deterministic interleaved history, delivered in ts order across
    // THREE micro-batches (state must carry snapshots across batches)
    val rnd = new scala.util.Random(11)
    val all = (0 until 120).map { i =>
      val k = "K" + (i % 4)
      val t = ts(f"2026-02-01 ${8 + i / 10}%02d:${i % 60}%02d:00")
      if (rnd.nextBoolean()) rightMsg(k, t, rnd.nextInt(1000) / 10.0)
      else leftMsg(k, t, i.toDouble)
    }.sortBy(m => (m.ts.getTime, m.side))
    all.grouped(40).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }

    val streamed = spark.table("asof_stream_test").as[Enriched].collect()
      .map(e => (e.k, e.ts, e.v, e.asof_payload, e.asof_ts)).toSet
    assert(streamed.size == all.count(_.side == 1))

    // batch oracle: the union-and-sweep AsOfJoin over the same history
    val left = all.filter(_.side == 1).map(m => (m.k, m.ts, m.v)).toDF("k", "ts", "v")
    val right = all.filter(_.side == 0).map(m => (m.k, m.ts, m.payload, m.ts))
      .toDF("rk", "rts", "asof_payload", "asof_ts")
    val batch = AsOfJoin.asOf(left, right, "k", "rk", "ts", "rts",
        Seq("asof_payload", "asof_ts"))
      .as[(String, Timestamp, Double, Option[Double], Option[Timestamp])]
      .collect().toSet
    assert(streamed == batch)
  }
}
