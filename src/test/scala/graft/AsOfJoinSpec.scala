package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin semantics: latest right row with ts <= left ts per key,
  * inclusive at equal timestamps, null payload when nothing precedes,
  * and exactly one shuffle in the physical plan (the union-and-sweep
  * guarantee that makes it safe at scale).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    // key, qts, px
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 11:00:00"), 2.0),
    ("A", ts("2024-01-01 12:00:00"), 3.0),
    ("B", ts("2024-01-01 11:30:00"), 9.0)
  ).toDF("k", "qts", "px")

  private val trades = Seq(
    ("A", ts("2024-01-01 10:30:00"), 1L), // between 10:00 and 11:00 -> px 1.0
    ("A", ts("2024-01-01 11:00:00"), 2L), // exactly at a quote -> inclusive, px 2.0
    ("A", ts("2024-01-01 09:00:00"), 3L), // before any quote -> null
    ("B", ts("2024-01-01 23:00:00"), 4L), // long after B's only quote -> px 9.0
    ("C", ts("2024-01-01 12:00:00"), 5L)  // key with no quotes at all -> null
  ).toDF("k", "tts", "trade_id")

  test("as-of picks latest preceding quote, inclusive at equal ts, null when none") {
    val out = AsOfJoin.asOf(trades, quotes, "k", "k", "tts", "qts", Seq("qts", "px"))
      .orderBy("trade_id")
      .select($"trade_id", $"px")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq === Seq(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> Some(9.0), 5L -> None))
  }

  test("as-of is one shuffle: the sweep window, nothing else") {
    val out = AsOfJoin.asOf(trades, quotes, "k", "k", "tts", "qts", Seq("qts", "px"))
    out.collect() // materialize so the adaptive plan is final
    // QueryStageExec nodes are leaves wrapping their stage plans, so a
    // typed collect can't see nested shuffles — count stages textually
    // on the final adaptive plan.
    val planStr = out.queryExecution.executedPlan.toString
    val shuffles = "ShuffleQueryStage".r.findAllIn(planStr).size
    assert(shuffles == 1,
      s"expected exactly 1 shuffle (the per-key sweep), got $shuffles:\n$planStr")
  }

  test("as-of matches the naive inequality-join + argmin plan on dense data") {
    // Random-ish but deterministic data, both formulations must agree.
    val r = spread(0 until 400)
    val rights = r.map(i => ("K" + i % 7, ts(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00"), i.toDouble))
      .distinctBy(x => (x._1, x._2)).toDF("k", "qts", "px")
    val lefts = r.take(150).map(i => ("K" + i % 9, ts(f"2024-01-01 ${(i * 7) % 24}%02d:${(i * 29) % 60}%02d:30"), i.toLong))
      .toDF("k", "tts", "id")
    val sweep = AsOfJoin.asOf(lefts, rights, "k", "k", "tts", "qts", Seq("qts", "px"))
      .select($"id", $"qts", $"px")
    val naive = lefts.join(rights, lefts("k") === rights("k") && $"qts" <= $"tts", "left")
      .groupBy($"id").agg(max(struct($"qts", $"px")).as("m"))
      .select($"id", $"m.qts".as("qts"), $"m.px".as("px"))
    assert(sweep.exceptAll(naive).isEmpty && naive.exceptAll(sweep).isEmpty)
  }

  private def spread(xs: Range): Seq[Int] = xs.map(i => (i * 2654435761L % 1000).toInt)

  private implicit class DistinctBy[T](private val s: Seq[T]) {
    def distinctBy[K](f: T => K): Seq[T] =
      s.groupBy(f).map(_._2.head).toSeq
  }
}
