package graft

import java.sql.Timestamp

import scala.util.Random

import graft.operators.Episodes
import graft.operators.Episodes.Reading

/** Episode extraction: typed flatMapGroups scan ≡ declarative lag+cumsum
  * formulation, plus hand-computed cases.
  */
class EpisodesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("episodes: hand-computed runs, boundaries inclusive, short runs dropped") {
    val readings = Seq(
      // P1: run of 3 (kept), then normal, then run of 2 (dropped)
      Reading("P1", ts(0), 130), Reading("P1", ts(1), 140), Reading("P1", ts(2), 125),
      Reading("P1", ts(3), 90),
      Reading("P1", ts(4), 130), Reading("P1", ts(5), 121),
      // P2: run of 4 at the END of the series (kept — no trailing normal)
      Reading("P2", ts(0), 80), Reading("P2", ts(1), 125), Reading("P2", ts(2), 122),
      Reading("P2", ts(3), 150), Reading("P2", ts(4), 128)
    ).toDS()
    val out = Episodes.episodesTyped(readings).collect().sortBy(e => (e.patient_id, e.start_ts.getTime))
    assert(out.length == 2)
    assert(out(0) == Episodes.Episode("P1", ts(0), ts(2), 3L, 140))
    assert(out(1) == Episodes.Episode("P2", ts(1), ts(4), 4L, 150))
  }

  test("typed and declarative formulations agree on randomized data") {
    val r = new Random(55)
    val readings = (0 until 40).flatMap { p =>
      (0 until 50).map(i => Reading(s"P$p", ts(i), 60 + r.nextInt(90)))
    }.toDS()
    val typed = Episodes.episodesTyped(readings).toDF()
    val decl = Episodes.episodes(readings.toDF())
      .select("patient_id", "start_ts", "end_ts", "n_readings", "peak_hr")
    assert(typed.count() > 0, "randomized data should produce some episodes")
    assert(typed.exceptAll(decl).isEmpty && decl.exceptAll(typed).isEmpty)
  }
}
