package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sustained-abnormal-vitals episode extraction: maximal runs of
  * consecutive readings above a threshold, kept when the run has at
  * least `minLen` readings — the batch twin of the streaming
  * [[graft.streaming.VitalsAlerts]] state machine (which fires ON the
  * 3rd consecutive abnormal reading; this reports the whole episode).
  *
  * Two implementations, asserted equivalent in EpisodesSpec:
  *  - [[episodes]] — declarative lag+cumsum run-ids (the q33
  *    sessionization idiom): one shuffle, whole-stage codegen, arbitrary
  *    group sizes. THE production path at 100 TB.
  *  - [[episodesTyped]] — `KeyValueGroupedDataset.flatMapGroups` with a
  *    per-patient in-memory scan: the typed-API escape hatch (SURVEY
  *    §2.10) for logic that outgrows expressions. Materializes each
  *    patient's readings, so it assumes bounded per-key data (a
  *    patient's readings in a lookback window — thousands, not
  *    billions).
  *
  * Readings must be tie-free per (patient, ts) — pre-aggregate
  * duplicates, as with [[AsOfJoin]].
  */
object Episodes {

  final case class Reading(patient_id: String, ts: java.sql.Timestamp, heart_rate: Int)
  final case class Episode(patient_id: String, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_readings: Long, peak_hr: Int)

  /** Declarative formulation: run-id = running count of entries INTO the
    * abnormal state, computed per patient in ts order; abnormal rows
    * grouped by (patient, run-id).
    */
  def episodes(readings: DataFrame, threshold: Int = 120, minLen: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("patient_id")).orderBy(col("ts"))
    val run = Window.partitionBy(col("patient_id"))
      .orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    readings
      .withColumn("abn", col("heart_rate") > threshold)
      .withColumn("entered",
        when(col("abn") && !coalesce(lag(col("abn"), 1).over(w), lit(false)), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("entered")).over(run))
      .filter(col("abn"))
      .groupBy(col("patient_id"), col("run_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_readings"), max(col("heart_rate")).as("peak_hr"))
      .filter(col("n_readings") >= minLen)
      .drop("run_id")
  }

  /** Typed formulation: per-patient sorted scan. */
  def episodesTyped(readings: Dataset[Reading], threshold: Int = 120,
      minLen: Int = 3): Dataset[Episode] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(_.patient_id).flatMapGroups { (pid, it) =>
      val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
      val out = scala.collection.mutable.ArrayBuffer.empty[Episode]
      var runStart = -1
      def close(endExclusive: Int): Unit =
        if (runStart >= 0 && endExclusive - runStart >= minLen) {
          val run = sorted.slice(runStart, endExclusive)
          out += Episode(pid, run.head.ts, run.last.ts, run.length.toLong,
            run.map(_.heart_rate).max)
        }
      sorted.indices.foreach { i =>
        if (sorted(i).heart_rate > threshold) { if (runStart < 0) runStart = i }
        else { close(i); runStart = -1 }
      }
      close(sorted.length)
      out.iterator
    }
  }
}
