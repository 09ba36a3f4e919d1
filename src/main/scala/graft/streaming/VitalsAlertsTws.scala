package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.VitalsAlerts.{abnormal, Alert, AlertState, Reading}

/** [[VitalsAlerts]] re-expressed on `transformWithState` — Spark 4's
  * arbitrary-stateful-processing API (SPARK-40434, successor to
  * `flatMapGroupsWithState`). Same alert semantics, pinned equal by
  * TwsAlertsSpec; what the new surface adds over the old one:
  *
  *  - **typed state handles** (`ValueState`/`ListState`/`MapState`)
  *    instead of a single monolithic state object — each evolves and
  *    TTLs independently;
  *  - **declarative state TTL** (`TTLConfig`): a patient silent longer
  *    than the TTL has their counter dropped BY THE STORE, not by
  *    hand-rolled timeout handling — bounded state at any key
  *    cardinality without timer bookkeeping;
  *  - **composability**: init/handleInputRows/timers are separate
  *    hooks, so processors stay small objects.
  *
  * Requires the RocksDB state store provider when run as a stream
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `...RocksDBStateStoreProvider`) — the changelog-checkpointed store
  * that makes per-key state practical at 100 TB key cardinalities.
  */
object VitalsAlertsTws {

  class AlertProcessor(threshold: Int, ttl: Option[Duration])
    extends StatefulProcessor[String, Reading, Alert] {

    @transient private var state: ValueState[AlertState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AlertState]("alert_state",
        Encoders.product[AlertState],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(patientId: String, rows: Iterator[Reading],
        timerValues: TimerValues): Iterator[Alert] = {
      val ordered = rows.toSeq.sortBy(_.ts.getTime)
      var st = Option(state.get()).getOrElse(AlertState(0, new java.sql.Timestamp(0)))
      val alerts = Seq.newBuilder[Alert]
      for (r <- ordered) {
        st =
          if (abnormal(r)) AlertState(st.consecutiveAbnormal + 1, r.ts)
          else AlertState(0, r.ts)
        if (st.consecutiveAbnormal >= threshold)
          alerts += Alert(patientId, r.ts, st.consecutiveAbnormal,
            s"$patientId: ${st.consecutiveAbnormal} consecutive abnormal readings")
      }
      state.update(st)
      alerts.result().iterator
    }
  }

  /** Same contract as [[VitalsAlerts.detect]]; `ttl` evicts state for
    * patients not seen within the duration (processing-time based).
    *
    * TTL caveat (root-caused): a TTLConfig forces
    * `TimeMode.ProcessingTime`, under which the stateful operator keeps
    * reporting that another batch may be needed (a timer/TTL could fire
    * at any moment) — so no trigger, AvailableNow included, ever reaches
    * a terminal "done"; the query loops empty batches indefinitely.
    * `processAllAvailable`/`awaitTermination` therefore hang by design.
    * Callers in bounded contexts pace the trigger and stop the query
    * externally once progress shows their data batches committed —
    * TwsAlertsSpec's TTL test does exactly this and asserts store-side
    * expiry across a checkpoint restart (expired state reads as null).
    */
  def detect(readings: Dataset[Reading], threshold: Int = 3,
      ttl: Option[Duration] = None): Dataset[Alert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.patient_id)
      .transformWithState(new AlertProcessor(threshold, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
