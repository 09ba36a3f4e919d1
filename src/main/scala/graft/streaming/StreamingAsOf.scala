package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the unbounded twin of
  * [[graft.operators.AsOfJoin]]: a fact stream picks up the latest
  * preceding dimension snapshot per key, maintained as O(1) per-key
  * state (the newest right row seen), not a buffered history.
  *
  * Both sides arrive as one keyed stream of [[StreamingAsOf.Msg]]
  * envelopes (side 0 = dimension update, side 1 = fact) — the streaming
  * analogue of the batch operator's union-and-sweep. Within a
  * micro-batch, rows process in (ts, side) order (dimension first at
  * equal timestamps, matching the batch operator's `<=` visibility);
  * across micro-batches the state carries the sweep forward.
  *
  * Semantics note (the watermarking trade-off, stated rather than
  * hidden): enrichment is at-ARRIVAL — a dimension update that arrives
  * in a later micro-batch than a fact it should precede does not
  * retro-enrich that fact. Under ts-ordered delivery the output equals
  * the batch as-of join exactly (pinned by StreamingAsOfSpec); fully
  * out-of-order parity would require buffering facts behind a watermark
  * (unbounded lookback ⇒ unbounded state), which is the documented
  * reason Spark itself has no streaming as-of join.
  */
object StreamingAsOf {

  /** side 0 = right/dimension (payload set), side 1 = left/fact (v set). */
  final case class Msg(k: String, ts: Timestamp, side: Int, v: Double, payload: Double)
  final case class DimState(ts: Timestamp, payload: Double)
  final case class Enriched(k: String, ts: Timestamp, v: Double,
      asof_payload: Option[Double], asof_ts: Option[Timestamp])

  def leftMsg(k: String, ts: Timestamp, v: Double): Msg = Msg(k, ts, 1, v, 0.0)
  def rightMsg(k: String, ts: Timestamp, payload: Double): Msg = Msg(k, ts, 0, 0.0, payload)

  /** Works identically over a batch Dataset (Spark runs the same
    * operator), which is how the spec pins streaming ≡ batch.
    */
  def enrich(msgs: Dataset[Msg]): Dataset[Enriched] = {
    import msgs.sparkSession.implicits._
    msgs
      .groupByKey(_.k)
      .flatMapGroupsWithState[DimState, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[DimState]) =>
          val ordered = rows.toSeq.sortBy(m => (m.ts.getTime, m.side))
          var dim = state.getOption
          val out = Seq.newBuilder[Enriched]
          for (m <- ordered) {
            if (m.side == 0) {
              // keep the NEWEST snapshot only — O(1) state per key
              if (dim.forall(_.ts.getTime <= m.ts.getTime))
                dim = Some(DimState(m.ts, m.payload))
            } else {
              // at-arrival as-of: latest snapshot with ts <= fact ts
              val visible = dim.filter(_.ts.getTime <= m.ts.getTime)
              out += Enriched(key, m.ts, m.v, visible.map(_.payload), visible.map(_.ts))
            }
          }
          dim.foreach(state.update)
          out.result().iterator
      }
  }
}
