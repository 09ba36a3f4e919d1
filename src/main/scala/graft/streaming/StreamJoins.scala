package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval (event-time range) join — the missing join
  * mode in the reference's Beam pipeline (which only fans one stream
  * out to sinks; see SURVEY §2.9). The canonical use: attribute each
  * conversion event to the impression that preceded it within an
  * attribution window, while BOTH sides are unbounded streams.
  *
  * Spark's stream-stream inner join requires watermarks on both sides
  * plus a time-range join condition so the state store can evict: an
  * impression can be dropped from state once the watermark passes
  * `impression_ts + window` (no future click can match it), and
  * symmetric for clicks. Without the range condition the state grows
  * forever — this operator exists to encode the bounded-state shape
  * once, correctly.
  *
  * The same function works in batch (Spark's unified API): the spec
  * asserts streaming-over-micro-batches ≡ batch on identical input.
  */
object StreamJoins {

  /** Inner interval join: each right row (key, ts) matches left rows
    * (key, ts) with `leftTs <= rightTs <= leftTs + window`.
    * Columns required: `k`, `ts` on both; all other columns pass
    * through with the given prefixes.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, windowExpr: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("k").as("l_k"), col("ts").as("l_ts"),
        struct(left.columns.filter(c => c != "k" && c != "ts").map(col): _*).as("l_payload"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("k").as("r_k"), col("ts").as("r_ts"),
        struct(right.columns.filter(c => c != "k" && c != "ts").map(col): _*).as("r_payload"))
    l.join(r,
      col("l_k") === col("r_k") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowExpr"))
  }
}
