package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the latest right row with
  * `rightTs <= leftTs` for the same key — the canonical
  * point-in-time-correct enrichment (trades↔quotes, events↔dimension
  * snapshots). The reference approximates this with a band join plus
  * ROW_NUMBER argmin (`fact_patient_encounters.sql:107-110`, our J3);
  * this operator is the exact, unbounded-lookback form.
  *
  * Implementation is the scalable union-and-sweep formulation, not a
  * join: both sides are normalized to (key, ts, side, payload), unioned,
  * and swept by a window `last(payload, ignoreNulls)` over
  * (key, ts, side) order. Cost is ONE shuffle + sort of |L|+|R| rows —
  * no pair explosion regardless of how many right rows precede a left
  * row, which is what kills the naive `join(r.ts <= l.ts)`+argmin plan
  * at 100 TB (a hot key with a year of history explodes quadratically).
  * Right rows sort before left rows at equal timestamps, so a right row
  * AT the left row's timestamp is visible (<=, not <).
  *
  * Right rows must be unique per (key, ts) — pre-aggregate ties (the
  * sweep would otherwise pick whichever tied row sorted last,
  * nondeterministically).
  *
  * @param right     must contain `rightKey`, `rightTs`, and `payload`
  * @param payload   right columns carried onto matching left rows
  *                  (null when no right row precedes the left row)
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val internal = Seq("__k", "__ts", "__side", "__match", "__r")
    val clash = leftCols.filter(c => internal.contains(c) || payload.contains(c))
    require(clash.isEmpty,
      s"asOf: left columns collide with internal/payload names: ${clash.mkString(", ")}")
    val payloadStruct = struct(payload.map(col): _*)
    val rNorm = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      payloadStruct.as("__r"))
    val payloadType = rNorm.schema("__r").dataType
    val lNorm = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__r")) ++ leftCols.map(col): _*)
    val u = lNorm.unionByName(rNorm.select(
      Seq(col("__k"), col("__ts"), col("__side"), col("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*))
    val sweep = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__r"), ignoreNulls = true).over(sweep))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("__match").getField(p).as(p)): _*)
  }
}
