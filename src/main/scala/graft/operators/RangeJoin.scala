package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: each point row matches every interval
  * row with `lo <= point < hi`. The classic lookup shapes — IP→geo
  * ranges, price→band, timestamp→validity window — are all this join,
  * and the naive formulation is a cross join with a theta filter, which
  * Spark plans as BroadcastNestedLoopJoin (O(|P|·|I|) comparisons):
  * fine for a 5-row band table, fatal when the interval table is
  * millions of CIDR blocks.
  *
  * The scale path here is bucketization: pick a bucket width, explode
  * each interval onto the fixed-width grid cells it covers, map each
  * point to its single cell, and equi-join on the cell id with the
  * range predicate as a residual. A point lies in exactly one cell and
  * an interval covers each of its cells exactly once, so every true
  * (point, interval) pair meets in exactly one cell — no dedup needed.
  * The join is a plain shuffle/broadcast HASH join on the cell id:
  * distributed, AQE-skew-splittable, and linear in |P| + Σ(interval
  * width/bucket) instead of |P|·|I|.
  *
  * Width is a fan-out knob, not a correctness knob: too narrow explodes
  * wide intervals into many cells (cost Σ width/bucket), too wide makes
  * each cell's residual filter discard more false candidates. A decent
  * default is the median interval width. `maxCellsPerInterval` guards
  * the degenerate wide-interval row (a [0, ∞) catch-all would explode
  * the grid); raise it consciously or split such intervals out and
  * cross-join them (they match everything anyway).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double, maxCellsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__cell"),
      "__cell is reserved by pointInInterval")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column overlap: ${clash.mkString(", ")}")
    val loCell = floor(col(loCol) / bucketWidth).cast("long")
    // hi is exclusive; a hi exactly on a cell edge contributes nothing to
    // that cell, but keeping it costs one residual-filtered candidate and
    // avoids an off-by-one for hi inside the cell.
    val hiCell = floor(col(hiCol) / bucketWidth).cast("long")
    // Fail loudly on a degenerate wide interval instead of silently
    // truncating its matches (a capped slice here would be a wrong-answer
    // bug, not an optimization). A null lo/hi makes the width comparison
    // null — coalesce it to true so the row falls through to the null
    // sequence (explode of null → no candidates, matching the naive theta
    // join's no-match) instead of tripping the assert.
    val guarded = assert_true(coalesce(hiCell - loCell <= maxCellsPerInterval, lit(true)),
      lit(s"pointInInterval: an interval spans more than $maxCellsPerInterval cells; " +
        "widen bucketWidth or raise maxCellsPerInterval"))
    val iv = intervals
      .withColumn("__cell", explode(when(guarded.isNull, sequence(loCell, hiCell))))
    points
      .withColumn("__cell", floor(col(pointCol) / bucketWidth).cast("long"))
      .join(iv, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }
}
