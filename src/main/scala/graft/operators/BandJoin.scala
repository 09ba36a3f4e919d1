package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-path rewrite of the reference's proximity band join
  * (`fact_patient_encounters.sql:111-114`: equi key + |date diff| ≤ n
  * days residual).
  *
  * The naive plan — equi-join on the key with the band predicate as a
  * residual — is correct but pairs EVERY row of a key before filtering.
  * At 100 TB, a hot key with m left rows and n right rows produces m×n
  * intermediate pairs even when the band keeps almost none.
  *
  * The bucketed rewrite (SURVEY §7.4) makes the band part of the join
  * key: bucket both sides by `floor(days/bandWidth)` and explode the
  * PROBE side into its bucket and the two adjacent buckets. Any pair
  * within ±band days lands in at least one common (key, bucket); the
  * exact predicate is re-checked as a residual. Join fan-out per key
  * drops from m×n to Σ_bucket m_b×(n_{b-1}+n_b+n_{b+1}) — bounded by
  * temporal locality instead of key cardinality, and the 3× probe
  * duplication is a constant factor that AQE handles.
  */
object BandJoin {

  /** Left join `left` with `right` on `key = key AND
    * |datediff(leftDate, rightDate)| <= band`, via the bucketed rewrite.
    * The caller supplies a unique left row id (`leftId`) so LEFT
    * semantics can be restored with a cheap anti-join on that id.
    * Output contract matches the naive `left.join(right, cond, "left")`
    * (right columns null for unmatched left rows; right's key column
    * collapsed into left's).
    */
  def bandedLeftJoinById(left: DataFrame, right: DataFrame, leftId: String,
      key: String, leftDateCol: String, rightDateCol: String, band: Int): DataFrame = {
    val width = band + 1
    val epoch = lit("1970-01-01").cast("date")
    val lb = floor(datediff(col(leftDateCol), epoch) / width)
    val rb = floor(datediff(col(rightDateCol), epoch) / width)

    val probe = left.withColumn("__bucket", explode(array(lb - 1, lb, lb + 1)))
    val build = right.withColumn("__bucket", rb).withColumnRenamed(key, "__rkey")

    val matched = probe
      .join(build,
        col(key) === col("__rkey") && probe("__bucket") === build("__bucket") &&
          abs(datediff(col(leftDateCol), col(rightDateCol))) <= band)
      .drop("__bucket", "__rkey")

    val rightNulls = right.columns.filterNot(_ == key)
      .map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val unmatched = left
      .join(matched.select(col(leftId)).distinct(), Seq(leftId), "left_anti")
      .select(left.columns.map(col) ++ rightNulls: _*)

    matched.select((left.columns ++ right.columns.filterNot(_ == key)).map(col): _*)
      .unionByName(unmatched)
  }

  /** Measured fan-out of the naive plan vs the bucketed rewrite:
    * (naive pairs = Σ_key m_k·n_k, bucketed pairs = Σ_{key,b} m_{k,b}·
    * (n_{k,b-1}+n_{k,b}+n_{k,b+1})). Both come from per-key(-bucket)
    * COUNT aggregates — map-side-combined, so the statistics job touches
    * orders of magnitude fewer rows than the join it sizes up. This is
    * the "fan-out statistics" the auto toggle decides on, not a guess
    * from table sizes.
    */
  def pairCounts(left: DataFrame, right: DataFrame, key: String,
      leftDateCol: String, rightDateCol: String, band: Int): (Long, Long) = {
    val width = band + 1
    val epoch = lit("1970-01-01").cast("date")
    val lc = left.groupBy(col(key).as("k"),
        floor(datediff(col(leftDateCol), epoch) / width).as("b"))
      .agg(count(lit(1)).as("m"))
    val rc = right.groupBy(col(key).as("k"),
        floor(datediff(col(rightDateCol), epoch) / width).as("b"))
      .agg(count(lit(1)).as("n"))
    val naive = lc.groupBy("k").agg(sum("m").as("m"))
      .join(rc.groupBy("k").agg(sum("n").as("n")), "k")
      .agg(coalesce(sum(col("m") * col("n")), lit(0L)).as("p"))
      .head().getLong(0)
    val bucketed = lc.withColumn("b", explode(array(col("b") - 1, col("b"), col("b") + 1)))
      .join(rc, Seq("k", "b"))
      .agg(coalesce(sum(col("m") * col("n")), lit(0L)).as("p"))
      .head().getLong(0)
    (naive, bucketed)
  }

  /** Auto-toggled band join: measure the fan-out, use the bucketed
    * rewrite only when the naive plan would materialize `ratio`× more
    * intermediate pairs (and enough absolute pairs to matter —
    * `minPairs` keeps small inputs on the simpler plan, where the 3×
    * probe duplication costs more than it saves). Returns the chosen
    * plan; both produce identical rows (BandJoinRewriteSpec /
    * OperatorsSpec pin the equivalence).
    */
  def autoBandedLeftJoin(left: DataFrame, right: DataFrame, leftId: String,
      key: String, leftDateCol: String, rightDateCol: String, band: Int,
      ratio: Double = 3.0, minPairs: Long = 10000000L): DataFrame = {
    val (naive, bucketed) = pairCounts(left, right, key, leftDateCol, rightDateCol, band)
    if (naive >= minPairs && naive > ratio * math.max(1L, bucketed))
      bandedLeftJoinById(left, right, leftId, key, leftDateCol, rightDateCol, band)
    else
      left.join(right.withColumnRenamed(key, "__rkey"),
          col(key) === col("__rkey") &&
            abs(datediff(col(leftDateCol), col(rightDateCol))) <= band, "left")
        .drop("__rkey")
  }
}
