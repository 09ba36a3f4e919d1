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
}
