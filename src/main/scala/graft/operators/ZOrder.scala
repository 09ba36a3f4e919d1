package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of several
  * key columns into one sort key so that sorting by it co-locates rows
  * that are close in EVERY dimension at once. This is the data-layout
  * lever behind multi-column data skipping: parquet keeps min/max stats
  * per row group / file, and a scan with a predicate on any one
  * dimension prunes units whose range excludes it. A single-column sort
  * gives perfect pruning on that column and none on the others;
  * Z-ordering gives good (√-factor) pruning on all of them — the layout
  * Delta/Iceberg `OPTIMIZE ZORDER BY` produces, built here from first
  * principles on plain parquet.
  *
  * The interleave is a static chain of shift/mask/add column
  * expressions (`bits` per column), fully whole-stage-codegen'd — no
  * UDF, no per-row interpretation. Keys are first normalized to
  * [0, 2^bits) grid cells; the z-value is then range-partitioned and
  * sorted within partitions — exactly "global sort by curve position":
  * one pass to compute bounds, one shuffle, no driver-side data, any
  * scale.
  *
  * Normalization strategies (both distributed):
  *  - uniform (default): one min/max aggregate per key, then fixed-width
  *    cells — pure codegen arithmetic, right when domains are roughly
  *    uniform (ids, timestamps);
  *  - quantile: `approxQuantile` boundaries (Greenwald-Khanna sketch,
  *    one distributed pass) and a broadcast binary-search bucket — right
  *    for skewed domains, costs an extra pass at layout time.
  */
object ZOrder {

  /** Bit-interleaved Morton value of non-negative long columns (lowest
    * `bits` of each, column i owning bit positions i·1, i.e. bit j of
    * column i lands at position j·n + i). Overflow-safe for n·bits ≤ 62.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"zValue: ${cols.size} cols × $bits bits exceeds a long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (i * n + ci))
    terms.reduce(_ + _)
  }

  /** Returns `df` re-laid-out in Z-order along `keys` (numeric or
    * date/timestamp — anything castable to double): range-partitioned
    * into `numFiles` partitions by the interleaved value and sorted
    * within each. Writing the result with any parquet writer yields
    * files whose per-file min/max ranges are narrow in every key
    * dimension.
    */
  def cluster(df: DataFrame, keys: Seq[String], numFiles: Int, bits: Int = 12,
      quantile: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "cluster: need at least one key")
    // date/timestamp keys: normalize to epoch numbers first (a direct
    // date→double cast throws under ANSI mode)
    def numeric(k: String): Column = df.schema(k).dataType match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(k), lit(java.sql.Date.valueOf("1970-01-01"))).cast("double")
      case org.apache.spark.sql.types.TimestampType =>
        unix_timestamp(col(k)).cast("double")
      case _ => col(k).cast("double")
    }
    // empty input: nothing to lay out, and min/max below would be null
    if (df.isEmpty) return df
    val cells: Seq[Column] =
      if (quantile) {
        val nb = 1 << bits
        keys.map { k =>
          val probs = (1 until nb).map(_.toDouble / nb).toArray
          val bounds = df.select(numeric(k).as(k))
            .stat.approxQuantile(k, probs, 1.0 / (4 * nb))
          // distinct-ify: heavy hitters repeat boundaries; bucket = count
          // of boundaries <= v (monotone, so equal to binary search).
          val uniq = bounds.distinct.sorted
          val v = numeric(k)
          // O(|uniq|) interpreted per row — layout-time cost only; the
          // uniform path below is the hot default.
          size(filter(lit(uniq), b => b <= v)).cast("long")
        }
      } else {
        val nb = (1 << bits) - 1
        val stats = df.agg(
          keys.map(k => min(numeric(k)).as(s"__mn_$k")).head,
          (keys.tail.map(k => min(numeric(k)).as(s"__mn_$k")) ++
            keys.map(k => max(numeric(k)).as(s"__mx_$k"))): _*).head()
        keys.zipWithIndex.map { case (k, i) =>
          require(!stats.isNullAt(i) && !stats.isNullAt(keys.size + i),
            s"cluster: key '$k' is entirely null — cannot derive layout bounds")
          val mn = stats.getDouble(i)
          val mx = stats.getDouble(keys.size + i)
          val w = if (mx > mn) (mx - mn) / (nb + 1) else 1.0
          least(floor((numeric(k) - lit(mn)) / lit(w)), lit(nb.toLong)).cast("long")
        }
      }
    df.withColumn("__z", zValue(cells, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
