package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at 100 TB (the brief's salting
  * bullet; complements AQE's runtime skew-join splitting, which only
  * covers sort-merge joins).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial-aggregates
    * hot keys across `saltBuckets` reducers, then a second (tiny)
    * aggregation merges the partials. Use when ONE key holds a large
    * share of all rows — Spark's own partial aggregation already handles
    * moderate skew, but a single dominant key still funnels its entire
    * final aggregation through one reducer; salting splits that reducer
    * `saltBuckets` ways.
    *
    * Aggregates must be algebraic (sum/count/min/max — mergeable
    * partials); pass the columns per aggregate kind:
    * {{{
    * saltedAgg(df, keys = Seq("user_id"), saltBuckets = 16,
    *   sums = Seq("v"), mins = Seq("v"))   // → v_sum, row_count, v_min
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      sums: Seq[String] = Nil, counts: Boolean = true,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val phase1Aggs =
      sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
        (if (counts) Seq(count(lit(1)).as("__cnt")) else Nil) ++
        mins.map(c => min(col(c)).as(s"__min_$c")) ++
        maxs.map(c => max(col(c)).as(s"__max_$c"))
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      sums.map(c => sum(col(s"__sum_$c")).as(s"${c}_sum")) ++
        (if (counts) Seq(sum(col("__cnt")).as("row_count")) else Nil) ++
        mins.map(c => min(col(s"__min_$c")).as(s"${c}_min")) ++
        maxs.map(c => max(col(s"__max_$c")).as(s"${c}_max"))
    phase1.groupBy(keys.map(col): _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted broadcast-side replication for skewed equi-joins when the
    * build side is small enough to replicate: the probe side gets a
    * random salt in [0, saltBuckets), the build side is exploded across
    * every salt value, and the join key becomes (key, salt) — hot probe
    * keys spread over `saltBuckets` tasks instead of one.
    *
    * Prefer AQE skew handling when applicable; this is the explicit
    * form for hash joins and for engines/plans AQE doesn't rewrite.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // build-side replication preserves only probe-side join semantics;
    // right/full would emit each unmatched build row saltBuckets times
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports probe-side join types only, got $joinType")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
