package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines: stable train/test
  * splits and stratified sampling. Everything derives from xxhash64 of a
  * stable id — no RNG state, so splits are reproducible across runs,
  * sessions, and cluster sizes, and a re-run over grown data keeps every
  * previously-assigned row in the same split (the property that matters
  * when a corpus is re-snapshotted between training runs: no
  * train/test leakage from rows migrating across splits).
  *
  * Per-row, shuffle-free, codegen'd — one scan at any scale.
  */
object Sampling {

  /** Uniform [0,1) weight from a stable id (xxhash64 → positive double).
    * pmod, not abs(...) % ...: abs(Long.MinValue) overflows, which under
    * ANSI mode (the Spark 4 default) throws ARITHMETIC_OVERFLOW for the
    * one-in-2⁶⁴ id that hashes there — pmod is always non-negative with
    * no overflow path.
    */
  def splitWeight(idCol: Column, seed: Int = 42): Column =
    pmod(xxhash64(idCol, lit(seed)), lit(1000000000L)).cast("double") / lit(1e9)

  /** Deterministic train/validation/test split: adds a `split` column.
    * Fractions must sum to ≤ 1; any remainder falls into the last split.
    */
  def split(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
      seed: Int = 42): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val w = splitWeight(col(idCol), seed)
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val expr = fractions.zip(cuts).init
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), cut), rest) =>
        when(w < cut, name).otherwise(rest)
      }
    df.withColumn("split", expr)
  }

  /** Stratified sample: per-stratum keep-fractions, hash-deterministic.
    * Rows in strata absent from `fractions` are dropped (matching
    * `DataFrameStatFunctions.sampleBy` semantics, but reproducible by
    * construction rather than by seeding Bernoulli draws).
    */
  def stratified(df: DataFrame, strataCol: String, fractions: Map[String, Double],
      idCol: String, seed: Int = 42): DataFrame = {
    val w = splitWeight(col(idCol), seed)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && w < f)
    }
    df.filter(keep)
  }
}
