package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / golden-record selection — the record-linkage
  * pipeline a curation job runs over noisy categorical columns (vendor
  * names, author strings, product titles): near-duplicate spellings are
  * clustered and every cluster elects one canonical surface form.
  *
  * Composition of three individually-certified stages:
  *   1. candidate pairs from [[FuzzyJoin.tokenBlocked]] (shared-token
  *      blocking + bounded edit distance — never the all-pairs product);
  *   2. transitive closure via [[ConnectedComponents.run]] (A~B, B~C
  *      ⇒ one cluster even if A~C exceeds the distance bound);
  *   3. golden record per cluster: the most frequent member (row
  *      multiplicity), ties to the lexicographically smallest — a pure
  *      window over the cluster key.
  *
  * Scale shape: the pair stage shuffles on block tokens (df-capped in
  * FuzzyJoin), CC shuffles on node labels for diameter rounds (cluster
  * diameters here are tiny — chains of spelling variants), the final
  * windows shuffle once on the cluster key. Everything is keyed by the
  * DISTINCT value vocabulary, not by rows — the row table only
  * contributes multiplicities through one count aggregation.
  *
  * Output, one row per distinct value: (value, n_rows, cluster,
  * canonical, cluster_sz, rows_covered) where `cluster` is the min
  * member (the CC label), `cluster_sz` counts distinct values in the
  * cluster and `rows_covered` sums their row multiplicities.
  */
object EntityResolution {

  def resolve(df: DataFrame, valueCol: String, maxDist: Int = 3): DataFrame = {
    val vocab = df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_rows"))
    val pairs = FuzzyJoin.tokenBlocked(df.select(col(valueCol)), valueCol, maxDist)
      .select(col("a"), col("b"))
    val comp = ConnectedComponents.run(pairs, "a", "b")
      .select(col("id").as("value"), col("comp"))
    // values with no candidate pair are their own singleton cluster
    val clustered = vocab.join(comp, Seq("value"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("value")))
    val best = Window.partitionBy(col("cluster"))
      .orderBy(col("n_rows").desc, col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val whole = Window.partitionBy(col("cluster"))
    clustered
      .withColumn("canonical", first(col("value")).over(best))
      .withColumn("cluster_sz", count(lit(1)).over(whole))
      .withColumn("rows_covered", sum(col("n_rows")).over(whole))
      .select(col("value"), col("n_rows"), col("cluster"), col("canonical"),
        col("cluster_sz"), col("rows_covered"))
  }
}
