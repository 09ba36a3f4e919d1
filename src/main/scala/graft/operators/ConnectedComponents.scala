package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step of every dedup pipeline: near-duplicate detectors
  * ([[Dedup.minHashLsh]], [[Dedup.simHashDedup]], [[Dedup.ngramJaccard]],
  * [[VectorOps.embeddingNearDup]]) emit PAIRS, but "keep one document per
  * duplicate GROUP" needs the transitive closure of those pairs (A~B,
  * B~C ⇒ {A,B,C} is one cluster even if A~C was never tested).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min of its own label and
  * its neighbors' labels; converged when no label changes. Each round is
  * one equi-join + one aggregation — all shuffles are on the node id, no
  * quadratic blow-up. Rounds needed = graph diameter; duplicate clusters
  * are near-cliques (diameter ≤ 2-3) so this converges in a handful of
  * rounds at any corpus size. (For adversarial long-chain graphs the
  * classic fix is large-star/small-star contraction [Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14], which
  * squares the propagation distance per round; dedup similarity graphs
  * don't need it.)
  *
  * Iteration hygiene at scale: each round's labels are
  * `localCheckpoint`ed — iterative self-referential plans otherwise grow
  * lineage exponentially (analysis/optimization time, not data time) and
  * re-execute every prior round on each action.
  *
  * Output: (id, component) for every node appearing in any edge, where
  * component = min node id reachable in the node's component.
  */
object ConnectedComponents {

  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50): DataFrame = {
    // Undirected: materialize both directions once. Self-loops are
    // harmless (a node is trivially its own neighbor).
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .localCheckpoint(true)

    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("nbr_min"))
      // carry the previous label through the update so the convergence
      // check is a filter on the checkpointed result, not another join
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      converged = updated.filter(col("comp") =!= col("old")).isEmpty
      labels = updated.select(col("id"), col("comp"))
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }

  /** Dedup-cluster view: each node with its cluster representative (the
    * min id — the canonical "keeper") and the cluster's size. "Drop all
    * but the keeper" is then `filter(col("id") =!= col("component"))`.
    */
  def clusters(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val comp = run(edges, src, dst)
    val sizes = comp.groupBy(col("comp").as("comp")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "comp")
      .select(col("id"), col("comp").as("component"), col("cluster_size"))
  }
}
