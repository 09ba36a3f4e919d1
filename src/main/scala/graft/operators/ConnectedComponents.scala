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
  * Two algorithms, auto-selected by measured round count:
  *
  *  - **Min-label propagation** (default start): every node starts
  *    labeled with itself; each round every node takes the min of its
  *    own and its neighbors' labels; converged when nothing changes.
  *    One equi-join + one aggregation per round, rounds = graph
  *    DIAMETER. Duplicate clusters are near-cliques (diameter ≤ 2-3),
  *    so this wins for the common case.
  *  - **Large-star/small-star alternation** [Kiveris et al., "Connected
  *    Components in MapReduce and Beyond", SoCC'14]: each pass rewires
  *    every node's larger neighbors to its local minimum (large-star)
  *    and then contracts the smaller neighborhood onto it (small-star);
  *    the edge set converges to per-component stars in O(log² n)
  *    passes regardless of diameter. [[run]] ESCALATES to this when
  *    propagation hasn't converged after `escalateAfter` rounds — the
  *    signal that the graph has long chains, exactly where star
  *    contraction's round bound beats diameter.
  *
  * Iteration hygiene at scale: each round's output is
  * `localCheckpoint`ed — iterative self-referential plans otherwise grow
  * lineage exponentially (analysis/optimization time, not data time) and
  * re-execute every prior round on each action. Checkpoint BLOCKS are
  * freed deterministically: a superseded round's blocks are unpersisted
  * as soon as the next round has materialized (memory bound: O(1)
  * checkpoints per run, not O(rounds) — nothing else reaps them until a
  * driver GC), and checkpoints the returned plan still references are
  * registered with [[graft.CacheScope.trackCheckpoint]] for end-of-query
  * release.
  *
  * Output: (id, comp) for every node appearing in any edge, where
  * comp = min node id reachable in the node's component.
  */
object ConnectedComponents {

  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50, escalateAfter: Int = 8): DataFrame = {
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
    while (!converged && iter < math.min(escalateAfter, maxIter)) {
      val nbrMin = und
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("nbr_min"))
      // the convergence check RIDES the checkpoint job: an Observation
      // on the changed-label count fires during the eager localCheckpoint
      // materialization, so each round is ONE job, not checkpoint +
      // isEmpty (measured: eager observations do fire on localCheckpoint)
      val obs = org.apache.spark.sql.Observation()
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .observe(obs, count(when(col("comp") =!= col("old"), 1)).as("changed"))
        .localCheckpoint(true)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      // the new round is materialized (eager checkpoint) — the previous
      // round's blocks are dead; free them now instead of at driver GC
      graft.CacheScope.freeCheckpoint(labels)
      labels = updated.select(col("id"), col("comp"))
      iter += 1
    }
    if (converged) {
      // the returned plan reads only the final labels checkpoint
      graft.CacheScope.freeCheckpoint(und)
      graft.CacheScope.trackCheckpoint(labels)
      labels
    } else {
      // long-chain graph: diameter exceeds the propagation budget —
      // switch to the star-contraction algorithm on the original edges
      graft.CacheScope.freeCheckpoint(labels)
      val (starLabels, _) = alternatingWithRounds(und, maxIter)
      // starLabels' plan references und and the final star edge set —
      // those stay until end-of-query (tracked inside alternating)
      graft.CacheScope.trackCheckpoint(und)
      starLabels
    }
  }

  /** Large-star/small-star alternation over a symmetric (a, b) edge
    * frame; returns (labels, passes used). Exposed with the round count
    * so specs can pin the O(log² n) bound on adversarial path graphs.
    */
  private[graft] def alternatingWithRounds(und: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    // directed representation: every edge as (larger, smaller), no
    // self-loops — both star steps preserve and require this orientation
    var d = und.filter(col("a") > col("b")).distinct().localCheckpoint(true)
    var iter = 0
    var converged = d.isEmpty
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized edges: every neighbor v > u
      // rewires to m(u) = min(N(u) ∪ {u})
      val sym = d.union(d.select(col("b").as("a"), col("a").as("b")))
      val lsMin = sym.groupBy(col("a"))
        .agg(least(col("a"), min(col("b"))).as("m"))
      val ls = sym.join(lsMin, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
      // small-star over the (larger, smaller) edges: u and all its
      // smaller neighbors contract onto m(u) = min of that set
      val ssMin = ls.groupBy(col("a")).agg(min(col("b")).as("m"))
      val joined = ls.join(ssMin, "a")
      val next = joined
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(ssMin.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true)
      // fixpoint: the directed edge set is stable (stars map to
      // themselves under both steps)
      converged = next.count() == d.count() && next.except(d).isEmpty
      graft.CacheScope.freeCheckpoint(d) // superseded pass — blocks are dead
      d = next
      iter += 1
    }
    require(converged, s"star-contraction CC did not converge in $maxIter passes")
    // the returned plan reads the final star edge set — free at end-of-query
    graft.CacheScope.trackCheckpoint(d)
    // star edges are (member, component-min); centers label themselves.
    // Nodes of und absent from d (isolated via self-loop-only input or
    // singleton stars) keep their own id.
    val starLabels = d.select(col("a").as("id"), col("b").as("comp"))
      .union(d.select(col("b").as("id"), col("b").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    (und.select(col("a").as("id")).distinct()
      .join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp")), iter)
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
