package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, SemDedup}

/** [[graft.operators.SemDedup]] cell-size guard: bounded pair counts on
  * planted hot clusters, unchanged semantics when no cell is oversized,
  * and locality of the semantic split.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic unit-ish vector seeded by (group, i); near-dups add a
    * tiny perturbation so exact cosine stays ≥ 0.999.
    */
  private def vec(group: Int, i: Int, dims: Int = 64, jitter: Double = 0.0): Array[Double] =
    Array.tabulate(dims) { d =>
      var z = 0x9E3779B97F4A7C15L * (group * 131071L + (if (jitter == 0.0) i else -1) * 4099L + d + 7)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = z ^ (z >>> 27)
      ((math.abs(z % 2000001L) - 1000000L) / 1000000.0) + jitter * i
    }

  private def assigned(rows: Seq[(Long, Long, Array[Double])]): DataFrame =
    rows.toDF("cluster_id", "vec_id", "vec")

  test("hot homogeneous cluster falls back to star edges: linear pair count, one component") {
    val n = 300
    // 300 near-identical vectors (perturbation 1e-4·i) in ONE cluster —
    // the case hyperplane splitting cannot separate and should not.
    val hot = (0 until n).map(i => (7L, i.toLong, vec(1, i, jitter = 1e-4)))
    val edges = SemDedup.edges(assigned(hot), "vec_id", "vec",
      threshold = 0.95, maxCellSize = 50).cache()
    val cnt = edges.count()
    assert(cnt == n - 1, s"star fallback must emit n-1 edges, got $cnt (quadratic would be ${n * (n - 1) / 2})")
    val comps = ConnectedComponents.clusters(edges.toDF(), "src", "dst")
    assert(comps.select(countDistinct($"component")).head().getLong(0) == 1L)
    assert(comps.count() == n)
    edges.unpersist()
  }

  test("no oversized cluster: edges identical to the plain within-cluster pair join") {
    val rows = (0 until 40).map(i => ((i % 4).toLong, i.toLong, vec(i % 4, i / 4))) ++
      Seq((0L, 100L, vec(0, 0).map(_ + 1e-5))) // near-dup of vec_id 0
    val df = assigned(rows)
    val guarded = SemDedup.edges(df, "vec_id", "vec", threshold = 0.95, maxCellSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force within-cluster reference
    val a = df.select($"cluster_id", $"vec_id".as("ia"), $"vec".as("va"))
    val b = df.select($"cluster_id", $"vec_id".as("ib"), $"vec".as("vb"))
    val ref = a.join(b, "cluster_id").filter($"ia" < $"ib")
      .filter(graft.operators.VectorOps.cosine($"va", $"vb") >= 0.95)
      .select($"ia", $"ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == ref)
    assert(ref.contains((0L, 100L)))
  }

  test("diverse oversized cluster: semantic split keeps near-dups co-celled, pairs stay sub-quadratic") {
    val n = 400
    // 200 distinct directions × 2 near-identical copies, all forced into
    // one cluster id: a large but DIVERSE cell the hyperplane bits can
    // split. Every true pair (2i, 2i+1) must survive the split.
    val rows = (0 until n / 2).flatMap { g =>
      Seq((3L, (2 * g).toLong, vec(g, 0)),
        (3L, (2 * g + 1).toLong, vec(g, 0).map(_ + 1e-5)))
    }
    val edges = SemDedup.edges(assigned(rows), "vec_id", "vec",
      threshold = 0.95, maxCellSize = 50).cache()
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until n / 2).foreach { g =>
      assert(got.contains((2L * g, 2L * g + 1)),
        s"split separated the planted near-dup pair ($g)")
    }
    // soundness: every emitted edge really is ≥ threshold
    val byId = rows.map(r => r._2 -> r._3).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map(p => p._1 * p._2).sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    got.foreach { case (s, t) => assert(cos(byId(s), byId(t)) >= 0.95) }
    // boundedness: far below the quadratic count for the unsplit cell
    assert(edges.count() < n.toLong * n / 8, "split failed to bound pair generation")
    edges.unpersist()
  }

  test("guarded plan has no cartesian product") {
    val n = 300
    val hot = (0 until n).map(i => (7L, i.toLong, vec(1, i, jitter = 1e-4)))
    val plan = SemDedup.edges(assigned(hot), "vec_id", "vec",
      threshold = 0.95, maxCellSize = 50).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "guard must never plan corpus x corpus")
  }
}
