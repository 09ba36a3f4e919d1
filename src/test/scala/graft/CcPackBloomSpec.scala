package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, ConnectedComponents, Packing}

/** Round-3 operators: connected-components cluster resolution, greedy
  * sequence packing, bloom-pruned semi join.
  */
class CcPackBloomSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: closure over chains, cliques, and isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long chain converges (diameter > a few rounds)") {
    val n = 40
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
  }

  test("star contraction: 10k-node path converges in O(log² n) passes, not O(diameter)") {
    // min-label propagation needs ~10000 rounds here; the alternation
    // must land the full component in a logarithmic pass count
    val n = 10000
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b"))).distinct()
    val (labels, passes) = ConnectedComponents.alternatingWithRounds(und)
    assert(passes <= 25, s"star contraction took $passes passes on a ${n}-node path")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
  }

  test("auto-escalation: run() solves a path graph min-label alone cannot within its budget") {
    val n = 500 // diameter 500 ≫ escalateAfter
    val edges = (0 until n).map(i => ((i + 1000).toLong, (i + 1001).toLong)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, escalateAfter = 4).as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 1000L))
  }

  test("property: star contraction equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val nodes = 120 + trial * 40
      val edges = (0 until nodes).map { _ =>
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong)
      }.filter(e => e._1 != e._2).toDF("src", "dst")
      val byProp = ConnectedComponents.run(edges, escalateAfter = 50)
        .as[(Long, Long)].collect().toMap
      val und = edges.select(col("src").as("a"), col("dst").as("b"))
        .union(edges.select(col("dst").as("a"), col("src").as("b"))).distinct()
      val (labels, _) = ConnectedComponents.alternatingWithRounds(und)
      val byStar = labels.as[(Long, Long)].collect().toMap
      assert(byStar == byProp, s"trial $trial: star labels diverge from propagation")
    }
  }

  test("clusters: sizes and representatives") {
    val edges = Seq((5L, 9L), (9L, 7L), (30L, 31L)).toDF("src", "dst")
    val got = ConnectedComponents.clusters(edges)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((5L, 5L, 3L), (7L, 5L, 3L), (9L, 5L, 3L),
      (30L, 30L, 2L), (31L, 30L, 2L)))
  }

  test("greedy packing: fills shards first-fit, never splits, oversized doc isolated") {
    val docs = Seq(
      ("a", 1L, 400L), ("a", 2L, 500L), ("a", 3L, 200L), // 1+2 fit (900), 3 overflows
      ("a", 4L, 1500L), // oversized: own shard
      ("a", 5L, 100L), // next shard after the oversized one
      ("b", 1L, 1000L), ("b", 2L, 1L) // exact fit boundary: 1000 is NOT > budget
    ).toDF("source", "doc_id", "n_tokens")
    val got = Packing.greedyPack(docs, "source", "doc_id", "n_tokens", budget = 1000L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 400L, 0L, 0L), ("a", 2L, 500L, 0L, 400L), ("a", 3L, 200L, 1L, 0L),
      ("a", 4L, 1500L, 2L, 0L), ("a", 5L, 100L, 3L, 0L),
      ("b", 1L, 1000L, 0L, 0L), ("b", 2L, 1L, 1L, 0L)))
  }

  test("greedy packing invariants on random input: no shard over budget (except singletons), offsets contiguous") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 300).map(i => ("g" + (i % 3), i.toLong, 1L + rnd.nextInt(600).toLong))
      .toDF("source", "doc_id", "n_tokens")
    val got = Packing.greedyPack(docs, "source", "doc_id", "n_tokens", budget = 1000L)
      .as[(String, Long, Long, Long, Long)].collect()
    got.groupBy(r => (r._1, r._4)).foreach { case ((_, _), rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      assert(total <= 1000L || sorted.length == 1)
      // offsets are the running prefix sums in doc_id order
      var acc = 0L
      sorted.foreach { r => assert(r._5 == acc); acc += r._3 }
    }
    // every doc present exactly once
    assert(got.length == 300)
  }

  test("bloom-pruned semi join equals the exact semi join and actually prunes") {
    val left = spark.range(0, 2000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val right = Seq(3L, 10L, 500L, 1999L, 7777L).toDF("rk")
    val got = BloomJoin.prunedLeftSemi(left, right, "k", "rk")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 10L, 500L, 1999L))
    // the probe-side constant filter is in the plan (pruning happens
    // before the join, not inside it)
    val plan = BloomJoin.prunedLeftSemi(left, right, "k", "rk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }

  test("bloom-pruned semi join: empty build side yields empty result") {
    val left = spark.range(0, 10).select(col("id").as("k"))
    val right = Seq.empty[Long].toDF("rk")
    assert(BloomJoin.prunedLeftSemi(left, right, "k", "rk").isEmpty)
  }
}
