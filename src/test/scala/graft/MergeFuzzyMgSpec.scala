package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.operators.{FuzzyJoin, Merge}

/** Round-4 operators: MERGE upsert resolution (update/insert/delete,
  * column-subset updates, null-update semantics), token-blocked fuzzy
  * join (completeness within its blocking contract, multiplicities,
  * stop-token cap), and the Misra-Gries aggregate (candidate-superset
  * guarantee under adversarial skew + capacity overflow, exactness of
  * the candidates-then-verify pipeline, multi-partition merge path).
  */
class MergeFuzzyMgSpec extends SparkSpec {
  import spark.implicits._

  // --- Merge.upsert -------------------------------------------------

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "tag", "amount")

  test("merge: matched rows update, unmatched source rows insert, others pass through") {
    val source = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "tag", "amount")
    val got = Merge.upsert(target, source, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("merge: updateCols restricts the updated columns; a source NULL in an updatable column wins") {
    val source = Seq((2L, null.asInstanceOf[String], 99.0)).toDF("id", "tag", "amount")
    val got = Merge.upsert(target, source, Seq("id"), updateCols = Some(Seq("tag")))
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    // tag updated (to null — MERGE updates SET null), amount NOT updated
    assert(got == Seq((1L, Some("a"), 10.0), (2L, None, 20.0), (3L, Some("c"), 30.0)))
  }

  test("merge: a matched row keeps a legitimately-NULL target value in a non-updatable column") {
    // target has a NULL tag; tag is excluded from updates, so the merge
    // must NOT resurrect it from the source (resolution by matched-ness,
    // not coalesce null-ness)
    val tgt = Seq((1L, null.asInstanceOf[String], 10.0)).toDF("id", "tag", "amount")
    val source = Seq((1L, "SHOULD_NOT_WIN", 99.0)).toDF("id", "tag", "amount")
    val got = Merge.upsert(tgt, source, Seq("id"), updateCols = Some(Seq("amount")))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(got == Seq((1L, None, 99.0)))
  }

  test("merge: a NULL-evaluating deleteMatched predicate does not delete (SQL MERGE semantics)") {
    val tgt = Seq((1L, "a", 10.0)).toDF("id", "tag", "amount")
    // amount set to NULL by the update → predicate amount <= 0 is NULL → keep
    val source = Seq((1L, "a")).toDF("id", "tag")
      .withColumn("amount", lit(null).cast("double"))
    val got = Merge.upsert(tgt, source, Seq("id"),
        deleteMatched = Some(col("amount") <= 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(got == Seq((1L, "a", None)))
  }

  test("merge: source with a column subset null-fills missing columns on insert") {
    val source = Seq((4L, "d")).toDF("id", "tag")
    val got = Merge.upsert(target, source, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(got == Seq((1L, "a", Some(10.0)), (2L, "b", Some(20.0)), (3L, "c", Some(30.0)), (4L, "d", None)))
  }

  test("merge: deleteMatched removes matched rows satisfying the post-update predicate") {
    val source = Seq((2L, "b", 0.0), (3L, "c", 99.0)).toDF("id", "tag", "amount")
    val got = Merge.upsert(target, source, Seq("id"),
        deleteMatched = Some(col("amount") <= 0.0))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    // id=2 updated to amount=0 then deleted; id=3 updated; id=1 untouched
    assert(got == Seq((1L, "a", 10.0), (3L, "c", 99.0)))
  }

  // --- FuzzyJoin.tokenBlocked --------------------------------------

  test("fuzzy join: finds every shared-token pair within the distance bound, with multiplicities") {
    val df = Seq("red gear", "red gear", "rod gear", "blue gear", "red bolt", "green anvil")
      .toDF("name")
    val got = FuzzyJoin.tokenBlocked(df, "name", maxDist = 2)
      .orderBy("a", "b")
      .as[(String, String, Int, Long)].collect().toSeq
    // brute force over distinct values sharing a token:
    //  red gear~rod gear d=1 (2*1 row pairs); blue gear~rod gear d=3 ✗;
    //  blue gear~red gear d=3 ✗; red bolt~red gear d=3 ✗ — wait, "red bolt"
    //  vs "red gear": bolt→gear is 4 subs? b→g,o→e,l→a,t→r = 4 ✗
    assert(got == Seq(("red gear", "rod gear", 1, 2L)))
  }

  test("fuzzy join: equals brute force within the shared-token contract on randomized vocab") {
    val rnd = new scala.util.Random(11)
    val adjs = Seq("red", "rod", "ted", "blue", "blu", "hot")
    val nouns = Seq("gear", "bear", "gea", "bolt", "belt", "anvil")
    val vocab = for (a <- adjs; n <- nouns) yield s"$a $n"
    val rows = (0 until 400).map(_ => vocab(rnd.nextInt(vocab.size)))
    val df = rows.toDF("name")
    val got = FuzzyJoin.tokenBlocked(df, "name", maxDist = 2)
      .select("a", "b", "dist").as[(String, String, Int)].collect().toSet

    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val distinct = rows.distinct.sorted
    val want = (for {
      a <- distinct; b <- distinct if a < b
      if a.split(" ").toSet.intersect(b.split(" ").toSet).nonEmpty
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
  }

  test("fuzzy join: maxTokenFreq drops degenerate stop-token blocks") {
    // "x" is shared by every value — with the cap below the block size no
    // pairs certify through it; the pair through "unique" tokens remains
    val df = (1 to 50).map(i => s"x v$i").toDF("name")
      .union(Seq("x alpha", "x alphb").toDF("name"))
    val got = FuzzyJoin.tokenBlocked(df, "name", maxDist = 2, maxTokenFreq = 10)
      .as[(String, String, Int, Long)].collect().toSeq
    assert(got.isEmpty) // only shared token is the stop token "x"
  }

  // --- FuzzyJoin.passJoin -------------------------------------------

  private def levRef(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("passJoin: COMPLETE against brute force — no shared-token requirement") {
    // "kitten"/"sitten" share no whitespace token-prefix trickery; also a
    // no-shared-token pair tokenBlocked would miss by contract
    val df = Seq("kitten", "sitten", "sitting", "abc", "abd", "xyz").toDF("name")
    val got = FuzzyJoin.passJoin(df, "name", maxDist = 2)
      .select("a", "b", "dist").as[(String, String, Int)].collect().toSet
    val vals = Seq("kitten", "sitten", "sitting", "abc", "abd", "xyz")
    val want = (for {
      a <- vals; b <- vals if a < b
      d = levRef(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(want.contains(("abc", "abd", 1)) && want.contains(("kitten", "sitten", 1)))
  }

  test("passJoin: randomized completeness over a small alphabet incl. short and empty-adjacent strings") {
    val rnd = new scala.util.Random(17)
    def randStr(): String = {
      val n = rnd.nextInt(12) // 0..11 chars — exercises the short stratum
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for (k <- 1 to 3) {
      val rows = (0 until 250).map(_ => randStr()).filter(_.nonEmpty)
      val df = rows.toDF("name")
      val got = FuzzyJoin.passJoin(df, "name", maxDist = k)
        .select("a", "b", "dist").as[(String, String, Int)].collect().toSet
      val distinct = rows.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b
        d = levRef(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got == want,
        s"k=$k: missing=${(want -- got).take(5)} spurious=${(got -- want).take(5)}")
    }
  }

  test("passJoin: multiplicities multiply through like tokenBlocked") {
    val df = Seq("abc", "abc", "abc", "abd", "abd", "zzz").toDF("name")
    val got = FuzzyJoin.passJoin(df, "name", maxDist = 1)
      .as[(String, String, Int, Long)].collect().toSeq
    assert(got == Seq(("abc", "abd", 1, 6L)))
  }

  // --- MisraGriesAgg ------------------------------------------------

  private def mgCandidates(keys: Seq[Long], cap: Int, partitions: Int): Set[Long] = {
    GraftFunctions.register(spark)
    keys.toDF("k").repartition(partitions)
      .agg(call_function("mg_topk", col("k"), lit(cap)).as("cand"))
      .as[Seq[Long]].head().toSet
  }

  test("mg_topk: candidates are a superset of true heavy hitters under capacity overflow") {
    val rnd = new scala.util.Random(3)
    // 2000 distinct keys, two planted heavy hitters way above n/cap
    val noise = (0 until 20000).map(_ => rnd.nextInt(2000).toLong + 100L)
    val heavy = Seq.fill(4000)(7L) ++ Seq.fill(3000)(13L)
    val all = rnd.shuffle(noise ++ heavy)
    val n = all.size
    val cap = 64
    val cands = mgCandidates(all, cap, partitions = 16)
    assert(cands.size <= cap)
    val exact = all.groupBy(identity).view.mapValues(_.size).toMap
    val trueHeavy = exact.filter { case (_, c) => c > n / cap }.keySet
    assert(trueHeavy.nonEmpty && trueHeavy.subsetOf(cands),
      s"missing: ${trueHeavy -- cands}")
  }

  test("mg_topk: candidates-then-verify equals exact GROUP BY HAVING") {
    val rnd = new scala.util.Random(5)
    val keys = (0 until 30000).map(_ => (rnd.nextInt(500) * rnd.nextInt(500) % 700).toLong)
    val df = keys.toDF("k").repartition(8)
    GraftFunctions.register(spark)
    val cap = 128
    val sketch = df.agg(call_function("mg_topk", col("k"), lit(cap)).as("cand"), count(lit(1)).as("total"))
    val cands = sketch.select(explode(col("cand")).as("k"), col("total"))
    val got = df.join(broadcast(cands), Seq("k"))
      .groupBy(col("k"), col("total")).agg(count(lit(1)).as("n"))
      .filter(col("n") * cap > col("total"))
      .select(col("k"), col("n")).as[(Long, Long)].collect().toSet
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * cap > keys.size }.toSet
    assert(got == exact.map { case (k, c) => (k, c) })
  }

  test("mg_topk: distinct keys under capacity are all retained exactly") {
    val keys = (0L until 50L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val cands = mgCandidates(keys, cap = 64, partitions = 4)
    assert(cands == (0L until 50L).toSet)
  }
}
