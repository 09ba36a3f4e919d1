package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.etl.Etl
import graft.model.Config
import graft.staging.Staging

/** Property-style tests (SURVEY §5.2): invariants of validation /
  * categorization / scoring over seeded randomized inputs (plain seeded
  * Random keeps the dependency surface at scalatest+scalacheck-cache;
  * three 50-sample rounds per property).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config.default

  test("quality score is always in [0,1] and decreases monotonically with penalties") {
    val rows = Seq(
      ("P1", "2026-08-11T00:00:00", false, false, false),
      ("P1", null, false, false, false),
      (null, null, false, false, false),
      (null, null, true, false, false),
      (null, null, true, true, false),
      (null, null, true, true, true),
      ("P1", "t", true, true, true))
      .toDF("patient_id", "timestamp", "heart_rate_anomaly", "temperature_anomaly", "amount_anomaly")
    val scores = rows.select(Etl.qualityScore.as("q")).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) == 1.0)
    assert(scores(1) < scores(0) && scores(2) < scores(1) && scores(3) < scores(2))
    assert(scores(5) == 0.0) // 0.2+0.2+0.9 clamps at 0
  }

  test("range-validate-to-NULL never emits out-of-range values (P5)") {
    val r = new Random(7)
    for (_ <- 0 until 3) {
      val hrs = Seq.fill(50)(r.nextInt(500) - 100)
      val df = hrs.zipWithIndex.map { case (hr, i) => (s"P$i", "2026-08-11T00:00:00", hr) }
        .toDF("patient_id", "timestamp", "heart_rate")
        .withColumn("blood_pressure_systolic", lit(null).cast("int"))
        .withColumn("blood_pressure_diastolic", lit(null).cast("int"))
        .withColumn("temperature", lit(null).cast("double"))
        .withColumn("oxygen_saturation", lit(null).cast("int"))
        .withColumn("respiratory_rate", lit(null).cast("int"))
        .withColumn("device_id", lit("D")).withColumn("location", lit("ICU"))
        .withColumn("processed_at", lit(java.sql.Timestamp.valueOf("2026-08-11 00:00:00")))
        .withColumn("heart_rate_category", lit("normal"))
        .withColumn("hour_of_day", lit(1)).withColumn("day_of_week", lit("Monday"))
        .withColumn("data_quality_score", lit(1.0))
        .withColumn("pipeline_version", lit("1.0.0"))
      val out = df.transform(Staging.stgPatientVitals(cfg))
        .select($"heart_rate").collect().map(row => Option(row.getAs[Integer]("heart_rate")))
      assert(out.flatten.forall(v => v >= cfg.heartRateMin && v <= cfg.heartRateMax))
      val inRange = hrs.count(h => h >= cfg.heartRateMin && h <= cfg.heartRateMax)
      assert(out.flatten.length == inRange) // nothing valid is dropped
    }
  }

  test("category buckets partition the domain: every value maps to exactly one bucket (F22)") {
    val r = new Random(11)
    for (_ <- 0 until 3) {
      val amounts = Seq.fill(60)(r.nextDouble() * 201000.0 - 1000.0)
      val out = amounts.zipWithIndex
        .map { case (a, i) => (i.toLong, a) }.toDF("id", "o_totalprice")
        .withColumn("value_category",
          when($"o_totalprice" < 1000, "low_value")
            .when($"o_totalprice" < 10000, "medium_value")
            .when($"o_totalprice" < 100000, "high_value")
            .otherwise("very_high_value"))
        .groupBy("value_category").count().collect()
      assert(out.map(_.getLong(1)).sum == amounts.length)
    }
  }

  test("minhash est_jaccard is within [0,1]") {
    val docs = (0L until 20L).map(i => (i, s"token$i shared common words here plus token${i % 3} more"))
      .toDF("doc_id", "text")
    val pairs = operators.Dedup.minHashLsh(docs, "doc_id", "text", minJaccard = 0.0)
    val est = pairs.select($"est_jaccard").collect().map(_.getDouble(0))
    assert(est.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("winnowing fingerprint count is ≥1 for any non-empty text") {
    val r = new Random(13)
    val texts = Seq.fill(20)(r.alphanumeric.take(1 + r.nextInt(40)).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = operators.TextAnalysis.fingerprintDocs(df, "doc_id")
      .select($"n_fingerprints").collect().map(_.getInt(0))
    assert(out.forall(_ >= 1))
  }

  test("as-of join: every match respects ts ordering and is the latest eligible") {
    val r = new Random(21)
    val rights = (0 until 120).map(i => ("K" + r.nextInt(6), r.nextInt(1000).toLong, i.toDouble))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // tie-free per (key, ts)
      .toDF("k", "rts", "px")
    val lefts = (0 until 80).map(i => ("K" + r.nextInt(8), r.nextInt(1100).toLong, i.toLong))
      .toDF("k", "lts", "id")
    val out = operators.AsOfJoin.asOf(lefts, rights, "k", "k", "lts", "rts", Seq("rts", "px"))
    val rMap = rights.collect().map(x => (x.getString(0), x.getLong(1))).toSet
    out.collect().foreach { row =>
      val (k, lts) = (row.getString(0), row.getLong(1))
      if (!row.isNullAt(3)) {
        val rts = row.getLong(3)
        assert(rts <= lts, s"matched ts $rts must precede left ts $lts")
        // no eligible right row strictly between the match and the left ts
        assert(!rMap.exists { case (rk, t) => rk == k && t > rts && t <= lts })
      } else {
        assert(!rMap.exists { case (rk, t) => rk == k && t <= lts },
          s"null match for ($k,$lts) but an eligible right row exists")
      }
    }
  }

  test("contamination: containment is in (0,1] and self-contamination is exactly 1") {
    val r = new Random(34)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def text() = Seq.fill(6 + r.nextInt(20))(words(r.nextInt(words.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, text()))
    // test split = exact copies of some train docs (guaranteed leak)
    val train = base.toDF("doc_id", "text")
    val test = base.take(5).map { case (id, t) => (id + 1000, t) }.toDF("doc_id", "text")
    val out = operators.Dedup.contamination(train, test, "doc_id", "text",
      minContainment = 0.01, maxDocFreq = 10000)
    val rows = out.collect()
    assert(rows.length == 5, "every copied doc must be flagged")
    rows.foreach { row =>
      val c = row.getDouble(2)
      assert(c > 0.0 && c <= 1.0)
      assert(c == 1.0, s"an exact copy must have containment 1.0, got $c")
    }
  }

  test("hash split: fractions converge and reseeding changes assignment") {
    val ids = (0 until 2000).map(_.toLong).toDF("id")
    val s1 = operators.Sampling.split(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), seed = 1)
    val n1 = s1.filter($"split" === "a").count()
    assert(math.abs(n1 - 1000) < 120, s"0.5 split of 2000 gave $n1")
    val s2 = operators.Sampling.split(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), seed = 2)
    val moved = s1.withColumnRenamed("split", "x").join(s2, "id")
      .filter($"x" =!= $"split").count()
    assert(moved > 500, "different seeds must reshuffle a large fraction")
  }

  test("skew-adversarial ngramJaccard: hot shingle at df=cap pairs, over cap drops observably") {
    // every hot doc shares exactly one shingle ("common boiler plate");
    // the per-doc unique tokens keep all other shingles singleton. Two
    // twin docs (9001/9002) share a private below-cap shingle so the
    // pipeline's final output is non-empty (an all-empty result would
    // let AQE empty-propagation skip the CollectMetrics stage).
    def corpus(n: Int) = ((0 until n)
      .map(i => (i.toLong, s"u${i}a u${i}b common boiler plate u${i}c")) ++
      Seq((9001L, "zz1 zz2 zz3"), (9002L, "zz1 zz2 zz3")))
      .toDF("doc_id", "text")
    // df exactly at the cap → the hot shingle is KEPT: all C(10,2) hot
    // pairs plus the twin pair
    val atCap = operators.Dedup.ngramJaccard(corpus(10), "doc_id", "text",
      minJaccard = 0.0, maxDocFreq = 10)
    assert(atCap.count() == 46, "df == maxDocFreq must still pair")
    // df far above the cap → hot shingle dropped: only the twin pair
    // survives (bounded — never C(40,2)), and the drop is visible
    val (rows, metrics) = collectWithMetrics(
      operators.Dedup.ngramJaccard(corpus(40), "doc_id", "text",
        minJaccard = 0.0, maxDocFreq = 10))
    assert(rows.length == 1 && rows.head.getLong(0) == 9001L,
      s"hot shingle over cap must pair nothing but the twins, got ${rows.toSeq}")
    val m = metrics.collectFirst { case (k, v) if k.startsWith("ngram_jaccard") => v }.get
    assert(m.getAs[Long]("dropped_stop_shingles") == 1L)
    assert(m.getAs[Int]("max_doc_freq") == 40)
  }

  test("skew-adversarial minHashLsh: identical-doc flood truncates buckets observably, pairs stay C(cap,2)") {
    val boiler = "the same boiler plate text repeated in every single document here"
    val flood = (0 until 30).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    val (rows, metrics) = collectWithMetrics(
      operators.Dedup.minHashLsh(flood, "doc_id", "text",
        minJaccard = 0.0, maxBucket = 8))
    // identical signatures land every doc in one bucket per band; the
    // id-sorted slice keeps the same 8 ids in each band → exactly C(8,2)
    // distinct pairs, never C(30,2) = 435
    assert(rows.length == 28, s"expected C(8,2)=28 capped pairs, got ${rows.length}")
    val m = metrics.collectFirst { case (k, v) if k.startsWith("minhash_lsh") => v }.get
    assert(m.getAs[Long]("truncated_buckets") == 8L, "all 8 bands' buckets overflow")
    assert(m.getAs[Long]("max_bucket_size") == 30L)
    // a benign corpus (one twin pair keeps the output non-empty; see the
    // AQE empty-propagation caveat on Dedup) reports zero truncation
    val benign = ((0 until 30).map(i => (i.toLong, s"doc $i talks about topic${i % 5} and item$i")) ++
      Seq((9001L, "twin pair text here"), (9002L, "twin pair text here")))
      .toDF("doc_id", "text")
    val (_, m2) = collectWithMetrics(
      operators.Dedup.minHashLsh(benign, "doc_id", "text", minJaccard = 0.0, maxBucket = 8))
    val b = m2.collectFirst { case (k, v) if k.startsWith("minhash_lsh") => v }.get
    assert(b.getAs[Long]("truncated_buckets") == 0L)
  }

  test("skew-adversarial contamination: train-side hot shingle over cap drops its evidence observably") {
    val hot = "shared leak phrase"
    // 25 hot train docs + one clean train doc (26) that genuinely leaks
    // test doc 1001 — keeps the final output non-empty so the riding
    // CollectMetrics stage is never AQE-empty-propagated away
    val train = ((0 until 25).map(i => (i.toLong, s"t${i}x t${i}y $hot t${i}z")) :+
      (26L, "unique evidence tokens here")).toDF("doc_id", "text")
    val test_ = Seq((1000L, hot), (1001L, "unique evidence tokens")).toDF("doc_id", "text")
    // cap below the hot shingle's train df → the hot evidence is
    // dropped (test 1000 unflagged, bounded); the clean leak still flags
    val (rows, metrics) = collectWithMetrics(
      operators.Dedup.contamination(train, test_, "doc_id", "text",
        minContainment = 0.01, maxDocFreq = 10))
    assert(rows.length == 1 && rows.head.getLong(0) == 1001L,
      s"over-cap shingle must drop, not explode: ${rows.toSeq}")
    val m = metrics.collectFirst { case (k, v) if k.startsWith("contamination") => v }.get
    assert(m.getAs[Long]("dropped_stop_shingles") == 1L)
    assert(m.getAs[Int]("max_train_doc_freq") == 25)
    // cap at the df → the hot leak IS flagged for test doc 1000 too
    val kept = operators.Dedup.contamination(train, test_, "doc_id", "text",
      minContainment = 0.01, maxDocFreq = 25)
    assert(kept.count() == 2, "df == cap must keep the evidence")
  }

  test("range join ≡ naive theta join over randomized intervals and widths") {
    val rnd = new Random(23)
    for (round <- 0 until 3) {
      val points = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 1000 - 100))
        .toDF("pid", "v")
      val intervals = (0 until 40).map { i =>
        val lo = rnd.nextDouble() * 1000 - 150
        (s"iv$i", lo, lo + rnd.nextDouble() * 120) // overlapping, some negative
      }.toDF("iv", "lo", "hi")
      val width = Seq(3.0, 47.0, 333.0)(round)
      val got = operators.RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", width)
        .select("pid", "iv").as[(Long, String)].collect().toSet
      val want = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
        .select("pid", "iv").as[(Long, String)].collect().toSet
      assert(got == want, s"round=$round width=$width")
    }
  }
}
