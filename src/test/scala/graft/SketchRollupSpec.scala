package graft

import org.apache.spark.sql.functions._

/** Sketch-based distinct rollups: the bitmap pre-agg path must be
  * EXACT under any re-grouping (it's an oracle-checked query, q94, but
  * the invariant worth pinning here is rollup-associativity: daily →
  * weekly ORs give the same answer as direct weekly aggregation), and
  * the HLL path (q95) must estimate within its configured error bound
  * and merge associatively.
  */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private val rows = (0 until 20000).map { _ =>
    val day = rnd.nextInt(14) // two weeks
    (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(day)),
      "t" + rnd.nextInt(3), rnd.nextInt(3000).toLong)
  }
  private val df = rows.toDF("day", "etype", "user_id").repartition(8)

  test("bitmap rollup: daily pre-agg ORed to weekly equals direct weekly COUNT(DISTINCT)") {
    val daily = df
      .select(col("day"), col("etype"),
        expr("bitmap_bucket_number(user_id)").as("bucket"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy(col("day"), col("etype"), col("bucket"))
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
    val viaRollup = daily
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"), col("bucket"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy(col("week"), col("etype"))
      .agg(sum(expr("bitmap_count(bm)")).as("n"))
      .as[(java.sql.Date, String, Long)].collect().toSet
    val direct = df
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, String, Long)].collect().toSet
    assert(viaRollup == direct)
  }

  test("bitmap summary: incremental fold over batches equals one-shot build; rollup stays exact") {
    import graft.operators.SketchRollup
    val ev = df.select(col("day"), col("etype"), col("user_id"))
    val oneShot = SketchRollup.dailyBitmaps(ev, "user_id", Seq("day", "etype"))
    // three arbitrary (overlapping-day) deltas folded via mergeBitmaps —
    // the streaming foreachBatch maintenance path
    val parts = Seq(ev.filter(col("user_id") % 3 === 0), ev.filter(col("user_id") % 3 === 1),
      ev.filter(col("user_id") % 3 === 2))
    val incremental = parts.map(SketchRollup.dailyBitmaps(_, "user_id", Seq("day", "etype")))
      .reduce(SketchRollup.mergeBitmaps)
    val roll = (s: org.apache.spark.sql.DataFrame) =>
      SketchRollup.distinctRollup(s,
          Seq("week" -> to_date(date_trunc("week", col("day"))), "etype" -> col("etype")), "n")
        .as[(java.sql.Date, String, Long)].collect().toSet
    assert(roll(incremental) == roll(oneShot))
    val direct = df
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, String, Long)].collect().toSet
    assert(roll(incremental) == direct)
  }

  test("streaming maintenance: foreachBatch-built summary equals batch build and exact counts") {
    import graft.operators.SketchRollup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sketch_stream").toString
    val path = s"$root/summary"
    // three bounded runs over one summary table — the scheduled
    // incremental-maintenance shape (AvailableNow per run)
    rows.grouped(7000).zipWithIndex.foreach { case (b, i) =>
      val mem = MemoryStream[(java.sql.Date, String, Long)]
      mem.addData(b: _*)
      val q = SketchRollup.startSummaryStream(
        mem.toDF().toDF("day", "etype", "user_id"), path, s"$root/cp$i", "user_id",
        Seq("day", "etype"),
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    val roll = SketchRollup.distinctRollup(spark.read.parquet(path),
        Seq("week" -> to_date(date_trunc("week", col("day"))), "etype" -> col("etype")), "n")
      .as[(java.sql.Date, String, Long)].collect().toSet
    val direct = df
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, String, Long)].collect().toSet
    assert(roll == direct)
  }

  test("hll rollup: union-of-daily estimate within 5% of exact weekly distinct") {
    val daily = df.groupBy(col("day"), col("etype"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val est = daily
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[(java.sql.Date, String, Long)].collect().map { case (w, t, e) => (w, t) -> e }.toMap
    val exact = df
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"), col("etype"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, String, Long)].collect().map { case (w, t, n) => (w, t) -> n }.toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k).toDouble
      assert(math.abs(e - n) / n < 0.05, s"$k: est $e vs exact $n")
    }
  }
}
