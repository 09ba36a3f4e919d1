package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.Compliance
import graft.model.Config
import graft.streaming.StreamingEtl

/** Compliance queries and streaming deduplication. */
class ComplianceStreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("retention check counts rows past the 7-year horizon") {
    val fact = Seq(
      Timestamp.valueOf("2026-08-01 00:00:00"),
      Timestamp.valueOf("2018-01-01 00:00:00"))
      .toDF("measurement_timestamp")
    val r = Compliance.retentionCheck(Config.default)(fact).head()
    assert(r.getAs[Long]("total_rows") == 2)
    assert(r.getAs[Long]("rows_past_retention") == 1)
  }

  test("audit trail returns newest-first page") {
    val t = (1 to 30).map(i => (s"P$i", Timestamp.valueOf(f"2026-08-01 00:$i%02d:00")))
      .toDF("patient_id", "processed_at")
    val page = Compliance.auditTrail(t, 5).collect()
    assert(page.length == 5)
    assert(page.head.getString(0) == "P30")
  }

  test("deidentify replaces ids with stable salted hashes") {
    val df = Seq(("P1", 7), ("P1", 8), ("P2", 9)).toDF("patient_id", "v")
    val out = Compliance.deidentify(df, Seq("patient_id"), salt = "s3cret")
    val ids = out.select($"patient_id").collect().map(_.getString(0))
    assert(ids.forall(_.length == 64))
    assert(ids(0) == ids(1) && ids(0) != ids(2)) // stable pseudonym, distinct keys
    // different salt → different pseudonyms (unlinkable across deployments)
    val other = Compliance.deidentify(df, Seq("patient_id"), salt = "other")
      .select($"patient_id").head().getString(0)
    assert(other != ids(0))
  }

  test("PII redaction scrubs emails, phones, SSNs and counts hits") {
    val df = Seq(
      (1L, "reach me at jane.doe+test@hospital.org or (555) 123-4567 thanks"),
      (2L, "ssn on file 123-45-6789 and backup 987-65-4321"),
      (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.redactPiiDf(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("redacted_text") == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1L).getAs[Int]("n_emails") == 1 && out(1L).getAs[Int]("n_phones") == 1)
    assert(out(2L).getAs[String]("redacted_text") == "ssn on file <SSN> and backup <SSN>")
    assert(out(2L).getAs[Int]("n_ssns") == 2)
    assert(out(3L).getAs[String]("redacted_text") == "nothing sensitive here at all")
  }

  test("session windows merge by gap: 3 near readings = 1 session, distant = new session") {
    val df = Seq(
      ("P1", "2026-08-11T10:00:00"), ("P1", "2026-08-11T10:10:00"), ("P1", "2026-08-11T10:25:00"),
      ("P1", "2026-08-11T12:00:00"), // > 30 min gap -> new session
      ("P2", "2026-08-11T10:00:00"))
      .toDF("patient_id", "timestamp")
      .withColumn("processed_at", lit(java.sql.Timestamp.valueOf("2026-08-12 00:00:00")))
    val out = StreamingEtl.sessionStats(df).collect()
      .map(r => (r.getAs[String]("patient_id"), r.getAs[Long]("n_events"))).toList.sorted
    assert(out == List(("P1", 1L), ("P1", 3L), ("P2", 1L)))
  }

  test("streaming dedup drops redelivered messages across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val root = java.nio.file.Files.createTempDirectory("sdedup_").toString
    val parsed = mem.toDF().toDF("value").transform(graft.etl.Etl.parse())
    val q = StreamingEtl.dedupStream(parsed, Seq("claim_id"))
      .writeStream.queryName("sdedup_test")
      .option("checkpointLocation", s"$root/cp")
      .outputMode("append").format("memory").start()
    def claim(id: String, ts: String) =
      s"""{"data_type":"insurance_claim","claim_id":"$id","patient_id":"P1","total_amount":10.0,"service_date":"2026-08-01","submission_date":"2026-08-02","timestamp":"$ts"}"""
    mem.addData(claim("C1", "2026-08-11T10:00:00"), claim("C1", "2026-08-11T10:00:30"), claim("C2", "2026-08-11T10:01:00"))
    q.processAllAvailable()
    mem.addData(claim("C1", "2026-08-11T10:02:00"), claim("C3", "2026-08-11T10:03:00")) // C1 redelivered next batch
    q.processAllAvailable()
    val ids = spark.table("sdedup_test").select($"claim_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("C1", "C2", "C3"))
    q.stop()
  }
}
