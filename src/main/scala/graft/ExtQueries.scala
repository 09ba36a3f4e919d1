package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, TextAnalysis, VectorOps}

/** Training-data-pipeline operator queries (SURVEY §7.4 extensions) over
  * the driver's documents/embeddings tables. Oracle-checked where the
  * semantics are portable SQL; the LSH/sketch operators are checked by
  * ScalaTest golden/property tests instead (approximate structure isn't
  * expressible in DuckDB SQL without re-implementing the sketch).
  */
object ExtQueries {
  import Tables.t

  /** The documents/embeddings tables arrive as a single Parquet file →
    * one input partition; the compute-heavy per-row operators (hashing,
    * folds) would run on one core. An explicit repartition costs one
    * tiny shuffle (~MBs) and buys full parallelism — the same idiom a
    * 100 TB deployment gets from many input files.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  /** MinHash-LSH near-duplicate candidate pairs over documents. */
  def q18MinHashDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(spread(spark, t(spark, dir, "documents")), "doc_id", "text",
      numHashes = 32, bands = 8, minJaccard = 0.3)
      .orderBy("id_a", "id_b")

  /** SimHash near-duplicate candidate pairs (Hamming ≤ 3 of 64 bits). */
  def q19SimHashDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashDedup(spread(spark, t(spark, dir, "documents")), "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Exact n-gram Jaccard pairs (inverted-index verification stage). */
  def q20NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(spread(spark, t(spark, dir, "documents")), "doc_id", "text",
      k = 3, minJaccard = 0.2, maxDocFreq = 200)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("id_a", "id_b")

  /** DuckDB twin of q20: shingling via list comprehension, inverted-index
    * co-count, exact Jaccard — filter on the unrounded value (like the
    * operator), round for output parity.
    */
  val q20Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] END) AS shingles
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
      |df AS (SELECT shingle FROM ex GROUP BY shingle HAVING count(*) <= 200),
      |fex AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN df USING (shingle)),
      |co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |       FROM fex a JOIN fex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |j AS (SELECT co.id_a, co.id_b,
      |        CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) AS jac
      |      FROM co JOIN sizes sa ON sa.doc_id = co.id_a JOIN sizes sb ON sb.doc_id = co.id_b)
      |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.2 ORDER BY id_a, id_b""".stripMargin

  /** Embedding-cosine near-duplicate pairs via hyperplane LSH.
    * The driver's embeddings are near-random (max pairwise cosine ≈0.51,
    * so a true near-dup set is empty); we plant 20 deterministic
    * near-duplicates (vec_id+100000, each component nudged by +0.01) so
    * the operator's recall is observable: it must recover exactly those
    * planted pairs at θ=0.95.
    */
  def q21EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val base = spread(spark, t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.01)).as("vec"))
    VectorOps.embeddingNearDup(base.unionByName(planted), "vec_id", "vec", threshold = 0.95)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("id_a", "id_b")
  }

  /** Heuristic language ID vs the labeled lang column. */
  def q22LangId(spark: SparkSession, dir: String): DataFrame =
    spread(spark, t(spark, dir, "documents"))
      .withColumn("lid", TextAnalysis.langId(col("text")))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("lid.predicted_lang").as("predicted_lang"),
        round(col("lid.confidence"), 6).as("confidence"))
      .orderBy("doc_id")

  /** Winnowing fingerprints per document. */
  def q23Fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprintDocs(spread(spark, t(spark, dir, "documents")), "doc_id")
      .select(col("doc_id"), col("n_fingerprints"), col("content_id"))
      .orderBy("doc_id")

  /** Token counting (whitespace + regex + BPE estimate) — oracle-checked:
    * the regex dialect subset used is identical in Java regex and RE2.
    */
  def q24TokenCounts(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(spark, dir, "documents"))
      .select(col("doc_id"), col("ws_tokens"), col("regex_tokens"), col("bpe_est_tokens"))
      .orderBy("doc_id")

  val q24Sql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS regex_tokens,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Approximate ANN (hyperplane LSH buckets + exact re-rank) — same
    * query set as the brute-force baseline q17 so recall is measurable.
    */
  def q25AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    VectorOps.cosineLshTopK(
      em.filter(col("vec_id") >= 5).withColumnRenamed("vec_id", "id").withColumnRenamed("v", "vec"),
      em.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "qvec"),
      k = 10)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("qid", "rn")
  }

  /** IVF approximate ANN — same query set as the q17 brute-force
    * baseline; probes 4 of 16 clusters (inverted-file scale path).
    */
  def q28AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val em = spread(spark, t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.IvfIndex.cosineTopK(spark,
      em.filter(col("vec_id") >= 5).withColumnRenamed("vec_id", "id").withColumnRenamed("v", "vec"),
      em.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "qvec"),
      k = 10, nClusters = 16, nprobe = 4)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("qid", "rn")
  }

  /** Multimodal feature extraction over a deterministic synthetic media
    * corpus (decode stubbed — see Multimodal scaladoc; Spark-side schema,
    * batching and metadata flow are real).
    */
  def q26MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticCorpus(spark, 2000))
    feats.toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"), col("payload_hash"),
        round(expr("aggregate(feature, 0D, (a, x) -> a + x)"), 4).as("feature_sum"))
      .orderBy("media_id")
  }

  /** PII redaction over documents with planted identifiers (the driver's
    * docs contain no PII, so each doc gets a deterministic synthetic
    * email/phone/SSN suffix keyed by doc_id; the operator must scrub all
    * of them). Oracle-checked — patterns are in the Java∩RE2 regex
    * subset.
    */
  def q32PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = t(spark, dir, "documents")
      .withColumn("text",
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 555-123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
    TextAnalysis.redactPiiDf(planted)
      .select(col("doc_id"),
        substring(col("redacted_text"), -60, 60).as("redacted_tail"),
        col("n_emails"), col("n_phones"), col("n_ssns"))
      .orderBy("doc_id")
  }

  val q32Sql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.com or 555-123-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |      ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
      |      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS redacted_text,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |    CAST(len(regexp_extract_all(text, '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_phones,
      |    CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT) AS n_ssns
      |  FROM planted)
      |SELECT doc_id, substring(redacted_text, -60) AS redacted_tail,
      |  n_emails, n_phones, n_ssns
      |FROM r ORDER BY doc_id""".stripMargin

  /** Text quality features composite (language-model corpus filter). */
  def q27TextQualityFeatures(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(spread(spark, t(spark, dir, "documents")))
      .select(col("doc_id"), col("n_words"),
        round(col("avg_word_len"), 6).as("avg_word_len"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(col("stopword_ratio"), 6).as("stopword_ratio"),
        round(col("dup_word_ratio"), 6).as("dup_word_ratio"),
        col("quality_score"))
      .orderBy("doc_id")
}
