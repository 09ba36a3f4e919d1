package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TextAnalysis}

/** Round-15 oracle query: NOVELTY-WEIGHTED CURATION — the
  * dedup-aware-sampling flow [[TextAnalysis.noveltyScore]] (q142) was
  * built for, composed end-to-end with two already-hash-certified
  * stages so their INTERACTION is oracle-certified too.
  */
object Round15Queries {

  /** NOVELTY-WEIGHTED SELECTION (q143), the D4-style curation chain:
    *   1. score every document's first-occurrence 3-gram novelty
    *      ([[TextAnalysis.noveltyScore]], q142-certified);
    *   2. novelty floor ≥ 0.3 (boilerplate-dominated docs drop), then
    *      IMPORTANCE-SAMPLE survivors with keep-probability = novelty
    *      ([[Sampling.weightedSample]], portable integer-exact draw —
    *      near-duplicate content downweights instead of only the
    *      cluster loser vanishing);
    *   3. per-language token-budget mixture over what is left
    *      ([[Sampling.tokenBudgetMixture]], q103-certified).
    *
    * Scale shape: novelty is two map-side-combining aggregates + one
    * doc-keyed join (no gram-keyed join — see noveltyScore); the
    * sample is a per-row hash draw (zero shuffle, no RNG state); the
    * mixture window shuffles once on the language key with
    * WindowGroupLimit-sized partitions. Reference analogue: the
    * quality-gated curation the reference DAG runs
    * (healthcare_data_pipeline_dag.py:152-202), upgraded to
    * novelty-aware selection.
    */
  def q143NoveltyCurate(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables.t
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
    val nov = TextAnalysis
      .noveltyScore(docs.select(col("doc_id"), col("text")), "doc_id", "text", k = 3)
      .select(col("doc_id"), col("novelty"))
    val kept = Sampling.weightedSample(
      nov.filter(col("novelty") >= 0.3), "doc_id", col("novelty"),
      seed = 11, portable = true)
    val wide = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .join(kept.select("doc_id"), Seq("doc_id"))
    Sampling.tokenBudgetMixture(wide, "doc_id", "lang", "n_tokens",
        Seq("en" -> 2000L, "de" -> 1000L, "es" -> 1000L, "fr" -> 800L, "zh" -> 600L))
      .join(kept.select(col("doc_id"), col("novelty")), Seq("doc_id"))
      .orderBy("doc_id")
  }

  val q143Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) >= 3
      |      THEN list_distinct(list_transform(range(1, len(w) - 1),
      |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |      ELSE [array_to_string(w, ' ')] END AS grams
      |  FROM toks),
      |g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
      |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
      |nov AS (SELECT g.doc_id,
      |    round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*), 4) AS novelty
      |  FROM g JOIN f USING (gram) GROUP BY g.doc_id),
      |keep AS (SELECT doc_id, novelty FROM nov
      |  WHERE novelty >= 0.3
      |    AND ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 15))::BIGINT
      |      < CAST(floor(novelty * 1152921504606846976.0) AS BIGINT)),
      |b(lang, budget) AS (VALUES ('en', 2000), ('de', 1000), ('es', 1000), ('fr', 800), ('zh', 600)),
      |d AS (SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |c AS (SELECT d.doc_id, d.lang, d.n_tokens, b.budget, keep.novelty,
      |    CAST(COALESCE(SUM(d.n_tokens) OVER (PARTITION BY d.lang ORDER BY d.h, d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
      |  FROM d JOIN keep USING (doc_id) JOIN b USING (lang))
      |SELECT doc_id, lang, n_tokens, tokens_before, novelty
      |FROM c WHERE tokens_before < budget ORDER BY doc_id""".stripMargin
}
