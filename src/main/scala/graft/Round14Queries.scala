package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Round-14 oracle query: FIRST-OCCURRENCE N-GRAM NOVELTY
  * ([[TextAnalysis.noveltyScore]]) under the hash gate.
  */
object Round14Queries {

  /** NOVELTY SCORING (q142): every distinct 3-shingle is owned by the
    * lowest-id document carrying it; each document reports its shingle
    * count, owned-shingle count and novelty fraction. The DuckDB twin
    * recomputes the attribution from the raw parquet with the same
    * shingle definition (distinct, lowercase, whole-text fallback for
    * <3-token docs), so rows+schema+hash certify the global
    * first-writer attribution end-to-end.
    */
  def q142Novelty(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables.t
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    TextAnalysis.noveltyScore(docs, "doc_id", "text", k = 3)
      .orderBy(col("doc_id"))
  }

  val q142Sql: String =
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
      |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
      |SELECT g.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS novel_grams,
      |  round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS novelty
      |FROM g JOIN f USING (gram)
      |GROUP BY g.doc_id
      |ORDER BY doc_id""".stripMargin
}
