package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-blocked edit-distance similarity self-join — entity-resolution
  * for near-identical strings (misspelled provider names, OCR'd claim
  * fields; the reference's categorical pools at
  * `healthcare_data_generator.py:61-98` are exactly the kind of
  * low-cardinality vocabulary this canonicalizes).
  *
  * Semantics: over the DISTINCT values of `strCol`, emit every pair
  * (a < b lexicographically) that shares at least one whitespace token
  * and has levenshtein(a, b) <= maxDist, with the distance and each
  * value's row multiplicity (so pair weight = n_a * n_b row pairs).
  *
  * Scale shape — the two standard entity-resolution reductions:
  *  1. **Vocabulary first.** The join runs on `distinct(strCol)`, not
  *     rows: real string columns have vocabulary ≪ corpus (every
  *     repeated value collapses before any pairing); multiplicities
  *     join back at the end. The distinct + count is one hash
  *     aggregation of the input.
  *  2. **Candidate generation is a posting-list equi-join, never n².**
  *     Same pattern as [[Dedup.ngramJaccard]]: group by token, sorted
  *     posting list, explode-then-pair streams ordered (a, b)
  *     combinations list-locally; `maxTokenFreq` drops degenerate
  *     stop-tokens (a token shared by half the vocabulary generates
  *     quadratic candidates but never certifies a close pair on its
  *     own — same stop-shingle stance as the dedup operators, and the
  *     cap is observable via the distinct-pair count vs posting sizes).
  *
  * Verification (levenshtein) runs only on candidates. Blocking on a
  * shared token is a RECALL choice, not an approximation of these
  * semantics: pairs sharing no token are out of scope by definition
  * (documented contract; for guaranteed-complete lev<=k blocking you
  * need PassJoin-style segment signatures — noted as a future
  * extension).
  */
object FuzzyJoin {

  def tokenBlocked(
      df: DataFrame,
      strCol: String,
      maxDist: Int,
      maxTokenFreq: Int = 1000): DataFrame = {
    val vocab = df.groupBy(col(strCol).as("s")).agg(count(lit(1)).as("n_rows"))
    val toks = vocab.select(col("s"), explode(split(col("s"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct() // a value contributes each of its tokens once
    // Stop-token blocks are dropped entirely (not sliced), which loses
    // pairs certifiable ONLY through that token; surface how often via
    // an observed metric (same fail-observably stance as Dedup's
    // maxBucket caps) instead of filtering silently.
    val postings = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("__n"), sort_array(collect_set(col("s"))).as("vals"))
      .observe(Dedup.nextObsName("fuzzy_join"),
        sum(when(col("__n") > maxTokenFreq, 1L).otherwise(0L)).as("dropped_stop_tokens"),
        max(col("__n")).as("max_token_freq"))
      .filter(size(col("vals")).between(2, maxTokenFreq))
      .drop("__n")
    val candidates = postings
      .select(col("vals"), posexplode(col("vals")).as(Seq("i", "a")))
      .select(col("a"), explode(slice(col("vals"), col("i") + lit(2), size(col("vals")))).as("b"))
      .distinct() // two shared tokens -> one pair
      .filter(levenshtein(col("a"), col("b")) <= maxDist)
    candidates
      .join(vocab.select(col("s").as("a"), col("n_rows").as("n_a")), Seq("a"))
      .join(vocab.select(col("s").as("b"), col("n_rows").as("n_b")), Seq("b"))
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).as("dist"),
        (col("n_a") * col("n_b")).as("n_row_pairs"))
  }
}
