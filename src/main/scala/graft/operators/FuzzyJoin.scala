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
  * (documented contract). For guaranteed-complete lev<=k semantics use
  * [[passJoin]] — PassJoin-style segment signatures with no stop-token
  * caveat.
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

  /** GUARANTEED-COMPLETE edit-distance self-join: every distinct-value
    * pair (a < b) with levenshtein(a, b) <= maxDist — no shared-token
    * requirement, no stop-token drops. PassJoin-style segment signatures
    * (Li/Deng/Feng, "PASS-JOIN: A Partition-based Method for Similarity
    * Joins", PVLDB'11):
    *
    *  - every string of length ℓ > k is evenly partitioned into k+1
    *    segments (k = maxDist); if lev(a, b) <= k with |a| <= |b|, the
    *    pigeonhole principle leaves at least one segment of `a`
    *    untouched by the <= k edits, and its aligned copy in `b` starts
    *    within ±k of its position in `a`;
    *  - the INDEX side emits each string's k+1 segments keyed
    *    (len, segIdx, substring); the PROBE side emits, for every
    *    candidate shorter-length ℓ ∈ [|b|−k, |b|] and segment slot, the
    *    at-most-2k+1 substrings of `b` in that shifted window. Candidates
    *    are the (len, segIdx, substring) EQUI-join of the two — a
    *    posting-list shuffle, never n²;
    *  - strings of length <= k can't fill k+1 non-empty segments; any
    *    partner is forced to length <= 2k (lev >= length gap), so the
    *    short stratum pairs within the tiny length-<=2k population
    *    directly.
    *
    * Exact levenshtein verifies candidates; completeness is
    * oracle-certified by q99 against an UNBLOCKED brute-force twin.
    * Probe fan-out is (k+1)²·(2k+1) rows per string — fine for the
    * k <= 3 regime this targets; the join runs on the distinct
    * vocabulary like [[tokenBlocked]], with multiplicities joined back.
    */
  def passJoin(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    val k = maxDist
    require(k >= 1, "passJoin: maxDist >= 1")
    val kk = k + 1
    val vocab = df.groupBy(col(strCol).as("s")).agg(count(lit(1)).as("n_rows"))
    val v = vocab.select(col("s"), length(col("s")).as("len"))

    // even partition of a length-l string into k+1 segments:
    //   q = l div (k+1), r = l mod (k+1); the LAST r segments get the
    //   extra char. 1-based starts.
    def segArith(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column)
        : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
      val q = floor(l / kk).cast("int")
      val r = l % kk
      val li = q + when(i >= lit(kk) - r, 1).otherwise(0)
      val pi = lit(1) + i * q + greatest(lit(0), i - (lit(kk) - r))
      (li, pi)
    }

    val longs = v.filter(col("len") > k)
    val index = {
      val i = col("i")
      val (li, pi) = segArith(col("l"), i)
      longs.select(col("s").as("a"), col("len").as("l"),
          explode(sequence(lit(0), lit(k))).as("i"))
        .select(col("a"), col("l"), i, col("a").substr(pi, li).as("seg"))
    }
    val probe = {
      val i = col("i")
      val (li, pi) = segArith(col("l"), i)
      longs.select(col("s").as("b"), col("len").as("lb"))
        .withColumn("l", explode(sequence(greatest(lit(kk), col("lb") - k), col("lb"))))
        .withColumn("i", explode(sequence(lit(0), lit(k))))
        .withColumn("li", li).withColumn("pi", pi)
        // window of starts the aligned copy can occupy in b; sequence()
        // would count DOWN for an empty range, so guard it first
        .withColumn("jlo", greatest(lit(1), col("pi") - k))
        .withColumn("jhi", least(col("lb") - col("li") + 1, col("pi") + k))
        .filter(col("jlo") <= col("jhi"))
        .withColumn("j", explode(sequence(col("jlo"), col("jhi"))))
        .select(col("b"), col("l"), i, col("b").substr(col("j"), col("li")).as("seg"))
    }
    val candLong = index.join(probe, Seq("l", "i", "seg"))
      .select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))

    // short stratum: len(a) <= k forces len(b) <= 2k
    val candShort = v.filter(col("len") <= k).select(col("s").as("a"))
      .crossJoin(v.filter(col("len") <= 2 * k).select(col("s").as("b")))
      .filter(col("a") =!= col("b"))

    candLong.union(candShort)
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= k)
      .join(vocab.select(col("s").as("a"), col("n_rows").as("n_a")), Seq("a"))
      .join(vocab.select(col("s").as("b"), col("n_rows").as("n_b")), Seq("b"))
      .select(col("a"), col("b"), col("dist"),
        (col("n_a") * col("n_b")).as("n_row_pairs"))
  }
}
