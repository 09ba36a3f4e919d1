package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All native
  * column expressions — per-row, shuffle-free, codegen-friendly — so they
  * cost one scan regardless of corpus size.
  */
object TextAnalysis {

  /** Marker-token sets for the n-gram/stopword language heuristic. */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"),
    "zh" -> Seq.empty // handled by charset below
  )

  /** Heuristic language identification: CJK charset ratio short-circuits
    * to zh; otherwise the language with the highest marker-token hit rate
    * wins (ties broken alphabetically for determinism). Returns a struct
    * (predicted_lang, confidence).
    */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val nToks = greatest(size(toks), lit(1)).cast("double")
    def score(lang: String): Column =
      if (markers(lang).isEmpty) lit(0.0)
      else size(filter(toks, t => t.isin(markers(lang).map(lit(_)): _*))).cast("double") / nToks
    val cjkRatio =
      (length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    val scored = markers.keys.toSeq.sorted.filter(markers(_).nonEmpty)
      .map(l => struct(score(l).as("s"), lit(l).as("l")))
    val best = greatest(scored: _*)
    when(cjkRatio > 0.2, struct(lit("zh").as("predicted_lang"), cjkRatio.as("confidence")))
      .otherwise(struct(best.getField("l").as("predicted_lang"), best.getField("s").as("confidence")))
  }

  /** Quality-scoring features (length / punctuation / stopword / word
    * stats) plus a composite [0,1] score with fixed weights — the
    * text-pipeline analogue of the reference's data_quality_score fold
    * (`healthcare_etl_pipeline.py:143-159`).
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val words = split(text, "\\s+")
    df
      .withColumn("n_chars_calc", length(text))
      .withColumn("n_words", size(words))
      .withColumn("avg_word_len", length(text).cast("double") / greatest(size(words), lit(1)))
      .withColumn("punct_ratio",
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          greatest(length(text), lit(1)))
      .withColumn("stopword_ratio",
        size(filter(words, w => w.isin(markers("en").map(lit(_)): _*))).cast("double") /
          greatest(size(words), lit(1)))
      .withColumn("dup_word_ratio",
        lit(1.0) - size(array_distinct(words)).cast("double") / greatest(size(words), lit(1)))
      .withColumn("quality_score",
        greatest(lit(0.0), least(lit(1.0),
          lit(1.0)
            - when(col("n_words") < 8, 0.4).otherwise(0.0)
            - when(col("punct_ratio") > 0.3, 0.3).otherwise(0.0)
            - when(col("dup_word_ratio") > 0.7, 0.3).otherwise(0.0)
            - when(col("avg_word_len") < 2.0 || col("avg_word_len") > 12.0, 0.2).otherwise(0.0))))
  }

  /** Token counting: whitespace tokens plus a BPE-ish sub-word estimate
    * (regex word/digit/punct pieces, then ~4 chars per BPE token).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    df
      .withColumn("ws_tokens", size(split(text, "\\s+")))
      .withColumn("regex_tokens", regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")))
      .withColumn("bpe_est_tokens", ceil(length(text).cast("double") / 4.0).cast("long"))
  }

  /** PII redaction for training-data curation (and the healthcare PHI
    * "minimum necessary" rule): regex-based scrubbing of emails, phone
    * numbers, and SSN-shaped identifiers, replaced with typed tokens.
    * Patterns stay within the regex subset shared by Java regex and RE2
    * so the operator is oracle-checkable. Complement of
    * [[graft.analytics.Compliance.deidentify]] (which pseudonymizes
    * structured keys; this scrubs free text).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))

  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, token)) =>
      regexp_replace(c, pat, token)
    }

  /** Redaction report: scrubbed text + per-category hit counts. */
  def redactPiiDf(df: DataFrame, textCol: String = "text"): DataFrame =
    df
      .withColumn("redacted_text", redactPii(col(textCol)))
      .withColumn("n_emails", regexp_count(col(textCol), lit(piiPatterns(0)._1)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(piiPatterns(1)._1)))
      .withColumn("n_ssns", regexp_count(col(textCol), lit(piiPatterns(2)._1)))

  /** Winnowing document fingerprint: rolling hash over character
    * k-grams, minimum per sliding window of w hashes, distinct mins kept.
    * Two docs sharing content share fingerprints — the standard
    * plagiarism/near-dup sketch (Schleimer et al., SIGMOD'03).
    *
    * Hash choice: default is xxhash64 (codegen'd 64-bit arithmetic — the
    * 100 TB path). `portable = true` hashes each gram as the first
    * 15 md5 hex chars parsed to a 60-bit long in one conv() — identical
    * in every engine that has md5 (DuckDB: ('0x'||prefix)::BIGINT),
    * which makes the whole fingerprint DuckDB-oracle-checkable (q23).
    * Both variants return array<long>, so the window mins, distinct and
    * downstream digest are numeric either way (the former hex-STRING
    * portable mins paid UTF8String comparisons through every least() —
    * measured ~25% of the whole q23). Still ~3× the per-gram cost of
    * xxhash64; fine for certification runs, switch off at scale.
    */
  def winnowingFingerprint(text: Column, k: Int = 8, w: Int = 4,
      portable: Boolean = false): Column = {
    val hash: Column => Column =
      if (portable) g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")
      else g => xxhash64(g)
    val grams = transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => hash(text.substr(i, lit(k))))
    // Shifted-zip formulation: window j's min = least(g[j], …, g[j+w-1]),
    // computed by zipping w shifted copies of the gram array. The grams
    // subtree is evaluated w+1 times total (once per slice) — O(n·w) per
    // row. Two naive formulations measured and rejected:
    // transform+slice-per-position re-evaluates grams per window (O(n²)
    // hashes); an aggregate fold appending to an accumulator array copies
    // the accumulator per element (O(n²) copies).
    // m derives from length(text), NOT size(grams) — referencing grams
    // here would re-evaluate the whole gram subtree per slice argument.
    val m = greatest(greatest(length(text) - (k - 1), lit(1)) - (w - 1), lit(1))
    val shifted = (0 until w).map(j => slice(grams, lit(j + 1), m).as(s"g$j"))
    val zipped = arrays_zip(shifted: _*)
    // arrays_zip pads shorter slices with null; least() ignores nulls, so
    // texts with fewer than w grams degrade to the min of what exists.
    val windowMins = transform(zipped, s =>
      least((0 until w).map(j => s.getField(s"g$j")): _*))
    array_distinct(windowMins)
  }

  /** Fingerprint summary per document: count + a stable content id
    * (xxhash64 of the fingerprint set).
    *
    * Staged, unlike the one-shot [[winnowingFingerprint]] column: the
    * gram-hash array lands in its own projection, and the w slices of
    * the winnow stage read the materialized COLUMN. Inline, each slice
    * re-evaluates the whole gram subtree (HOFs are interpreted — no
    * codegen CSE), multiplying the per-gram hash cost by w+1; Catalyst's
    * CollapseProject keeps the stages apart because the gram transform
    * is non-cheap and consumed w times. Measured: portable q23
    * 1.59 → 0.81 s at sf0.1 (prod xxhash path 0.47 → 0.31 s).
    */
  def fingerprintDocs(df: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 8, w: Int = 4, portable: Boolean = false): DataFrame = {
    val hash: Column => Column =
      if (portable) g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")
      else g => xxhash64(g)
    val grams = transform(
      sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
      i => hash(col(textCol).substr(i, lit(k))))
    val staged = df.select(col(idCol), length(col(textCol)).as("__len"),
      grams.as("__grams"))
    // winnow over the materialized gram column (see winnowingFingerprint
    // for the shifted-zip design notes; __len stands in for length(text))
    val m = greatest(greatest(col("__len") - (k - 1), lit(1)) - (w - 1), lit(1))
    val shifted = (0 until w).map(j => slice(col("__grams"), lit(j + 1), m).as(s"g$j"))
    val windowMins = transform(arrays_zip(shifted: _*), s =>
      least((0 until w).map(j => s.getField(s"g$j")): _*))
    // content_id summarizes the fingerprint SET (sorted first — the
    // distinct-mins order is positional, not canonical); the portable
    // variant composes only engine-portable pieces (numeric sort, then
    // decimal rendering — Long.toString ≡ DuckDB CAST(BIGINT AS VARCHAR)
    // — join, md5).
    val contentId =
      if (portable)
        md5(array_join(array_sort(col("fingerprints")).cast("array<string>"), ","))
      else xxhash64(to_json(struct(col("fingerprints"))))
    staged.select(col(idCol), array_distinct(windowMins).as("fingerprints"))
      .select(col(idCol),
        size(col("fingerprints")).as("n_fingerprints"),
        contentId.as("content_id"),
        col("fingerprints"))
  }

  /** Corpus document-frequency table — the IDF builder and boilerplate
    * detector in one: for every term, the number of documents containing
    * it and `idf = ln(N / df)`. Terms with df near N are boilerplate
    * (stopwords, template text — candidates for scrubbing); rare terms
    * get high retrieval weight. Two shuffles at any corpus size: one
    * distinct on (doc, term) — the per-doc dedup — and one count by
    * term. N rides along as a broadcast scalar (one-row cross join), so
    * no driver-side constant capture that would pin the plan to a
    * collected value.
    *
    * idf is rounded to 6dp AT THE SOURCE: downstream products must
    * compose from the rounded value so cross-engine libm `ln`
    * last-ulp differences can never propagate into rankings.
    */
  def docFrequency(df: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val n = df.select(count(lit(1)).as("__n"))
    df.select(col(idCol), explode(array_distinct(split(lower(col(textCol)), " "))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("doc_freq"),
        round(log(col("__n").cast("double") / col("doc_freq")), 6).as("idf"))
  }

  /** TF-IDF top terms per document — the classic sparse retrieval
    * representation, kept top-k to bound output width. tf is the raw
    * in-doc term count; the score is `tf · idf` with idf pre-rounded by
    * [[docFrequency]] and the product rounded again, so rank order is
    * engine-stable (two mathematically equal scores computed via
    * different factorizations — e.g. 2·ln(20) vs ln(400) — land on the
    * same rounded value and fall through to the term tie-break).
    * Shape: the tf aggregation shuffles on (doc, term); the idf join
    * broadcasts (vocabulary ≪ corpus); top-k is a WindowGroupLimit,
    * not a full sort.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 3): DataFrame = {
    val tf = df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val idf = docFrequency(df, idCol, textCol)
    tf.join(broadcast(idf.select(col("term"), col("idf"))), Seq("term"))
      .withColumn("tfidf", round(col("tf") * col("idf"), 6))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rn") <= k)
      .select(col(idCol), col("rn"), col("term"), col("tf"), col("tfidf"))
  }

  /** N-gram language-model quality score — the CCNet-style perplexity
    * filter of training-data pipelines: score each document by its
    * average per-token log-probability under an add-1-smoothed bigram
    * model TRAINED ON THE CORPUS ITSELF (documents far below the
    * corpus-average logprob are gibberish/OCR noise; far above are
    * degenerate repetition — both standard drop candidates).
    *
    * Model: first token scored by the unigram `ln((c(w)+1)/(N+V))`,
    * subsequent tokens by the bigram `ln((c(prev,w)+1)/(c(prev)+V))`.
    *
    * Cross-engine determinism: per-token logprobs round to integer
    * MICRO-units at the source (`round(ln·1e6)` — the [[docFrequency]]
    * idf stance against libm ulp drift, in integer form), the per-doc
    * sum is exact BIGINT, and the average is an integer half-up
    * division — NO double rounding of a quotient anywhere. (The first
    * formulation rounded the decimal-summed average with `round(,6)`
    * and a real document at sf0.1 landed the quotient on an exact 6dp
    * tie, where Java's exact-binary HALF_UP and C's multiply-then-round
    * disagree — integer division has no such boundary.) The reported
    * double is `avg_micro / 1e6`, the same IEEE division everywhere.
    *
    * Shape at scale: one token explode feeds the unigram count (shuffle
    * on token), the bigram count (shuffle on the pair), and the scoring
    * stream; scoring joins shuffle on the same token/pair keys; the
    * (N, V) scalars ride along as a one-row broadcast. Nothing is
    * quadratic and no vocabulary table ever sits on the driver.
    */
  def ngramLogprob(df: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
    val stream = toks
      .select(col(idCol), posexplode(col("toks")).as(Seq("p0", "w")),
        col("toks"))
      // posexplode is 0-based; element_at is 1-based → toks[p0] is the
      // PREVIOUS token of the current one, defined for p0 >= 1
      .select(col(idCol), (col("p0") + 1).as("i"), col("w"),
        when(col("p0") >= 1, element_at(col("toks"), col("p0"))).as("prev"))
    val uni = stream.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val scalars = uni.agg(sum(col("cu")).as("n_corpus"), count(lit(1)).as("v_size"))
    val bi = stream.filter(col("prev").isNotNull)
      .groupBy(col("prev").as("b1"), col("w").as("b2"))
      .agg(count(lit(1)).as("cb"))

    val scored = stream
      .join(uni.select(col("w"), col("cu").as("cu_w")), Seq("w"))
      .join(uni.select(col("w").as("prev"), col("cu").as("cu_prev")), Seq("prev"), "left")
      .join(bi, col("prev") === col("b1") && col("w") === col("b2"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("lp_micro", round(
        when(col("i") === 1,
          log((col("cu_w") + 1).cast("double") / (col("n_corpus") + col("v_size"))))
          .otherwise(
            log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
              (col("cu_prev") + col("v_size")))) * lit(1e6), 0).cast("long"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), sum(col("lp_micro")).as("s"))
      // integer half-up division, sign-aware (logprobs are ≤ 0 but a
      // one-token-vocabulary corpus can hit 0): HALF_UP(|s|/n) on the
      // magnitude, sign restored
      .withColumn("avg_micro",
        when(col("s") >= 0, expr("(s * 2 + n) DIV (2 * n)"))
          .otherwise(-expr("((-s) * 2 + n) DIV (2 * n)")))
      .select(col(idCol), col("n").as("n_tokens"),
        (col("avg_micro").cast("double") / 1e6).as("avg_logprob"))
  }

  /** BM25 ranked retrieval: top-k documents per query under the
    * Robertson/Lucene scoring
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` with
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))` — the keyword-search
    * counterpart of [[tfIdfTopTerms]], and the retrieval stage a
    * training-data pipeline uses for corpus exploration and
    * RAG-candidate generation.
    *
    * Cross-engine determinism (the [[ngramLogprob]] stance): idf rounds
    * to integer micro-units at the source (one `ln` per TERM, never per
    * posting), each per-term contribution rounds to micro-units before
    * the per-(query, doc) sum, so the sum is exact BIGINT and ranking
    * ties break on doc id. `avgdl` is an exact BIGINT-sum ÷ BIGINT-count
    * double division — the same IEEE op in any engine.
    *
    * Shape at scale: one token explode feeds the tf aggregation (shuffle
    * on (doc, term)) and the df count (shuffle on term); the query-term
    * list and the (N, avgdl) scalars broadcast; the idf side of the
    * scoring join broadcasts because only QUERY terms survive it
    * (|queries|·|terms| rows, corpus-independent). The per-(query, doc)
    * sum shuffles on the pair; top-k is a WindowGroupLimit, not a full
    * sort. Nothing driver-side, nothing quadratic in the corpus.
    *
    * @param queries (qid, terms: array<string>) — the query workload;
    *                must be small enough to broadcast.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = bm25Tokens(df, idCol, textCol)
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = bm25Postings(toks, idCol)
    bm25Rank(tf, tf.groupBy(col("term")).agg(count(lit(1)).as("df")),
      stats, queries, idCol, k, k1, b)
  }

  /** (id, toks, dl) token frame — the shared tokenization of the BM25
    * family (from-text scoring and [[TermIndex]] maintenance). */
  private[operators] def bm25Tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("dl"))

  /** (id, term, tf, dl) postings from a [[bm25Tokens]] frame. */
  private[operators] def bm25Postings(toks: DataFrame, idCol: String): DataFrame =
    toks.select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** The BM25 scoring + ranking core over PRE-COMPUTED postings and
    * corpus statistics — shared by [[bm25TopK]] (which derives them from
    * text) and [[TermIndex.bm25]] (which reads them from the maintained
    * index), so both paths produce bit-identical rankings by
    * construction.
    *
    * @param tf (idCol, term, tf, dl) postings
    * @param dfCounts (term, df) document frequencies
    * @param stats one row (n_docs, avgdl)
    */
  private[operators] def bm25Rank(tf: DataFrame, dfCounts: DataFrame, stats: DataFrame,
      queries: DataFrame, idCol: String, k: Int, k1: Double, b: Double): DataFrame = {
    val qterms = queries.select(col("qid"), explode(col("terms")).as("term"))
    // df is computed over the FULL corpus, then restricted to the query
    // vocabulary (semi-restricting first would undercount df); the
    // surviving idf side is |qterms| rows — corpus-independent, broadcast
    val idf = dfCounts
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("term"),
        round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * lit(1e6), 0)
          .cast("long").as("idf_micro"))
    tf.join(broadcast(qterms), Seq("term"))
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .withColumn("c_micro", round(
        (col("idf_micro").cast("double") / lit(1e6)) *
          ((col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))) * lit(1e6), 0)
        .cast("long"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("c_micro")).as("score_micro"), count(lit(1)).as("n_terms"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("score_micro").desc, col(idCol).asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col(idCol), col("rn"), col("n_terms"), col("score_micro"))
  }

  /** Per-group ADAPTIVE quality threshold (the RefinedWeb/DataComp
    * per-domain calibration step): instead of one global cutoff, each
    * group (source, language, domain) keeps its rows above its OWN
    * `p`-quantile of `scoreCol` — a noisy web domain and a clean
    * reference domain each lose their own worst tail, rather than the
    * global cutoff wiping out the noisy domain entirely.
    *
    * The threshold is the exact interpolated quantile (identical
    * `rank = p·(n−1)` semantics to DuckDB's `quantile_cont`), rounded
    * to 6dp so the boundary compare is engine-stable. One aggregation
    * shuffle on the group key; thresholds broadcast back (|groups| rows,
    * corpus-independent).
    */
  def adaptiveQualityFilter(df: DataFrame, groupCol: String, scoreCol: String,
      p: Double = 0.25): DataFrame = {
    val thr = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($scoreCol, $p)"), 6).as("threshold"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("threshold"))
  }

  /** REPETITION-based quality filtering (the Gopher/MassiveText rules,
    * Rae et al. 2021 §A1.1, adapted to word n-grams): documents whose
    * content is dominated by repeated words, one hot bigram, or repeated
    * trigrams are generator loops / boilerplate / SEO spam and poison a
    * pretraining mix even after near-dup removal (repetition is WITHIN a
    * document, so no pairwise dedup sees it).
    *
    * Emits per document:
    *   - `n_words`
    *   - `dup_word_frac`     = 1 − distinct/total words
    *   - `top_bigram_frac`   = occurrences of the most frequent bigram /
    *                           total bigrams
    *   - `dup_trigram_frac`  = fraction of trigram slots that repeat an
    *                           earlier trigram
    *   - `keep`              = all three under their thresholds
    *
    * Everything is computed PER ROW with higher-order functions — n-gram
    * arrays, `array_distinct` counts, and the max-multiplicity fold over
    * the SORTED bigram array (equal values are adjacent after sort, so
    * one linear pass tracking the current run finds the max count). Zero
    * shuffles, zero explodes: at 100 TB this is a narrow map inside the
    * scan's codegen stage, unlike the explode→groupBy(doc, gram) shape
    * whose shuffle is ~`n_words` rows per document. Counts are integers
    * and fractions are 6dp-rounded ratios of integers — engine-exact.
    */
  /** Corpus text NORMALIZATION — the canonicalization pass that runs
    * before any hashing/dedup/tokenization at 100 TB: Unicode NFC
    * (composed and decomposed spellings of the same character must
    * compare equal — [[graft.expressions.NfcNormalize]], a codegen'd
    * native expression with an ASCII fast path), control characters
    * (C0 + DEL) replaced by spaces, whitespace runs collapsed, ends
    * trimmed. Per-row, zero shuffles, whole-stage codegen throughout.
    *
    * ASCII-range `\s` only (both engines' default regex semantics);
    * exotic Unicode spaces pass through — normalize those upstream if a
    * corpus needs it.
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), col(textCol))
      .withColumn("norm_text", trim(regexp_replace(regexp_replace(
        call_function("nfc_normalize", col(textCol)),
        "[\\x00-\\x1f\\x7f]", " "), "\\s+", " ")))
      .withColumn("changed", col("norm_text") =!= col(textCol))
      .withColumn("n_chars", length(col("norm_text")).cast("long"))
      .select(col(idCol), col("norm_text"), col("changed"), col("n_chars"))
  }

  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String = "text",
      maxDupWord: Double = 0.55, maxTopBigram: Double = 0.07,
      maxDupTrigram: Double = 0.05): DataFrame = {
    val grams = (k: Int) =>
      s"CASE WHEN size(w) >= $k THEN transform(sequence(0, size(w)-$k), " +
        s"i -> concat_ws(' ', slice(w, i+1, $k))) ELSE array() END"
    df.select(col(idCol), col(textCol))
      .withColumn("w", expr(s"filter(split(lower($textCol), ' '), x -> x != '')"))
      .withColumn("big", expr(grams(2)))
      .withColumn("tri", expr(grams(3)))
      .withColumn("n_words", size(col("w")).cast("long"))
      // max bigram multiplicity: fold over the sorted array — duplicates
      // are adjacent, so (prev, run, best) in one pass
      .withColumn("top_big", expr(
        """aggregate(array_sort(big), named_struct('prev', '', 'run', 0L, 'best', 0L),
          |  (s, x) -> named_struct(
          |    'prev', x,
          |    'run',  IF(x = s.prev, s.run + 1L, 1L),
          |    'best', greatest(s.best, IF(x = s.prev, s.run + 1L, 1L))),
          |  s -> s.best)""".stripMargin))
      .withColumn("dup_word_frac", when(col("n_words") > 0,
        round((col("n_words") - size(expr("array_distinct(w)"))) / col("n_words"), 6))
        .otherwise(lit(0.0)))
      .withColumn("top_bigram_frac", when(size(col("big")) > 0,
        round(col("top_big") / size(col("big")), 6)).otherwise(lit(0.0)))
      .withColumn("dup_trigram_frac", when(size(col("tri")) > 0,
        round((size(col("tri")) - size(expr("array_distinct(tri)"))) / size(col("tri")), 6))
        .otherwise(lit(0.0)))
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWord &&
        col("top_bigram_frac") <= maxTopBigram &&
        col("dup_trigram_frac") <= maxDupTrigram)
      .select(col(idCol), col("n_words"), col("dup_word_frac"),
        col("top_bigram_frac"), col("dup_trigram_frac"), col("keep"))
  }

  /** FIRST-OCCURRENCE N-GRAM NOVELTY — the curation metric behind
    * novelty-aware sampling ("how much of this document's content is
    * new to the corpus"): each distinct word k-shingle is OWNED by the
    * lowest-id document carrying it; a document's novelty is the
    * fraction of its shingles it owns. Complements the pairwise
    * containment sweep ([[Dedup.containment]]) — novelty is a GLOBAL
    * first-writer attribution, not a pair relation, so boilerplate
    * shared by hundreds of docs is charged to exactly one of them.
    *
    * Scale shape — NO gram-keyed join anywhere. Because
    * [[Dedup.shingles]] is distinct per doc and the owner is unique per
    * gram, `novel_grams(doc) = |{grams owned by doc}|` falls out of the
    * owner table alone: one map-side-combining `min` per gram (the only
    * gram-keyed exchange, and it sits under a partial aggregate — a
    * mega-hot boilerplate gram contributes at most one row per map
    * partition to its reducer), then a doc-keyed count of owned grams.
    * `n_grams(doc) = size(shingles)` is a per-row expression with zero
    * shuffle. The two per-doc frames (one row per doc each) meet in a
    * single doc-keyed left join with `coalesce(novel, 0)`. The corpus
    * is never re-shuffled on the Zipf-skewed gram key, and the
    * explode+scan subtree is evaluated once.
    *
    * Ref semantics: dataset-curation novelty scoring (the D4 /
    * dedup-aware-sampling family, public); same shingle definition as
    * [[Dedup.shingles]] (short texts collapse to one whole-text gram).
    */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 3): DataFrame = {
    val perDoc = df.select(col(idCol),
      size(Dedup.shingles(col(textCol), k)).cast("long").as("n_grams"))
    val owned = df
      .select(col(idCol), explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .groupBy(col("gram")).agg(min(col(idCol)).as("first_doc"))
      .groupBy(col("first_doc"))
      .agg(count(lit(1)).cast("long").as("novel_grams"))
    perDoc.join(owned, perDoc(idCol) === owned("first_doc"), "left")
      .select(perDoc(idCol), col("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
      .withColumn("novelty",
        round(col("novel_grams").cast("double") / col("n_grams"), 4))
  }
}
