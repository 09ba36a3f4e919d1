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

  /** MinHash-LSH near-duplicate candidate pairs over documents. */
  /** MinHash+LSH candidate pairs, portable-hash variant: 31-bit md5
    * base hash + the shared linear permutations (Dedup.permA/permB) so
    * the WHOLE pipeline — shingles → minhash signature → banded buckets
    * → candidate pairs → signature-agreement estimate — hash-compares
    * against a DuckDB twin generated from the same constants. The
    * xxhash64 production path keeps OperatorsSpec/PropertySpec coverage.
    */
  def q18MinHashDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(t(spark, dir, "documents"), "doc_id", "text",
      numHashes = 32, bands = 8, minJaccard = 0.3, portable = true)
      .orderBy("id_a", "id_b")

  val q18Sql: String = {
    val a = Dedup.permA.take(32).mkString("[", ",", "]")
    val b = Dedup.permB.take(32).mkString("[", ",", "]")
    // 31-bit base from the first 8 md5 hex chars, positionally
    val baseTerms = (1 to 8)
      .map(p => s"(strpos('0123456789abcdef', substring(x,$p,1))-1)*${1L << (4 * (8 - p))}")
      .mkString(" + ")
    s"""WITH ab AS (SELECT $a AS pa, $b AS pb),
       |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |    list_distinct(CASE WHEN len(w) >= 3
       |      THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w)-2)]
       |      ELSE [array_to_string(w, ' ')] END) AS shs
       |  FROM toks),
       |base AS (SELECT doc_id, [(($baseTerms) & 2147483647) FOR x IN [md5(s) FOR s IN shs]] AS vals FROM sh),
       |sig AS (SELECT doc_id,
       |    [list_min([(pa[i]*v + pb[i]) % 2147483647 FOR v IN vals]) FOR i IN generate_series(1,32)] AS sig
       |  FROM base, ab),
       |bands AS (SELECT doc_id, sig, b, array_to_string(sig[b*4+1:b*4+4], ',') AS bucket
       |  FROM sig, generate_series(0,7) AS t(b)),
       |pairs AS (SELECT DISTINCT a2.doc_id AS id_a, b2.doc_id AS id_b, a2.sig AS sa, b2.sig AS sb
       |  FROM bands a2 JOIN bands b2 ON a2.b = b2.b AND a2.bucket = b2.bucket AND a2.doc_id < b2.doc_id)
       |SELECT id_a, id_b,
       |  len([i FOR i IN generate_series(1,32) IF sa[i] = sb[i]])/32.0 AS est_jaccard
       |FROM pairs
       |WHERE len([i FOR i IN generate_series(1,32) IF sa[i] = sb[i]])/32.0 >= 0.3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** SimHash near-duplicate candidate pairs (Hamming ≤ 3 of 64 bits). */
  /** SimHash near-dup pairs, portable-hash variant (md5-derived 64-bit
    * token hash) so the full pipeline — token hash → 64 bit-votes →
    * fingerprint → 16-bit pigeonhole chunks → bucket pairs → hamming
    * verify — is hash-compared against a DuckDB twin. The xxhash64
    * production path keeps its OperatorsSpec coverage. The twin joins
    * chunks directly (uncapped): valid while no chunk bucket exceeds
    * maxBucket (measured max 291 at sf0.1 vs cap 1000; the observed
    * truncated_buckets metric guards the regime).
    */
  def q19SimHashDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashDedup(t(spark, dir, "documents"), "doc_id", "text", maxHamming = 3,
      portable = true)
      .orderBy("id_a", "id_b")

  val q19Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      |h AS (SELECT doc_id, md5(tok) AS hx FROM toks),
      |votes AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN ((strpos('0123456789abcdef', substring(hx, 15 - j//4, 1)) - 1) >> (j % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM h, generate_series(0, 59) AS t(j)
      |  GROUP BY doc_id, j),
      |fp AS (SELECT doc_id,
      |    bit_or(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS sh
      |  FROM votes GROUP BY doc_id),
      |chunks AS (SELECT doc_id, sh, ci, (sh >> (ci*16)) & 65535 AS cv
      |  FROM fp, (VALUES (0),(1),(2),(3)) c(ci)),
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
      |  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh, b.sh)) <= 3)
      |SELECT id_a, id_b, hamming FROM pairs ORDER BY id_a, id_b""".stripMargin

  /** Exact n-gram Jaccard pairs (inverted-index verification stage). */
  def q20NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(t(spark, dir, "documents"), "doc_id", "text",
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
  /** LSH-blocked embedding near-dup pairs — oracle-checked: the DuckDB
    * twin embeds the SAME hyperplane literals (VectorOps.plane values,
    * printed by Scala and re-parsed by DuckDB's correctly-rounded
    * strtod), replicates the 48-bit signature / 6-band bucketing with
    * plain bit arithmetic, and verifies with the identical
    * dot/(‖a‖·‖b‖) expression shape q35 already proved engine-exact.
    * The twin joins buckets uncapped — valid while no bucket nears
    * maxBucket (measured 28 at sf0.1 vs cap 1000; the observed
    * truncation metric guards the regime).
    */
  def q21EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.01)).as("vec"))
    VectorOps.embeddingNearDup(base.unionByName(planted), "vec_id", "vec", threshold = 0.95)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("id_a", "id_b")
  }

  val q21Sql: String = {
    val pl = (0 until 48).map(p => VectorOps.plane(p, 64).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val sigTerms = (0 until 48).map(p =>
      s"(CASE WHEN list_dot_product(vec, pl[${p + 1}]) > 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH planes AS (SELECT $pl AS pl),
       |av AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01)
       |  FROM embeddings WHERE vec_id < 20),
       |sig AS (SELECT vec_id, vec, $sigTerms AS sig FROM av, planes),
       |bb AS (SELECT vec_id, sig, b, (sig >> (b*8)) & 255 AS bucket FROM sig, generate_series(0,5) t(b)),
       |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |  FROM bb a JOIN bb b2 ON a.b = b2.b AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
       |res AS (SELECT id_a, id_b,
       |    list_dot_product(na.vec, nb.vec) / (sqrt(list_dot_product(na.vec, na.vec)) * sqrt(list_dot_product(nb.vec, nb.vec))) AS cos
       |  FROM pairs JOIN av na ON na.vec_id = id_a JOIN av nb ON nb.vec_id = id_b)
       |SELECT id_a, id_b, round(cos, 6) AS cosine FROM res WHERE cos >= 0.95
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Exact near-duplicate verification (brute-force all-pairs cosine) —
    * the exact baseline behind the LSH-blocked q21, oracle-checked
    * against DuckDB's list_dot_product. Same planted duplicates as q21,
    * so this also pins q21's expected recall set. Norms are computed once
    * per vector before the pair join, so each of the O(n²) pairs costs a
    * single codegen'd [[graft.expressions.VecDot]]. At 100 TB scale the
    * pair source would be LSH candidates (q21); the math per pair is
    * identical.
    */
  def q35NearDupExact(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val base = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.01)).as("vec"))
    val withNorm = base.unionByName(planted)
      .withColumn("nrm", sqrt(call_function("vec_dot", col("vec"), col("vec"))))
    val a = withNorm.select(col("vec_id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col("vec_id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        call_function("vec_dot", col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= 0.95)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  val q35Sql: String =
    """WITH av AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01)
      |  FROM embeddings WHERE vec_id < 20),
      |n AS (SELECT vec_id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM av),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cos
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(cos, 6) AS cosine
      |FROM p WHERE cos >= 0.95 ORDER BY id_a, id_b""".stripMargin

  /** Benchmark-contamination sweep: max n-gram containment of each "test"
    * doc (deterministic doc_id%10 holdout — SQL-expressible, unlike the
    * production hash split of [[graft.operators.Sampling]]) against any
    * "train" doc. Oracle-checked via the q20-style DuckDB shingle
    * machinery.
    */
  def q50Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.contamination(
        docs.filter(col("doc_id") % 10 < 8),
        docs.filter(col("doc_id") % 10 >= 8),
        "doc_id", "text", k = 3, minContainment = 0.2, maxDocFreq = 1000)
      .select(col("test_id"), col("train_id"), round(col("containment"), 6).as("containment"))
      .orderBy("test_id")
  }

  val q50Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] END) AS shingles
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      |tr AS (SELECT doc_id AS train_id, shingle FROM ex WHERE doc_id % 10 < 8),
      |te AS (SELECT doc_id AS test_id, shingle FROM ex WHERE doc_id % 10 >= 8),
      |tsz AS (SELECT test_id, count(*) AS n_test FROM te GROUP BY 1),
      |trf AS (SELECT train_id, shingle FROM (
      |  SELECT train_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM tr)
      |  WHERE df <= 1000),
      |co AS (SELECT te.test_id, trf.train_id, count(*) AS inter
      |       FROM te JOIN trf USING (shingle) GROUP BY 1, 2),
      |cm AS (SELECT co.test_id, co.train_id,
      |         CAST(co.inter AS DOUBLE) / tsz.n_test AS containment
      |       FROM co JOIN tsz USING (test_id)
      |       WHERE CAST(co.inter AS DOUBLE) / tsz.n_test >= 0.2),
      |b AS (SELECT test_id, train_id, containment,
      |        row_number() OVER (PARTITION BY test_id
      |          ORDER BY containment DESC, train_id ASC) AS rn
      |      FROM cm)
      |SELECT test_id, train_id, round(containment, 6) AS containment
      |FROM b WHERE rn = 1 ORDER BY test_id""".stripMargin

  /** Gopher-style repetition signals for corpus filtering: the fraction
    * of a document occupied by its most frequent word and 2-gram (high
    * values mean boilerplate/templated text). Argmax tie-breaks to the
    * lexicographically smallest gram in both engines via min over
    * (-count, gram).
    */
  def q53Repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = split(lower(col("text")), " ")
    val m = greatest(size(toks) - 1, lit(0))
    val bigrams = transform(
      arrays_zip(slice(toks, lit(1), m).as("a"), slice(toks, lit(2), m).as("b")),
      s => concat_ws(" ", s.getField("a"), s.getField("b")))

    def topFraction(grams: org.apache.spark.sql.Column, what: String): DataFrame =
      docs.select(col("doc_id"), explode(grams).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"n_$what"),
          min(struct((-col("c")).as("nc"), col("gram").as("g"))).as("m"))
        .select(col("doc_id"), col(s"n_$what"),
          col("m.g").as(s"top_$what"),
          round((-col("m.nc")).cast("double") / col(s"n_$what"), 6).as(s"top_${what}_fraction"))

    topFraction(toks, "word")
      .join(topFraction(bigrams, "bigram"), Seq("doc_id"))
      .orderBy("doc_id")
  }

  val q53Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |wx AS (SELECT doc_id, unnest(toks) AS gram FROM tk),
      |wc AS (SELECT doc_id, gram, count(*) AS c FROM wx GROUP BY 1, 2),
      |wr AS (SELECT doc_id, gram, c,
      |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
      |       FROM wc),
      |w AS (SELECT doc_id, n AS n_word, gram AS top_word,
      |        round(CAST(c AS DOUBLE) / n, 6) AS top_word_fraction
      |      FROM wr WHERE rn = 1),
      |bx AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
      |         ELSE [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))] END) AS gram
      |       FROM tk),
      |bc AS (SELECT doc_id, gram, count(*) AS c FROM bx GROUP BY 1, 2),
      |br AS (SELECT doc_id, gram, c,
      |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
      |       FROM bc),
      |b AS (SELECT doc_id, n AS n_bigram, gram AS top_bigram,
      |        round(CAST(c AS DOUBLE) / n, 6) AS top_bigram_fraction
      |      FROM br WHERE rn = 1)
      |SELECT w.doc_id, w.n_word, w.top_word, w.top_word_fraction,
      |  b.n_bigram, b.top_bigram, b.top_bigram_fraction
      |FROM w JOIN b ON w.doc_id = b.doc_id ORDER BY w.doc_id""".stripMargin

  /** Heuristic language ID vs the labeled lang column. Oracle-checked:
    * the marker-token hit rates and the CJK charset ratio are portable
    * SQL (DuckDB list_filter + RE2 \x{...} class), and the
    * highest-score/greatest-struct tie-break maps to list_sort(...)[-1].
    */
  def q22LangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("lid", TextAnalysis.langId(col("text")))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("lid.predicted_lang").as("predicted_lang"),
        round(col("lid.confidence"), 6).as("confidence"))
      .orderBy("doc_id")

  val q22Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, text,
      |    string_split_regex(lower(text), '\s+') AS toks,
      |    CAST(length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS cjk
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, cjk,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS DOUBLE) / greatest(len(toks),1) AS s_en,
      |    CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS DOUBLE) / greatest(len(toks),1) AS s_de,
      |    CAST(len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un','es'], x))) AS DOUBLE) / greatest(len(toks),1) AS s_es,
      |    CAST(len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','est','que'], x))) AS DOUBLE) / greatest(len(toks),1) AS s_fr
      |  FROM t),
      |b AS (
      |  SELECT doc_id, lang AS labeled_lang, cjk,
      |    list_sort([{'s': s_de, 'l': 'de'}, {'s': s_en, 'l': 'en'}, {'s': s_es, 'l': 'es'}, {'s': s_fr, 'l': 'fr'}])[-1] AS best
      |  FROM s)
      |SELECT doc_id, labeled_lang,
      |  CASE WHEN cjk > 0.2 THEN 'zh' ELSE best.l END AS predicted_lang,
      |  round(CASE WHEN cjk > 0.2 THEN cjk ELSE best.s END, 6) AS confidence
      |FROM b ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints per document, portable-hash variant so the
    * full pipeline (k-gram hash → sliding min → distinct → set digest)
    * is hash-compared against a DuckDB list-comprehension twin. The
    * xxhash64 production path is pinned separately by OperatorsSpec/
    * PropertySpec.
    */
  def q23Fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprintDocs(t(spark, dir, "documents"), "doc_id", portable = true)
      .select(col("doc_id"), col("n_fingerprints"), col("content_id"))
      .orderBy("doc_id")

  val q23Sql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    [('0x' || substring(md5(substring(text, i, 8)), 1, 15))::BIGINT FOR i IN generate_series(1, greatest(length(text)-7, 1))] AS grams
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    list_distinct([list_min(grams[j:least(j+3, len(grams))]) FOR j IN generate_series(1, greatest(len(grams)-3, 1))]) AS fps
      |  FROM g)
      |SELECT doc_id, CAST(len(fps) AS INT) AS n_fingerprints,
      |  md5(array_to_string(list_transform(list_sort(fps), x -> CAST(x AS VARCHAR)), ',')) AS content_id
      |FROM f ORDER BY doc_id""".stripMargin

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
  /** LSH ANN top-k — oracle-checked like q21: the DuckDB twin embeds
    * the same 16 hyperplane literals, replicates the 4-band bucketing,
    * and re-ranks candidates with the engine-exact cosine; rank order
    * (unrounded cosine desc, id asc) is deterministic because the
    * doubles are identical on both engines.
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

  val q25Sql: String = {
    val pl = (0 until 16).map(p => VectorOps.plane(p, 64).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val sigTerms = (0 until 16).map(p =>
      s"(CASE WHEN list_dot_product(vec, pl[${p + 1}]) > 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH planes AS (SELECT $pl AS pl),
       |av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |sig AS (SELECT vec_id, vec, $sigTerms AS sig FROM av, planes),
       |bb AS (SELECT vec_id, sig, b, (sig >> (b*4)) & 15 AS bucket FROM sig, generate_series(0,3) t(b)),
       |cand AS (SELECT DISTINCT c.vec_id AS id, q.vec_id AS qid
       |  FROM bb c JOIN bb q ON c.b = q.b AND c.bucket = q.bucket
       |  WHERE c.vec_id >= 5 AND q.vec_id < 5),
       |res AS (SELECT qid, id,
       |    list_dot_product(cv.vec, qv.vec) / (sqrt(list_dot_product(cv.vec, cv.vec)) * sqrt(list_dot_product(qv.vec, qv.vec))) AS cos
       |  FROM cand JOIN av cv ON cv.vec_id = id JOIN av qv ON qv.vec_id = qid),
       |rk AS (SELECT qid, id AS neighbor_id, round(cos, 6) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS INT) AS rn
       |  FROM res)
       |SELECT qid, neighbor_id, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin
  }

  /** IVF approximate ANN — same query set as the q17 brute-force
    * baseline; probes 4 of 16 clusters (inverted-file scale path).
    * Oracle-checked via the frozen-centroid query path
    * ([[graft.operators.IvfIndex.cosineTopKFrozen]]): production IVF
    * trains its centroids OFFLINE, so at query time they are always
    * fixed constants — embedding the deterministic centroid literals in
    * both engines makes assignment → probe → re-rank hash-comparable
    * (the q21/q25 portable-literal trick). The Lloyd training path
    * stays recall-pinned in ChecksDimsSkewSpec.
    */
  def q28AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.IvfIndex.cosineTopKFrozen(spark,
      em.filter(col("vec_id") >= 5).withColumnRenamed("vec_id", "id").withColumnRenamed("v", "vec"),
      em.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "qvec"),
      k = 10, centArr = graft.operators.IvfIndex.frozenCentroids(16, 64), nprobe = 4)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("qid", "rn")
  }

  /** The per-centroid argmin score terms of the DuckDB twins: the SAME
    * |c|² literal the Scala side folds driver-side, minus 2·dot against
    * the SAME printed centroid row — bit-identical scores, so argmin and
    * probe ranking agree across engines.
    */
  private def ivfScoreTerms(vecExpr: String, listExpr: String,
      arr: Seq[(Int, Array[Double])], cidName: String): String =
    arr.map { case (cid, c) =>
      val n2 = c.map(x => x * x).sum
      s"{'d': $n2 - 2.0*list_dot_product($vecExpr, $listExpr[${cid + 1}]), '$cidName': $cid}"
    }.mkString("[", ", ", "]")

  private def ivfMat(arr: Seq[(Int, Array[Double])]): String =
    arr.sortBy(_._1).map(_._2.mkString("[", ",", "]")).mkString("[", ",", "]")

  val q28Sql: String = {
    val cents = graft.operators.IvfIndex.frozenCentroids(16, 64)
    s"""WITH cc AS (SELECT ${ivfMat(cents)} AS c),
       |av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |corp AS (SELECT vec_id AS id, vec,
       |    list_sort(${ivfScoreTerms("vec", "cc.c", cents, "cid")})[1].cid AS cluster_id
       |  FROM av, cc WHERE vec_id >= 5),
       |qp AS (SELECT qid, qvec, s.cid AS cluster_id FROM (
       |  SELECT vec_id AS qid, vec AS qvec,
       |      unnest(list_sort(${ivfScoreTerms("vec", "cc.c", cents, "cid")})[1:4]) AS s
       |    FROM av, cc WHERE vec_id < 5)),
       |res AS (SELECT qp.qid, corp.id,
       |    list_dot_product(corp.vec, qp.qvec)
       |      / (sqrt(list_dot_product(corp.vec, corp.vec)) * sqrt(list_dot_product(qp.qvec, qp.qvec))) AS cos
       |  FROM corp JOIN qp USING (cluster_id)),
       |rk AS (SELECT qid, id AS neighbor_id, round(cos, 6) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS INT) AS rn
       |  FROM res)
       |SELECT qid, neighbor_id, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin
  }

  /** Residual-quantized IVF ANN (compressed (cluster,code) index +
    * approximate scoring against reconstructions + exact re-rank of
    * survivors) — same query set as q17/q25/q28 so recall is directly
    * comparable. Oracle-checked via the frozen centroid+codebook query
    * path ([[graft.operators.IvfIndex.rqCosineTopKFrozen]]) — offline
    * training means both levels are query-time constants; every stage
    * (residual, code argmin, reconstruction scoring, exact re-rank) is
    * element-wise or sequential-fold math the DuckDB twin reproduces
    * bit-for-bit. Lloyd-trained RQ stays recall-pinned in
    * ChecksDimsSkewSpec.
    */
  def q64AnnIvfRq(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.operators.IvfIndex.rqCosineTopKFrozen(spark,
      em.filter(col("vec_id") >= 5).withColumnRenamed("vec_id", "id").withColumnRenamed("v", "vec"),
      em.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "qvec"),
      k = 10, centArr = graft.operators.IvfIndex.frozenCentroids(16, 64),
      codeArr = graft.operators.IvfIndex.frozenCodebook(16, 64), nprobe = 4, refine = 4)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy("qid", "rn")
  }

  val q64Sql: String = {
    val cents = graft.operators.IvfIndex.frozenCentroids(16, 64)
    val codes = graft.operators.IvfIndex.frozenCodebook(16, 64)
    s"""WITH cc AS (SELECT ${ivfMat(cents)} AS c),
       |ww AS (SELECT ${ivfMat(codes)} AS w),
       |av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |corp AS (SELECT vec_id AS id, vec,
       |    list_sort(${ivfScoreTerms("vec", "cc.c", cents, "cid")})[1].cid AS cluster_id
       |  FROM av, cc WHERE vec_id >= 5),
       |rv AS (SELECT id, cluster_id,
       |    list_transform(range(1, 65), i -> vec[i] - cc.c[cluster_id + 1][i]) AS rvec
       |  FROM corp, cc),
       |enc AS (SELECT id, cluster_id,
       |    list_sort(${ivfScoreTerms("rvec", "ww.w", codes, "code")})[1].code AS code
       |  FROM rv, ww),
       |qp AS (SELECT qid, qvec, s.cid AS cluster_id FROM (
       |  SELECT vec_id AS qid, vec AS qvec,
       |      unnest(list_sort(${ivfScoreTerms("vec", "cc.c", cents, "cid")})[1:4]) AS s
       |    FROM av, cc WHERE vec_id < 5)),
       |ap AS (SELECT qp.qid, qp.qvec, enc.id,
       |    list_transform(range(1, 65), i -> cc.c[enc.cluster_id + 1][i] + ww.w[enc.code + 1][i]) AS recon
       |  FROM enc JOIN qp USING (cluster_id) CROSS JOIN cc CROSS JOIN ww),
       |sc AS (SELECT qid, qvec, id,
       |    list_dot_product(recon, qvec)
       |      / (sqrt(list_dot_product(recon, recon)) * sqrt(list_dot_product(qvec, qvec))) AS approx_cos
       |  FROM ap),
       |surv AS (SELECT qid, qvec, id FROM (
       |    SELECT qid, qvec, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, id ASC) AS arn
       |    FROM sc) WHERE arn <= 40),
       |res AS (SELECT surv.qid, surv.id,
       |    list_dot_product(av.vec, surv.qvec)
       |      / (sqrt(list_dot_product(av.vec, av.vec)) * sqrt(list_dot_product(surv.qvec, surv.qvec))) AS cos
       |  FROM surv JOIN av ON av.vec_id = surv.id),
       |rk AS (SELECT qid, id AS neighbor_id, round(cos, 6) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id ASC) AS INT) AS rn
       |  FROM res)
       |SELECT qid, neighbor_id, cosine, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin
  }

  /** N-gram LM quality score ([[TextAnalysis.ngramLogprob]]): per-doc
    * average log-probability under a corpus-trained add-1 bigram model —
    * the CCNet-style perplexity filter. Oracle-checked: counts are
    * integers, probabilities identical IEEE divisions, `ln` rounded to
    * 6dp at the source (the q74 idf stance), and the per-doc mean sums
    * exact DECIMAL — order-independent on both engines.
    */
  def q101LmScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramLogprob(t(spark, dir, "documents"), "doc_id")
      .orderBy("doc_id")

  val q101Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |stx AS (SELECT doc_id,
      |    unnest([{'i': i, 'w': toks[i], 'prev': CASE WHEN i > 1 THEN toks[i-1] END}
      |            FOR i IN generate_series(1, len(toks))]) AS s
      |  FROM tk),
      |st AS (SELECT doc_id, s.i AS i, s.w AS w, s.prev AS prev FROM stx),
      |uni AS (SELECT w, COUNT(*) AS cu FROM st GROUP BY w),
      |sc AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_corpus, COUNT(*) AS v_size FROM uni),
      |bi AS (SELECT prev AS b1, w AS b2, COUNT(*) AS cb FROM st WHERE prev IS NOT NULL GROUP BY 1, 2),
      |scored AS (SELECT st.doc_id,
      |    CAST(round((CASE WHEN st.i = 1
      |      THEN ln(CAST(u.cu + 1 AS DOUBLE) / (sc.n_corpus + sc.v_size))
      |      ELSE ln(CAST(COALESCE(b.cb, 0) + 1 AS DOUBLE) / (up.cu + sc.v_size)) END) * 1e6, 0) AS BIGINT) AS lp_micro
      |  FROM st
      |  JOIN uni u ON u.w = st.w
      |  LEFT JOIN uni up ON up.w = st.prev
      |  LEFT JOIN bi b ON b.b1 = st.prev AND b.b2 = st.w
      |  CROSS JOIN sc),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(lp_micro) AS BIGINT) AS s
      |  FROM scored GROUP BY doc_id)
      |SELECT doc_id, n AS n_tokens,
      |  CAST(CASE WHEN s >= 0 THEN (s * 2 + n) // (2 * n)
      |            ELSE -(((-s) * 2 + n) // (2 * n)) END AS DOUBLE) / 1e6 AS avg_logprob
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Token-budget mixture sampling ([[graft.operators.Sampling
    * .tokenBudgetMixture]]): per-language token budgets realized as a
    * hash-stable greedy prefix — the pretraining data-mixture step.
    * Oracle-checked: md5 order, integer token counts, and the
    * window-cumsum cut are identical in any engine (no RNG).
    */
  def q103Mixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    graft.operators.Sampling.tokenBudgetMixture(docs, "doc_id", "lang", "n_tokens",
      Seq("en" -> 3000L, "de" -> 1500L, "es" -> 1500L, "fr" -> 1000L, "zh" -> 800L))
      .orderBy("lang", "doc_id")
  }

  val q103Sql: String =
    """WITH d AS (SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |b(lang, budget) AS (VALUES ('en', 3000), ('de', 1500), ('es', 1500), ('fr', 1000), ('zh', 800)),
      |c AS (SELECT d.doc_id, d.lang, d.n_tokens, b.budget,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY d.lang ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
      |  FROM d JOIN b USING (lang))
      |SELECT doc_id, lang, n_tokens, tokens_before
      |FROM c WHERE tokens_before < budget ORDER BY lang, doc_id""".stripMargin

  /** The composed CURATION PIPELINE — the end-to-end flow a
    * training-data user actually runs, chaining four individually
    * hash-certified stages so their INTERACTION (column contracts, drop
    * ordering) is oracle-certified too:
    *   1. quality filter: [[TextAnalysis.qualityFeatures]] score ≥ 0.8
    *      over the training candidates (doc_id%10 < 8; the %10 ≥ 8 rows
    *      are the held-out benchmark);
    *   2. near-dup resolution: q102's keep-best policy (n-gram Jaccard
    *      pairs → connected components → keep the longest member) on
    *      the quality survivors — non-keepers drop;
    *   3. decontamination: drop any surviving candidate that CONTAINS a
    *      benchmark doc ([[Dedup.contaminationPairs]] ≥ 0.2 — the
    *      un-reduced pair set, because ANY leak disqualifies, not just
    *      each test doc's best match);
    *   4. token-budget mixture: [[graft.operators.Sampling
    *      .tokenBudgetMixture]] per-language budgets over what's left.
    * Each stage only shuffles on its natural key (shingle / component /
    * source); drops flow as left-anti joins, never collected.
    *
    * The two SHARED stage results are persisted as NARROW ID SETS
    * (doc_id only, MEMORY_AND_DISK, CacheScope-tracked): the quality
    * survivors feed three subtrees (shingle pairs, word counts, the
    * anti-join) and the dedup survivors two (contamination pairs, the
    * final anti-join) — without a cache each consumer re-runs the
    * quality-feature/connected-components pipelines, real work done
    * twice at any scale. What is deliberately NOT cached is the full
    * document TEXT: consumers re-derive the wide frame as a LEFT SEMI
    * join of the column-pruned parquet scan against the cached id set.
    * A persisted full-text frame is exactly the block that spills
    * under memory pressure (the r11 driver bench showed this query
    * 6.7× slower with io-contention while the clean-box runs were
    * flat), while the id set is O(rows × 8 bytes) and effectively
    * never spills; the re-scan it costs is columnar, pushed-down and
    * page-cache-friendly. At 100 TB the cached set stays ~GBs where
    * the text frame would be ~TBs.
    */
  def q104Curate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val test = docs.filter(col("doc_id") % 10 >= 8).select("doc_id", "lang", "text")
    val cand = docs.filter(col("doc_id") % 10 < 8).select("doc_id", "lang", "text")
    // stage 1: quality gate — cache only the survivor ID SET; the wide
    // text frame re-derives per consumer via a semi-join against the
    // column-pruned scan (see scaladoc: the narrow cache cannot spill)
    val qualityIds = graft.CacheScope.track(
      TextAnalysis.qualityFeatures(cand)
        .filter(col("quality_score") >= 0.8)
        .select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val q = cand.join(qualityIds, Seq("doc_id"), "left_semi")
    // stage 2: duplicate-cluster keep-best (q102 parameters/policy)
    val pairs = Dedup.ngramJaccard(q, "doc_id", "text",
      k = 3, minJaccard = 0.2, maxDocFreq = 200)
    val wc = q.select(col("doc_id"), size(split(col("text"), " ")).as("word_count"))
    val dupDrops = graft.operators.ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"))
      .join(wc, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("word_count").desc, col("doc_id").asc)))
      .filter(col("rk") > 1)
      .select("doc_id")
    val dedupedIds = graft.CacheScope.track(
      qualityIds.join(dupDrops, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deduped = cand.join(dedupedIds, Seq("doc_id"), "left_semi")
    // stage 3: benchmark decontamination (drop-ANY-leak direction)
    val contaminated = Dedup.contaminationPairs(deduped, test, "doc_id", "text",
        k = 3, minContainment = 0.2, maxDocFreq = 1000)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 4: per-language token-budget mixture
    val withTok = clean.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    graft.operators.Sampling.tokenBudgetMixture(withTok, "doc_id", "lang", "n_tokens",
      Seq("en" -> 2000L, "de" -> 1000L, "es" -> 1000L, "fr" -> 800L, "zh" -> 600L))
      .orderBy("lang", "doc_id")
  }

  val q104Sql: String =
    """WITH RECURSIVE
      |test AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 >= 8),
      |cand AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 < 8),
      |qf AS (SELECT doc_id, lang, text, string_split_regex(text, '\s+') AS words FROM cand),
      |q AS (SELECT doc_id, lang, text FROM (
      |    SELECT doc_id, lang, text,
      |      CAST(len(words) AS INT) AS n_words,
      |      CAST(length(text) AS DOUBLE) / greatest(len(words), 1) AS avg_word_len,
      |      CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1) AS punct_ratio,
      |      1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1) AS dup_word_ratio
      |    FROM qf)
      |  WHERE greatest(0.0, least(1.0, 1.0
      |    - CASE WHEN n_words < 8 THEN 0.4 ELSE 0.0 END
      |    - CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 0.0 END
      |    - CASE WHEN dup_word_ratio > 0.7 THEN 0.3 ELSE 0.0 END
      |    - CASE WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 0.2 ELSE 0.0 END)) >= 0.8),
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM q),
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
      |pairs AS (SELECT co.id_a, co.id_b
      |      FROM co JOIN sizes sa ON sa.doc_id = co.id_a JOIN sizes sb ON sb.doc_id = co.id_b
      |      WHERE CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) >= 0.2),
      |und AS (SELECT id_a AS a, id_b AS b FROM pairs
      |        UNION SELECT id_b, id_a FROM pairs),
      |reach AS (SELECT DISTINCT a AS id, a AS r FROM und
      |          UNION
      |          SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id),
      |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      |wc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS word_count FROM q),
      |rk AS (SELECT comp.id AS doc_id,
      |    row_number() OVER (PARTITION BY comp.component
      |      ORDER BY wc.word_count DESC, comp.id ASC) AS rk
      |  FROM comp JOIN wc ON wc.doc_id = comp.id),
      |d AS (SELECT q.* FROM q WHERE doc_id NOT IN (SELECT doc_id FROM rk WHERE rk > 1)),
      |dtoks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM d),
      |dsh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] END) AS shingles
      |  FROM dtoks),
      |dex AS (SELECT doc_id AS train_id, unnest(shingles) AS shingle FROM dsh),
      |ttoks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM test),
      |tsh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |    ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] END) AS shingles
      |  FROM ttoks),
      |tex AS (SELECT doc_id AS test_id, unnest(shingles) AS shingle FROM tsh),
      |tsz AS (SELECT test_id, count(*) AS n_test FROM tex GROUP BY 1),
      |trf AS (SELECT train_id, shingle FROM (
      |    SELECT train_id, shingle, count(*) OVER (PARTITION BY shingle) AS dfr FROM dex)
      |  WHERE dfr <= 1000),
      |cco AS (SELECT tex.test_id, trf.train_id, count(*) AS inter
      |        FROM tex JOIN trf USING (shingle) GROUP BY 1, 2),
      |contam AS (SELECT DISTINCT cco.train_id AS doc_id
      |           FROM cco JOIN tsz USING (test_id)
      |           WHERE CAST(cco.inter AS DOUBLE) / tsz.n_test >= 0.2),
      |c AS (SELECT d.* FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      |m AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS h FROM c),
      |b(lang, budget) AS (VALUES ('en', 2000), ('de', 1000), ('es', 1000), ('fr', 800), ('zh', 600)),
      |cum AS (SELECT m.doc_id, m.lang, m.n_tokens, b.budget,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY m.lang ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
      |  FROM m JOIN b USING (lang))
      |SELECT doc_id, lang, n_tokens, tokens_before
      |FROM cum WHERE tokens_before < budget ORDER BY lang, doc_id""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023), composed from
    * the engine's own pieces end-to-end: (1) cluster the embedding
    * corpus with the FROZEN-centroid IVF assignment (offline-trained
    * centroids are query-time constants — same literals as q28/q64);
    * (2) exact cosine near-dup pairs WITHIN each cluster only via
    * [[graft.operators.SemDedup.edges]] (the SemDeDup reduction: the
    * pair join shuffles on cluster_id, never corpus×corpus — and its
    * max-cell-size guard splits/stars oversized cells so frozen-k
    * doesn't go quadratic under corpus growth; no cell is oversized at
    * test SFs, so the oracle sees the identical plain pair join); (3) resolve duplicate groups with
    * [[graft.operators.ConnectedComponents]] and keep the min-id
    * representative. Same planted near-duplicates as q21/q35, so the
    * expected duplicate set is known. Pairs split across clusters are
    * out of scope BY DESIGN (that is SemDeDup's approximation) — the
    * DuckDB twin makes the identical choice, so the oracle certifies
    * the whole composed pipeline including the closure.
    */
  def q100SemDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val base = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x + lit(0.01)).as("vec"))
    val all = base.unionByName(planted)
    val cents = graft.operators.IvfIndex.frozenCentroids(16, 64)
    val assigned = graft.operators.IvfIndex.assignWith(
      all, cents.map { case (c, a) => (c.toLong, a) }, "vec")
    // Guarded pair generation ([[graft.operators.SemDedup.edges]]): with
    // no cell over maxCellSize (the case at every test SF) this IS the
    // plain within-cluster pair join the oracle mirrors; at scale the
    // guard splits/stars oversized cells instead of going quadratic.
    val edges = graft.operators.SemDedup.edges(assigned, "vec_id", "vec", threshold = 0.95)
    graft.operators.ConnectedComponents.clusters(edges, "src", "dst")
      .select(col("id").as("vec_id"), col("component"),
        col("cluster_size").cast("long").as("group_size"),
        (col("id") === col("component")).as("is_representative"))
      .orderBy("vec_id")
  }

  val q100Sql: String = {
    val cents = graft.operators.IvfIndex.frozenCentroids(16, 64)
    s"""WITH RECURSIVE
       |cc AS (SELECT ${ivfMat(cents)} AS c),
       |av AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01)
       |  FROM embeddings WHERE vec_id < 20),
       |asg AS (SELECT vec_id, vec,
       |    list_sort(${ivfScoreTerms("vec", "cc.c", cents, "cid")})[1].cid AS cluster_id,
       |    sqrt(list_dot_product(vec, vec)) AS nrm
       |  FROM av, cc),
       |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.95),
       |und AS (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT DISTINCT a AS id, a AS r FROM und
       |          UNION
       |          SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       |SELECT id AS vec_id, component,
       |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS group_size,
       |  id = component AS is_representative
       |FROM comp ORDER BY vec_id""".stripMargin
  }

  /** Multimodal feature extraction over a deterministic synthetic media
    * corpus. All three media types decode for REAL: images are PNGs
    * through `javax.imageio` (pixel-derived features), audio is RIFF/WAV
    * PCM through `javax.sound.sampled` (sample-derived features), video
    * is GFV1 PNG-frame containers demuxed and decoded per frame
    * (temporal motion features) — see Multimodal scaladoc. Rows-only by
    * nature (binary payloads + codec output are not SQL-expressible);
    * pixel/sample/frame semantics pinned in OperatorsSpec.
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

  /** Text quality features composite (language-model corpus filter).
    * Oracle-checked; quality_score is rounded 6dp on both sides because
    * DuckDB's 0.1-quantum literals are exact decimals while Spark's are
    * binary doubles (1.0-0.4-0.3 = 0.3 vs 0.30000000000000004).
    */
  def q27TextQualityFeatures(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(t(spark, dir, "documents"))
      .select(col("doc_id"), col("n_words"),
        round(col("avg_word_len"), 6).as("avg_word_len"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(col("stopword_ratio"), 6).as("stopword_ratio"),
        round(col("dup_word_ratio"), 6).as("dup_word_ratio"),
        round(col("quality_score"), 6).as("quality_score"))
      .orderBy("doc_id")

  val q27Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split_regex(text, '\s+') AS words FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(words) AS INT) AS n_words,
      |    CAST(length(text) AS DOUBLE) / greatest(len(words), 1) AS avg_word_len,
      |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    CAST(len(list_filter(words, w -> list_contains(['the','and','of','to','a','in','is','that'], w))) AS DOUBLE)
      |      / greatest(len(words), 1) AS stopword_ratio,
      |    1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1) AS dup_word_ratio
      |  FROM t)
      |SELECT doc_id, n_words,
      |  round(avg_word_len, 6) AS avg_word_len,
      |  round(punct_ratio, 6) AS punct_ratio,
      |  round(stopword_ratio, 6) AS stopword_ratio,
      |  round(dup_word_ratio, 6) AS dup_word_ratio,
      |  CAST(round(greatest(0.0, least(1.0, 1.0
      |    - CASE WHEN n_words < 8 THEN 0.4 ELSE 0.0 END
      |    - CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 0.0 END
      |    - CASE WHEN dup_word_ratio > 0.7 THEN 0.3 ELSE 0.0 END
      |    - CASE WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 0.2 ELSE 0.0 END)), 6) AS DOUBLE) AS quality_score
      |FROM f ORDER BY doc_id""".stripMargin

  /** Dedup cluster resolution: n-gram Jaccard near-dup PAIRS (q20's exact
    * parameters) closed into duplicate GROUPS via distributed connected
    * components ([[graft.operators.ConnectedComponents]] min-label
    * propagation). Output: every clustered doc with its cluster
    * representative (min doc_id — the canonical keeper) and cluster size.
    * The DuckDB oracle computes the same transitive closure with a
    * recursive CTE — closure semantics, not just pair semantics, are
    * hash-checked.
    */
  /** Duplicate-cluster RESOLUTION POLICY — the step after detection:
    * real pipelines don't keep the min-id member, they keep the BEST
    * one. Composes the certified q58 machinery (n-gram Jaccard pairs →
    * connected components) with a keep-longest policy: per duplicate
    * cluster, the keeper is the member with the highest word count
    * (ties → smaller doc_id); everything else is the drop list. One
    * row per multi-member cluster with the keeper and the drop count —
    * the exact shape a training-data curation job writes back.
    */
  def q102DedupKeepers(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
      k = 3, minJaccard = 0.2, maxDocFreq = 200)
    val wc = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("word_count"))
    graft.operators.ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
      .join(wc, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
          .orderBy(col("word_count").desc, col("doc_id").asc)))
      .filter(col("rk") === 1)
      .select(col("component"), col("doc_id").as("keeper_id"),
        col("word_count").as("keeper_word_count"),
        col("cluster_size").cast("long").as("n_members"),
        (col("cluster_size") - 1).cast("long").as("n_dropped"))
      .orderBy("component")
  }

  // lazy: declared before q58Sql in this object, so eager init would
  // read a null q58Sql (object vals initialize in declaration order)
  lazy val q102Sql: String = {
    // the q58 closure verbatim (everything before its final SELECT),
    // then the keeper policy on top
    val cut = q58Sql.lastIndexOf("\nSELECT id AS doc_id")
    require(cut >= 0, "q102Sql: q58Sql's final SELECT changed — update the split marker")
    val closure = q58Sql.substring(0, cut)
    s"""$closure,
       |cs AS (SELECT id AS doc_id, component,
       |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size FROM comp),
       |wc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS word_count FROM documents),
       |rk AS (SELECT cs.component, cs.doc_id, wc.word_count, cs.cluster_size,
       |    row_number() OVER (PARTITION BY cs.component
       |      ORDER BY wc.word_count DESC, cs.doc_id ASC) AS rk
       |  FROM cs JOIN wc USING (doc_id))
       |SELECT component, doc_id AS keeper_id, word_count AS keeper_word_count,
       |  cluster_size AS n_members, cluster_size - 1 AS n_dropped
       |FROM rk WHERE rk = 1 ORDER BY component""".stripMargin
  }

  def q58DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccard(t(spark, dir, "documents"), "doc_id", "text",
      k = 3, minJaccard = 0.2, maxDocFreq = 200)
    graft.operators.ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
      .orderBy("doc_id")
  }

  val q58Sql: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
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
      |pairs AS (SELECT co.id_a, co.id_b
      |      FROM co JOIN sizes sa ON sa.doc_id = co.id_a JOIN sizes sb ON sb.doc_id = co.id_b
      |      WHERE CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) >= 0.2),
      |und AS (SELECT id_a AS a, id_b AS b FROM pairs
      |        UNION SELECT id_b, id_a FROM pairs),
      |reach AS (SELECT DISTINCT a AS id, a AS r FROM und
      |          UNION
      |          SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id),
      |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
      |SELECT id AS doc_id, component,
      |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
      |FROM comp ORDER BY doc_id""".stripMargin

  /** Token-budget sequence packing ([[graft.operators.Packing]]): greedy
    * first-fit of documents (whitespace token counts, doc_id order,
    * per-source pack streams) into 1000-token training shards. The
    * DuckDB oracle replays the identical sequential fold as a recursive
    * CTE stepping one doc per source per iteration — the stateful
    * per-group semantics, not just row counts, are hash-checked.
    */
  def q59PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.operators.Packing.greedyPack(docs, "source", "doc_id", "n_tokens", budget = 1000L)
      .select(col("group").as("source"), col("doc_id"), col("n_tokens"),
        col("shard"), col("offset"))
      .orderBy("source", "doc_id")
  }

  val q59Sql: String =
    """WITH RECURSIVE
      |d AS (SELECT source, doc_id,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |        row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |      FROM documents),
      |packed AS (
      |  SELECT source, doc_id, n_tokens, rn,
      |    CAST(0 AS BIGINT) AS shard, CAST(0 AS BIGINT) AS "offset",
      |    n_tokens AS acc
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.source, d.doc_id, d.n_tokens, d.rn,
      |    CASE WHEN p.acc + d.n_tokens > 1000 THEN p.shard + 1 ELSE p.shard END,
      |    CASE WHEN p.acc + d.n_tokens > 1000 THEN CAST(0 AS BIGINT) ELSE p.acc END,
      |    CASE WHEN p.acc + d.n_tokens > 1000 THEN d.n_tokens ELSE p.acc + d.n_tokens END
      |  FROM packed p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
      |SELECT source, doc_id, n_tokens, shard, "offset" AS offset
      |FROM packed ORDER BY source, doc_id""".stripMargin

  /** Bloom-pruned semi join ([[graft.operators.BloomJoin]]): orders with
    * at least one very-high-value line item. The Bloom phase only prunes
    * probe rows ahead of the shuffle (false positives die in the exact
    * semi join), so the result — and the oracle — is the plain EXISTS.
    */
  def q60BloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val hot = t(spark, dir, "lineitem").filter(col("l_extendedprice") > 95000)
    graft.operators.BloomJoin.prunedLeftSemi(orders, hot, "o_orderkey", "l_orderkey",
        expectedItems = 100000L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  val q60Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 95000)
      |ORDER BY o_orderkey""".stripMargin

  /** Span-level corpus dedup ([[graft.operators.Dedup.spanDedup]] — the
    * C4/RefinedWeb line-dedup stage, at 10-token span granularity since
    * the synthetic docs carry no newlines). Planted duplicates: docs
    * 100000-100004 are verbatim 30-token prefixes of docs 0-4, so their
    * spans chunk identically to the originals' spans 0-2 and ALL of them
    * lose first-occurrence — the planted docs must come back with
    * clean_text = '' and n_kept = 0 while every original keeps its
    * text intact (modulo natural span collisions, which the oracle
    * prices in identically).
    */
  def q105SpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
    Dedup.spanDedup(docs.unionByName(planted), "doc_id", "text", spanTokens = 10)
      .orderBy("doc_id")
  }

  /** Quality-weighted IMPORTANCE resampling
    * ([[graft.operators.Sampling.weightedSample]]): each document is
    * kept with probability equal to its quality score — the
    * soft-filtering alternative to q77's hard threshold (low-quality
    * docs downweight instead of vanishing). Portable-hash draw +
    * integer-exact threshold, so the exact kept set hash-matches the
    * DuckDB twin.
    */
  def q107WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityFeatures(t(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("quality_score"))
    graft.operators.Sampling.weightedSample(scored, "doc_id", col("quality_score"),
        seed = 7, portable = true)
      .select(col("doc_id"), col("lang"), round(col("quality_score"), 4).as("weight"))
      .orderBy("doc_id")
  }

  val q107Sql: String =
    """WITH qf AS (SELECT doc_id, lang, text,
      |    string_split_regex(text, '\s+') AS words FROM documents),
      |s AS (SELECT doc_id, lang,
      |    CAST(len(words) AS INT) AS n_words,
      |    CAST(length(text) AS DOUBLE) / greatest(len(words), 1) AS avg_word_len,
      |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1) AS dup_word_ratio
      |  FROM qf),
      |sc AS (SELECT doc_id, lang,
      |    greatest(0.0, least(1.0, 1.0
      |      - CASE WHEN n_words < 8 THEN 0.4 ELSE 0.0 END
      |      - CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 0.0 END
      |      - CASE WHEN dup_word_ratio > 0.7 THEN 0.3 ELSE 0.0 END
      |      - CASE WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 0.2 ELSE 0.0 END)) AS score
      |  FROM s)
      |SELECT doc_id, lang, round(score, 4) AS weight FROM sc
      |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))::BIGINT
      |  < CAST(floor(score * 1152921504606846976.0) AS BIGINT)
      |ORDER BY doc_id""".stripMargin

  /** Sliding-window chunking
    * ([[graft.operators.Packing.chunkWithStride]]): documents split
    * into overlapping 12-token windows at stride 8 — the
    * overflow-with-stride shape used for long-document training and
    * embedding indexing.
    */
  def q108Chunks(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.chunkWithStride(
        t(spark, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", maxTokens = 12, stride = 8)
      .orderBy("doc_id", "chunk_idx")

  val q108Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |idx AS (SELECT doc_id, tk,
      |    unnest(range(CAST(ceil(len(tk) / 8.0) AS BIGINT))) AS i
      |  FROM toks)
      |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
      |  array_to_string(tk[CAST(i * 8 + 1 AS BIGINT):CAST(i * 8 + 12 AS BIGINT)], ' ') AS chunk_text,
      |  CAST(least(len(tk) - i * 8, 12) AS BIGINT) AS n_tokens
      |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin

  /** Johnson-Lindenstrauss projection of the embedding corpus
    * ([[graft.operators.VectorOps.jlProject]]): 64-d → 16-d with the
    * deterministic constant-literal matrix. Output in integer-exact
    * MICRO units (the q101 pattern): both engines compute the same
    * left-to-right dot-product fold over the same literals, and the
    * ×1e6 round makes the comparison float-tie-proof.
    */
  def q106JlProject(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    graft.operators.VectorOps.jlProject(emb, "vec", "proj", k = 16, dims = 64)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "v")))
      .select(col("vec_id"), col("j"),
        round(col("v") * 1e6, 0).cast("long").as("val_micro"))
      .orderBy("vec_id", "j")
  }

  val q106Sql: String = {
    val mat = (0 until 16).map(j =>
      graft.operators.VectorOps.jlPlane(j, 64).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val scale = math.sqrt(3.0 / 16)
    s"""WITH m AS (SELECT $mat AS p),
       |av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |pr AS (SELECT vec_id,
       |    [{'j': j - 1, 'v': list_dot_product(vec, m.p[j]) * $scale}
       |     FOR j IN generate_series(1, 16)] AS ps
       |  FROM av, m),
       |ex AS (SELECT vec_id, unnest(ps) AS s FROM pr)
       |SELECT vec_id, CAST(s.j AS INT) AS j,
       |  CAST(round(s.v * 1e6, 0) AS BIGINT) AS val_micro
       |FROM ex ORDER BY vec_id, j""".stripMargin
  }

  val q105Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    array_to_string((string_split(text, ' '))[1:30], ' ')
      |  FROM documents WHERE doc_id < 5),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM base),
      |idx AS (SELECT doc_id, tk,
      |    unnest(range(CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS cidx
      |  FROM toks),
      |spans AS (SELECT doc_id, CAST(cidx AS INT) AS cidx,
      |    array_to_string(tk[CAST(cidx * 10 + 1 AS BIGINT):CAST(cidx * 10 + 10 AS BIGINT)], ' ') AS span
      |  FROM idx),
      |firsts AS (SELECT doc_id, cidx, span,
      |    row_number() OVER (PARTITION BY span ORDER BY doc_id, cidx) AS rn
      |  FROM spans),
      |re AS (SELECT doc_id, string_agg(span, ' ' ORDER BY cidx) AS clean_text,
      |    CAST(count(*) AS BIGINT) AS n_kept
      |  FROM firsts WHERE rn = 1 GROUP BY doc_id),
      |ns AS (SELECT doc_id,
      |    CAST(ceil(len(string_split(text, ' ')) / 10.0) AS BIGINT) AS n_spans
      |  FROM base)
      |SELECT ns.doc_id, COALESCE(re.clean_text, '') AS clean_text,
      |  ns.n_spans, COALESCE(re.n_kept, 0) AS n_kept
      |FROM ns LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin

  /** BM25 ranked retrieval ([[graft.operators.TextAnalysis.bm25TopK]]):
    * top-10 documents for a 3-query keyword workload — the corpus
    * exploration / RAG-candidate stage. Scores in integer-exact micro
    * units (idf and per-term contributions round at the source, the
    * per-(query, doc) sum is exact BIGINT).
    */
  def q109Bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (0L, Seq("spark", "window", "join")),
      (1L, Seq("fast", "scan", "table")),
      (2L, Seq("vector", "stream", "hash"))).toDF("qid", "terms")
    TextAnalysis.bm25TopK(t(spark, dir, "documents"), "doc_id", "text", queries, k = 10)
      .orderBy("qid", "rn")
  }

  val q109Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CAST(len(tk) AS BIGINT)) AS DOUBLE) / count(*) AS avgdl FROM toks),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(tk) AS term FROM toks) GROUP BY doc_id, term),
      |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |idf AS (SELECT term,
      |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1e6, 0) AS BIGINT) AS idf_micro
      |  FROM dfq, st),
      |qt AS (SELECT * FROM (VALUES (0, ['spark', 'window', 'join']),
      |    (1, ['fast', 'scan', 'table']),
      |    (2, ['vector', 'stream', 'hash'])) AS v(qid, terms)),
      |qe AS (SELECT CAST(qid AS BIGINT) AS qid, unnest(terms) AS term FROM qt),
      |sc AS (SELECT qe.qid, tf.doc_id,
      |    CAST(round((CAST(idf_micro AS DOUBLE) / 1e6) *
      |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) * 1e6, 0) AS BIGINT) AS c
      |  FROM tf JOIN qe USING (term) JOIN idf USING (term) JOIN dls USING (doc_id), st),
      |ag AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
      |    CAST(count(*) AS BIGINT) AS n_terms
      |  FROM sc GROUP BY qid, doc_id),
      |rk AS (SELECT qid, doc_id, n_terms, score_micro,
      |    row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS rn
      |  FROM ag)
      |SELECT qid, doc_id, CAST(rn AS INT) AS rn, n_terms, score_micro
      |FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Int8-quantized ANN ([[graft.operators.VectorOps.quantizeInt8]] +
    * [[graft.operators.VectorOps.quantizedTopK]]): corpus-calibrated
    * scalar quantization, exact integer-dot candidate generation (top 30),
    * full-precision cosine re-rank (top 10). The integer candidate stage
    * is bit-portable by construction; only the re-rank touches doubles,
    * under the q17 rounding discipline.
    */
  def q110QuantAnn(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val qz = VectorOps.quantizeInt8(em, "vec", "q")
    val qs = qz.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"), col("q").as("qq"))
    VectorOps.quantizedTopK(qz.filter(col("vec_id") >= 5), qs, k = 10, candidates = 30,
        id = "vec_id", vec = "vec", codes = "q", qid = "qid", qvec = "qvec", qcodes = "qq")
      .orderBy("qid", "rn")
  }

  val q110Sql: String =
    """WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |dim AS (SELECT unnest(vec) AS x, generate_subscripts(vec, 1) AS d FROM av),
      |stt AS (SELECT d, min(x) AS mn, max(x) AS mx FROM dim GROUP BY d),
      |st AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM stt),
      |qv AS (SELECT vec_id, vec,
      |    [CASE WHEN mxs[i] = mns[i] THEN 0
      |          ELSE CAST(round(((vec[i] - mns[i]) / (mxs[i] - mns[i])) * 254.0, 0) AS INT) - 127 END
      |     FOR i IN generate_series(1, 64)] AS q
      |  FROM av, st),
      |qs AS (SELECT vec_id AS qid, vec AS qvec, q AS qq FROM qv WHERE vec_id < 5),
      |cand AS (SELECT qs.qid, cp.vec_id, cp.vec, qs.qvec,
      |    CAST(round(list_dot_product(CAST(cp.q AS DOUBLE[]), CAST(qs.qq AS DOUBLE[])), 0) AS BIGINT) AS qdot
      |  FROM (SELECT * FROM qv WHERE vec_id >= 5) cp, qs),
      |top AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, vec_id) AS rc
      |  FROM cand),
      |rr AS (SELECT qid, vec_id, qdot,
      |    round(list_dot_product(vec, qvec)
      |      / (sqrt(list_dot_product(vec, vec)) * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
      |  FROM top WHERE rc <= 30),
      |fin AS (SELECT qid, vec_id, qdot, cosine,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn FROM rr)
      |SELECT qid, vec_id AS neighbor_id, qdot, cosine, CAST(rn AS INT) AS rn
      |FROM fin WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Entity resolution / golden record
    * ([[graft.operators.EntityResolution.resolve]]): part-name spelling
    * clusters (token-blocked lev≤3 pairs → CC closure) with each
    * cluster's canonical form elected by row multiplicity. The oracle
    * replays the same blocked pairs (the q91 twin), the closure as a
    * recursive CTE (the q58 pattern), and the same election window.
    */
  def q111EntityResolution(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EntityResolution.resolve(
        t(spark, dir, "part").select(col("p_name")), "p_name", maxDist = 3)
      .orderBy("value")

  val q111Sql: String =
    """WITH RECURSIVE
      |vocab AS (SELECT p_name AS value, CAST(COUNT(*) AS BIGINT) AS n_rows FROM part GROUP BY p_name),
      |toks AS (SELECT DISTINCT value AS s, unnest(string_split(value, ' ')) AS tok FROM vocab),
      |ok AS (SELECT tok FROM toks WHERE tok <> ''
      |  GROUP BY tok HAVING COUNT(*) BETWEEN 2 AND 1000),
      |pairs AS (SELECT DISTINCT a.s AS pa, b.s AS pb
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.s < b.s
      |  JOIN ok ON ok.tok = a.tok
      |  WHERE levenshtein(a.s, b.s) <= 3),
      |und AS (SELECT pa AS a, pb AS b FROM pairs UNION SELECT pb, pa FROM pairs),
      |reach AS (SELECT DISTINCT a AS id, a AS r FROM und
      |          UNION
      |          SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.id),
      |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
      |cl AS (SELECT vocab.value, vocab.n_rows,
      |    COALESCE(comp.comp, vocab.value) AS cluster
      |  FROM vocab LEFT JOIN comp ON comp.id = vocab.value)
      |SELECT value, n_rows, cluster,
      |  first_value(value) OVER (PARTITION BY cluster ORDER BY n_rows DESC, value ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical,
      |  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_sz,
      |  CAST(sum(n_rows) OVER (PARTITION BY cluster) AS BIGINT) AS rows_covered
      |FROM cl ORDER BY value""".stripMargin

  /** Curriculum difficulty tiers from the LM quality score (q101's
    * [[TextAnalysis.ngramLogprob]]): documents bin into 4 tiers by exact
    * avg-logprob quartiles — tier 1 = most fluent (trained first in a
    * curriculum schedule), tier 4 = hardest/noisiest. Percentile
    * THRESHOLDS + a broadcast join instead of a global ntile window: an
    * ntile over the whole corpus is a single-partition sort at scale,
    * while the threshold form is one aggregation + a narrow map.
    */
  def q113Curriculum(spark: SparkSession, dir: String): DataFrame = {
    val lm = TextAnalysis.ngramLogprob(t(spark, dir, "documents"), "doc_id")
    val thr = lm.agg(
      round(expr("percentile(avg_logprob, 0.75)"), 6).as("p75"),
      round(expr("percentile(avg_logprob, 0.5)"), 6).as("p50"),
      round(expr("percentile(avg_logprob, 0.25)"), 6).as("p25"))
    lm.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tokens"), col("avg_logprob"),
        when(col("avg_logprob") >= col("p75"), 1)
          .when(col("avg_logprob") >= col("p50"), 2)
          .when(col("avg_logprob") >= col("p25"), 3)
          .otherwise(4).as("tier"))
      .orderBy("doc_id")
  }

  // lazy: q101Sql is declared above but object vals initialize in
  // declaration order only within this file's ordering — keep the same
  // split-reuse stance as q102Sql-over-q58Sql
  lazy val q113Sql: String = {
    val cut = q101Sql.lastIndexOf("\nSELECT doc_id, n AS n_tokens,")
    require(cut >= 0, "q113Sql: q101Sql's final SELECT changed — update the split marker")
    q101Sql.substring(0, cut) +
      """,
        |lm AS (SELECT doc_id, n AS n_tokens,
        |    CAST(CASE WHEN s >= 0 THEN (s * 2 + n) // (2 * n)
        |         ELSE -(((-s) * 2 + n) // (2 * n)) END AS DOUBLE) / 1e6 AS avg_logprob
        |  FROM agg),
        |thr AS (SELECT round(quantile_cont(avg_logprob, 0.75), 6) AS p75,
        |    round(quantile_cont(avg_logprob, 0.5), 6) AS p50,
        |    round(quantile_cont(avg_logprob, 0.25), 6) AS p25 FROM lm)
        |SELECT doc_id, n_tokens, avg_logprob,
        |  CAST(CASE WHEN avg_logprob >= p75 THEN 1
        |       WHEN avg_logprob >= p50 THEN 2
        |       WHEN avg_logprob >= p25 THEN 3
        |       ELSE 4 END AS INT) AS tier
        |FROM lm, thr ORDER BY doc_id""".stripMargin
  }

  /** HARD-NEGATIVE mining for contrastive training: for each query
    * embedding, the top-10 most-similar corpus vectors with a DIFFERENT
    * label — the standard negative-sampling prep for embedding-model
    * training (in-batch negatives are too easy; nearest other-label
    * vectors are the informative ones). Same broadcast-queries /
    * per-partition-top-k scan shape as q17, with the label inequality
    * pushed below the ranking window.
    */
  def q114HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val q = em.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"), col("emb").as("q_emb"))
    em.filter(col("vec_id") >= 5).crossJoin(broadcast(q))
      .filter(col("label") =!= col("q_label"))
      .withColumn("cosine", round(
        VectorOps.fastCosine(spark)(col("emb"), col("q_emb")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("negative_id"), col("label"), col("cosine"), col("rn"))
      .orderBy("q_id", "rn")
  }

  val q114Sql: String =
    """WITH em AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb FROM em WHERE vec_id < 5),
      |c AS (SELECT vec_id, label, emb FROM em WHERE vec_id >= 5),
      |s AS (SELECT q.q_id, c.vec_id, c.label,
      |        round(list_dot_product(c.emb, q.q_emb) /
      |          (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cosine
      |      FROM c CROSS JOIN q
      |      WHERE c.label <> q.q_label),
      |r AS (SELECT q_id, vec_id, label, cosine,
      |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rn
      |      FROM s)
      |SELECT q_id, vec_id AS negative_id, label, cosine, CAST(rn AS INT) AS rn
      |FROM r WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin

  /** Per-source adaptive quality threshold
    * ([[graft.operators.TextAnalysis.adaptiveQualityFilter]]): each
    * source keeps documents above its OWN 25th quality percentile — the
    * per-domain calibration that a single global cutoff gets wrong.
    */
  def q112AdaptiveQuality(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityFeatures(t(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        round(col("quality_score"), 4).as("score"))
    TextAnalysis.adaptiveQualityFilter(scored, "source", "score", p = 0.25)
      .select(col("doc_id"), col("source"), col("score"), col("threshold"))
      .orderBy("doc_id")
  }

  /** HYBRID retrieval — the fusion layer that turns the two certified
    * index legs into the retrieval surface a RAG / training-data
    * pipeline actually serves: BM25 lexical top-10 (the q109 leg,
    * [[graft.operators.TextAnalysis.bm25TopK]]) and int8-quantized ANN
    * vector top-10 (the q110 leg,
    * [[graft.operators.VectorOps.quantizedTopK]]) fused by reciprocal
    * rank: rrf(d) = Σ_leg 1000000 div (60 + rank_leg(d)), the standard
    * RRF-60 with INTEGER division so the fused score is engine-exact.
    * Query-by-document: docs 0-4 query with their own text (lexical)
    * and their own embedding (vector) against the id-aligned corpus
    * doc_id ≥ 5.
    *
    * Scale shape: both legs are broadcast-query-side plans over one
    * corpus scan each (Round7PlanSpec pins no cartesian); the fusion
    * itself joins two ≤ |queries|·k frames — constant-size at any
    * corpus scale.
    */
  def q115HybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val lexQueries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), split(lower(col("text")), " ").as("terms"))
    val lex = TextAnalysis.bm25TopK(docs.filter(col("doc_id") >= 5), "doc_id", "text",
        lexQueries, k = 10)
      .select(col("qid"), col("doc_id").as("id"), col("rn").as("r_lex"))
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val qz = VectorOps.quantizeInt8(em, "vec", "q")
    val qs = qz.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"), col("q").as("qq"))
    val vecl = VectorOps.quantizedTopK(qz.filter(col("vec_id") >= 5), qs,
        k = 10, candidates = 30,
        id = "vec_id", vec = "vec", codes = "q", qid = "qid", qvec = "qvec", qcodes = "qq")
      .select(col("qid"), col("neighbor_id").as("id"), col("rn").as("r_vec"))
    lex.join(vecl, Seq("qid", "id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + r_vec)"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rrf_micro").desc, col("id").asc)))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("id"), col("r_lex"), col("r_vec"), col("rrf_micro"),
        col("rn"))
      .orderBy("qid", "rn")
  }

  /** The vector CTEs are q110Sql's own text (the q113-over-q101 reuse
    * stance); the lexical CTEs are the q109 shape re-scoped to the
    * corpus/query split; fusion is a full outer join + integer RRF.
    */
  lazy val q115Sql: String = {
    val cut = q110Sql.lastIndexOf("\nSELECT qid, vec_id AS neighbor_id")
    require(cut >= 0, "q115Sql: q110Sql's final SELECT changed — update the split marker")
    val vecCtes = q110Sql.substring("WITH ".length, cut).trim.stripSuffix(",")
    """WITH ltoks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents WHERE doc_id >= 5),
      |ldls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM ltoks),
      |lst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CAST(len(tk) AS BIGINT)) AS DOUBLE) / count(*) AS avgdl FROM ltoks),
      |ltf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(tk) AS term FROM ltoks) GROUP BY doc_id, term),
      |ldfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM ltf GROUP BY term),
      |lidf AS (SELECT term,
      |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1e6, 0) AS BIGINT) AS idf_micro
      |  FROM ldfq, lst),
      |lqt AS (SELECT doc_id AS qid, string_split(lower(text), ' ') AS terms FROM documents WHERE doc_id < 5),
      |lqe AS (SELECT qid, unnest(terms) AS term FROM lqt),
      |lsc AS (SELECT lqe.qid, ltf.doc_id,
      |    CAST(round((CAST(idf_micro AS DOUBLE) / 1e6) *
      |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) * 1e6, 0) AS BIGINT) AS c
      |  FROM ltf JOIN lqe USING (term) JOIN lidf USING (term) JOIN ldls USING (doc_id), lst),
      |lag AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
      |  FROM lsc GROUP BY qid, doc_id),
      |lrk AS (SELECT qid, doc_id, score_micro,
      |    row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS rn
      |  FROM lag),
      |lex AS (SELECT qid, doc_id AS id, CAST(rn AS INT) AS r_lex FROM lrk WHERE rn <= 10),
      |""".stripMargin +
      vecCtes + ",\n" +
      """vecl AS (SELECT qid, vec_id AS id, CAST(rn AS INT) AS r_vec FROM fin WHERE rn <= 10),
        |fused AS (SELECT COALESCE(l.qid, v.qid) AS qid, COALESCE(l.id, v.id) AS id,
        |    l.r_lex, v.r_vec,
        |    CAST(COALESCE(1000000 // (60 + l.r_lex), 0) + COALESCE(1000000 // (60 + v.r_vec), 0) AS BIGINT) AS rrf_micro
        |  FROM lex l FULL OUTER JOIN vecl v ON l.qid = v.qid AND l.id = v.id),
        |fr AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, id) AS rn FROM fused)
        |SELECT qid, id, r_lex, r_vec, rrf_micro, CAST(rn AS INT) AS rn
        |FROM fr WHERE rn <= 10 ORDER BY qid, rn""".stripMargin
  }

  /** Multimodal near-dup dedup ([[graft.operators.Multimodal
    * .nearDupGroups]]): a synthetic media corpus plus pixel-perturbed
    * re-encoded copies of its images — different BYTES (exact dedup is
    * blind to them), near-identical PIXELS — resolved into groups via
    * decoded features → guarded feature-space pairing → connected
    * components. Generated-data flow (the q26 class): rows-only at the
    * driver, semantics pinned by OperatorsSpec's planted-twin golden
    * test.
    */
  def q116MediaNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Multimodal.syntheticCorpus(spark, 600)
    val copies = Multimodal.perturbImages(base, delta = 2)
    // 0.9999 (vs the operator's robust 0.9995 default): full recall on
    // the ±2 plant, and it keeps adjacent-tone audio from chaining into
    // high-diameter components that push CC into star-contraction
    // escalation (~2.5× the query runtime for no demo value)
    val grouped = Multimodal.nearDupGroups(base.unionAll(copies), threshold = 0.9999)
    grouped.groupBy(col("media_type"), col("group_sz"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        countDistinct(col("group")).cast("long").as("n_groups"))
      .orderBy("media_type", "group_sz")
  }

  /** Small-file compaction plan ([[graft.operators.Compaction.plan]])
    * over a deterministic synthetic listing derived from orders: one
    * "file" per (order month, orderkey mod 16) with an exact integer
    * byte size from the decimal price sum — both engines derive the
    * identical listing, so the whole planner (window cumsum → integer
    * bin division → per-bin rollup) hash-compares.
    */
  def q117CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val listing = t(spark, dir, "orders")
      .groupBy(
        date_format(col("o_orderdate"), "yyyy-MM").as("part"),
        (col("o_orderkey") % 16).cast("long").as("file_id"))
      .agg((sum((col("o_totalprice") * 100).cast("decimal(38,0)")) % 4000000L + 50000L)
        .cast("long").as("bytes"))
    graft.operators.Compaction.plan(listing, Seq("part"), "file_id", "bytes",
        targetBytes = 1000000L)
      .select(col("part"), col("file_id"), col("bytes"), col("bin"),
        col("bin_bytes"), col("bin_files"))
      .orderBy("part", "file_id")
  }

  val q117Sql: String =
    """WITH listing AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
      |         CAST(o_orderkey % 16 AS BIGINT) AS file_id,
      |         CAST(CAST(sum(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) % 4000000
      |              + 50000 AS BIGINT) AS bytes
      |  FROM orders GROUP BY 1, 2),
      |planned AS (
      |  SELECT part, file_id, bytes,
      |    CAST(COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000000 AS BIGINT) AS bin
      |  FROM listing)
      |SELECT part, file_id, bytes, bin,
      |  CAST(SUM(bytes) OVER (PARTITION BY part, bin) AS BIGINT) AS bin_bytes,
      |  CAST(COUNT(*) OVER (PARTITION BY part, bin) AS BIGINT) AS bin_files
      |FROM planned ORDER BY part, file_id""".stripMargin

  /** Gopher-style repetition quality filter
    * ([[graft.operators.TextAnalysis.repetitionFeatures]]): per-doc
    * duplicate-word / top-bigram / duplicate-trigram fractions and the
    * keep verdict. The Spark side is a zero-shuffle per-row HOF
    * pipeline; the oracle recomputes the same integer counts via
    * unnest+group (semantically identical, shape irrelevant for an
    * oracle).
    */
  def q118Repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionFeatures(t(spark, dir, "documents"), "doc_id")
      .orderBy("doc_id")

  val q118Sql: String =
    """WITH w AS (SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      |  FROM documents),
      |f AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words,
      |    CASE WHEN len(w) >= 2
      |      THEN [w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w)-1)]
      |      ELSE [] END AS big,
      |    CASE WHEN len(w) >= 3
      |      THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN generate_series(1, len(w)-2)]
      |      ELSE [] END AS tri
      |  FROM w),
      |bc AS (SELECT doc_id, g, count(*) AS c
      |  FROM (SELECT doc_id, unnest(big) AS g FROM f) GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS mc FROM bc GROUP BY 1),
      |m AS (SELECT f.doc_id, n_words,
      |    CASE WHEN n_words > 0
      |      THEN round((n_words - len(list_distinct(w))) / CAST(n_words AS DOUBLE), 6)
      |      ELSE 0.0 END AS dup_word_frac,
      |    CASE WHEN len(big) > 0
      |      THEN round(COALESCE(top.mc, 0) / CAST(len(big) AS DOUBLE), 6)
      |      ELSE 0.0 END AS top_bigram_frac,
      |    CASE WHEN len(tri) > 0
      |      THEN round((len(tri) - len(list_distinct(tri))) / CAST(len(tri) AS DOUBLE), 6)
      |      ELSE 0.0 END AS dup_trigram_frac
      |  FROM f LEFT JOIN top ON f.doc_id = top.doc_id)
      |SELECT doc_id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
      |  (dup_word_frac <= 0.55 AND top_bigram_frac <= 0.07
      |    AND dup_trigram_frac <= 0.05) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** ANN index QUALITY EVALUATION — recall@10 of the int8-quantized
    * index (q110) against exact brute-force ground truth (q17), per
    * query. The eval harness is as much a part of an ANN stack as the
    * index: a recall number is what justifies `candidates`/`nprobe`
    * knobs at 100 TB, where ground truth is only affordable on a query
    * SAMPLE like this one. Both legs are already hash-certified; the
    * oracle composes their twins, so the recall arithmetic (integer
    * overlap counts / k) is certified end-to-end too.
    */
  def q119AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = Queries.q17AnnCosineTopK(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
    val quant = q110QuantAnn(spark, dir)
      .select(col("qid"), col("neighbor_id").as("q_neighbor"))
    val overlap = exact.join(quant,
        exact("q_id") === quant("qid") && exact("neighbor_id") === quant("q_neighbor"))
      .groupBy(col("q_id")).agg(count(lit(1)).cast("long").as("n_overlap"))
    exact.select("q_id").distinct()
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / lit(10.0), 6).as("recall_at_10"))
      .orderBy("q_id")
  }

  def q119Sql(q17Sql: String, q110Sql: String): String =
    s"""WITH ex AS ($q17Sql),
       |qn AS ($q110Sql),
       |ov AS (SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM ex JOIN qn ON ex.q_id = qn.qid AND ex.neighbor_id = qn.neighbor_id
       |  GROUP BY ex.q_id)
       |SELECT q.q_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
       |  round(COALESCE(ov.n_overlap, 0) / 10.0, 6) AS recall_at_10
       |FROM (SELECT DISTINCT q_id FROM ex) q LEFT JOIN ov USING (q_id)
       |ORDER BY q_id""".stripMargin

  /** Fixed per-group quota sample
    * ([[graft.operators.Sampling.fixedQuotaPerGroup]]): exactly 7 docs
    * per source in md5-of-id order — the held-out eval-set construction
    * where fractional sampling would starve small groups. md5 hex order
    * is engine-portable, so selection AND rank hash-compare.
    */
  def q120QuotaSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.fixedQuotaPerGroup(
        t(spark, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", k = 7)
      .select(col("doc_id"), col("source"), col("rn").cast("int").as("rn"))
      .orderBy("source", "rn")

  val q120Sql: String =
    """WITH r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source, CAST(rn AS INT) AS rn
      |FROM r WHERE rn <= 7 ORDER BY source, rn""".stripMargin

  /** Versioned-table END-TO-END round trip
    * ([[graft.operators.TableVersions]]): orders lands in a fresh
    * versioned table as three txn-tagged append commits (one replayed —
    * must dedupe), the layout is compacted, and the LATEST version is
    * aggregated by order month. The oracle aggregates the orders table
    * directly — data-equality through the whole commit/replay/compact
    * machinery is exactly what the format must preserve. The result is
    * checkpointed so the temp table can be deleted before returning.
    */
  def q121VersionedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_v"
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    (0 until 3).foreach { i =>
      graft.operators.TableVersions.appendTxn(spark, root,
        orders.filter(pmod(col("o_orderkey"), lit(3)) === i), "q121", i.toLong)
    }
    // replayed micro-batch: exactly-once txn record makes it a no-op
    graft.operators.TableVersions.appendTxn(spark, root,
      orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), "q121", 1L)
    graft.operators.TableVersions.compact(spark, root, targetBytes = 8L << 20)
    val res = graft.operators.TableVersions.read(spark, root)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    // the checkpoint detached the plan from the temp files — reclaim them
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root).getParentFile)
    out.orderBy("month")
  }

  val q121Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Unicode/whitespace text normalization
    * ([[graft.operators.TextAnalysis.normalizeText]], backed by the
    * native [[graft.expressions.NfcNormalize]] expression). The corpus
    * is ASCII, so four Unicode rows are PLANTED identically in both
    * engines (combining-mark composition, Angstrom→Å singleton,
    * control-char strip, whitespace collapse) — the oracle's
    * `nfc_normalize` is utf8proc and Spark's is the JDK, so a
    * hash-green result certifies standard-conformant NFC cross-engine.
    */
  def q122Normalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = Seq(
      (100001L, "café"),
      (100002L, "Å unit"),
      (100003L, "tab\tand\nnew  lines"),
      (100004L, "bellchar ")
    ).toDF("doc_id", "text")
    TextAnalysis.normalizeText(
        t(spark, dir, "documents").select(col("doc_id"), col("text")).unionAll(planted),
        "doc_id")
      .orderBy("doc_id")
  }

  val q122Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (100001, 'cafe' || chr(769)),
      |    (100002, chr(8491) || ' unit'),
      |    (100003, 'tab' || chr(9) || 'and' || chr(10) || 'new  lines'),
      |    (100004, 'bell' || chr(7) || 'char ')) t(doc_id, text)),
      |n AS (SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
      |  FROM corpus)
      |SELECT doc_id, norm_text, (norm_text <> text) AS changed,
      |  CAST(length(norm_text) AS BIGINT) AS n_chars
      |FROM n ORDER BY doc_id""".stripMargin

  /** Versioned-table MUTATION path end-to-end
    * ([[graft.operators.TableVersions.deleteWhere]]/`optimizeZOrder`):
    * orders lands in a versioned table, gets Z-order-optimized on
    * o_orderkey, then a key RANGE is deleted with the stats-pruned
    * rewrite (only the files whose min/max admit the range are
    * touched — the GDPR-takedown shape). The latest version's monthly
    * aggregate must equal the oracle's plain `WHERE NOT BETWEEN` over
    * orders — certifying that optimize preserved every row and delete
    * removed exactly the range, whatever the file layout did.
    */
  def q123DeleteOptimize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_d"
    val tv = graft.operators.TableVersions
    tv.append(spark, root, t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")))
    tv.optimizeZOrder(spark, root, Seq("o_orderkey"), numFiles = 8)
    tv.deleteWhere(spark, root,
      col("o_orderkey").between(1000L, 50000L),
      bounds = Map("o_orderkey" -> (1000.0, 50000.0)))
    val res = tv.read(spark, root)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root).getParentFile)
    out.orderBy("month")
  }

  val q123Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM orders WHERE o_orderkey NOT BETWEEN 1000 AND 50000
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** CONTRASTIVE TRAINING TRIPLETS — the dataset-construction step on
    * top of q114's mining: per anchor, the nearest SAME-label corpus
    * vector is the positive (in-class nearest neighbor — the standard
    * choice when no labeled pairs exist) and the top-3 nearest
    * OTHER-label vectors are the hard negatives; one output row per
    * (anchor, negative_rank). ONE broadcast-anchor corpus scan computes
    * both rankings (two windows over the same pass, rank filters →
    * WindowGroupLimit); cosines 6dp-rounded with unique id tiebreaks,
    * so the triplet set is engine-exact.
    */
  def q124ContrastiveTriplets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val em = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val q = em.filter(col("vec_id") < 8)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"), col("emb").as("a_emb"))
    val scored = em.filter(col("vec_id") >= 8).crossJoin(broadcast(q))
      .withColumn("cosine", round(
        VectorOps.fastCosine(spark)(col("emb"), col("a_emb")), 6))
    val byAnchor = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val pos = scored.filter(col("label") === col("a_label"))
      .withColumn("rn", row_number().over(byAnchor)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id").as("positive_id"),
        col("cosine").as("pos_cosine"))
    val neg = scored.filter(col("label") =!= col("a_label"))
      .withColumn("rn", row_number().over(byAnchor)).filter(col("rn") <= 3)
      .select(col("anchor_id"), col("vec_id").as("negative_id"),
        col("cosine").as("neg_cosine"), col("rn").cast("int").as("neg_rank"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("positive_id"), col("pos_cosine"),
        col("negative_id"), col("neg_cosine"), col("neg_rank"))
      .orderBy("anchor_id", "neg_rank")
  }

  val q124Sql: String =
    """WITH em AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |a AS (SELECT vec_id AS anchor_id, label AS a_label, emb AS a_emb FROM em WHERE vec_id < 8),
      |s AS (SELECT a.anchor_id, a.a_label, c.vec_id, c.label,
      |        round(list_dot_product(c.emb, a.a_emb) /
      |          (sqrt(list_dot_product(c.emb, c.emb)) * sqrt(list_dot_product(a.a_emb, a.a_emb))), 6) AS cosine
      |      FROM (SELECT * FROM em WHERE vec_id >= 8) c CROSS JOIN a),
      |pos AS (SELECT anchor_id, vec_id AS positive_id, cosine AS pos_cosine,
      |          ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, vec_id ASC) AS rn
      |        FROM s WHERE label = a_label),
      |neg AS (SELECT anchor_id, vec_id AS negative_id, cosine AS neg_cosine,
      |          CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS neg_rank
      |        FROM s WHERE label <> a_label)
      |SELECT p.anchor_id, p.positive_id, p.pos_cosine,
      |       n.negative_id, n.neg_cosine, n.neg_rank
      |FROM (SELECT * FROM pos WHERE rn = 1) p
      |JOIN (SELECT * FROM neg WHERE neg_rank <= 3) n USING (anchor_id)
      |ORDER BY anchor_id, neg_rank""".stripMargin

  /** Versioned-table UPSERT (CDC apply) end-to-end
    * ([[graft.operators.TableVersions.upsert]]): orders lands
    * versioned, then a deterministic CDC batch — price corrections for
    * every 7th key plus brand-new synthetic orders — merges by key.
    * The latest version's aggregate must equal the oracle's replace-
    * and-union over the raw table: replaced keys carry their NEW
    * price exactly once, inserts appear, untouched rows are bit-equal.
    */
  def q125Upsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val root = java.nio.file.Files.createTempDirectory("graft_tv").toString + "/orders_u"
    val tv = graft.operators.TableVersions
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    tv.append(spark, root, orders)
    val updates = orders.filter(col("o_orderkey") % 7 === 3)
      .withColumn("o_totalprice",
        (col("o_totalprice") + lit(1000)).cast(DecimalType(12, 2)))
      .unionByName(orders.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          to_date(lit("1997-06-15")).as("o_orderdate"),
          lit(BigDecimal("123.45")).cast(DecimalType(12, 2)).as("o_totalprice")))
    tv.upsert(spark, root, updates, "o_orderkey")
    val res = tv.read(spark, root)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 2))).cast("double"), 4)
          .as("total_price"))
    val out = graft.CacheScope.trackCheckpoint(res.localCheckpoint(true))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root).getParentFile)
    out.orderBy("month")
  }

  val q125Sql: String =
    """WITH up AS (
      |  SELECT o_orderkey, o_orderdate,
      |    CAST(o_totalprice + 1000 AS DECIMAL(12,2)) AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, DATE '1997-06-15', CAST(123.45 AS DECIMAL(12,2))
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |merged AS (
      |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM up)
      |  UNION ALL SELECT * FROM up)
      |SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 4) AS total_price
      |FROM merged GROUP BY 1 ORDER BY month""".stripMargin

  /** Bloom-index POINT LOOKUPS ([[graft.operators.FileManifest
    * .collectBloom]]/`pointLookup`): build the per-file bloom index
    * over orders once, then resolve a handful of point keys — present
    * ones and absent ones — through it. The result must equal the
    * oracle's plain `WHERE o_orderkey IN (...)`: blooms may admit
    * false-positive FILES, never wrong ROWS (the exact filter runs on
    * the admitted files), and absent keys return nothing.
    */
  def q126BloomLookup(spark: SparkSession, dir: String): DataFrame = {
    val keys = Seq(7L, 355L, 1952L, 4000L, 999999999L) // last: absent at every SF
    val bloom = graft.operators.FileManifest
      .collectBloom(spark, s"$dir/orders.parquet", "o_orderkey", 200000L)
      .persist()
    val out = keys.map { k =>
      graft.operators.FileManifest.pointLookup(spark, bloom, "o_orderkey", lit(k))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    }.reduce(_ unionAll _)
    val res = graft.CacheScope.trackCheckpoint(out.localCheckpoint(true))
    bloom.unpersist(false)
    res.orderBy("o_orderkey")
  }

  val q126Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey IN (7, 355, 1952, 4000, 999999999)
      |ORDER BY o_orderkey""".stripMargin

  val q112Sql: String =
    """WITH qf AS (SELECT doc_id, source, text,
      |    string_split_regex(text, '\s+') AS words FROM documents),
      |s AS (SELECT doc_id, source,
      |    CAST(len(words) AS INT) AS n_words,
      |    CAST(length(text) AS DOUBLE) / greatest(len(words), 1) AS avg_word_len,
      |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
      |      / greatest(length(text), 1) AS punct_ratio,
      |    1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1) AS dup_word_ratio
      |  FROM qf),
      |sc AS (SELECT doc_id, source,
      |    round(greatest(0.0, least(1.0, 1.0
      |      - CASE WHEN n_words < 8 THEN 0.4 ELSE 0.0 END
      |      - CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 0.0 END
      |      - CASE WHEN dup_word_ratio > 0.7 THEN 0.3 ELSE 0.0 END
      |      - CASE WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 0.2 ELSE 0.0 END)), 4) AS score
      |  FROM s),
      |thr AS (SELECT source, round(quantile_cont(score, 0.25), 6) AS threshold
      |  FROM sc GROUP BY source)
      |SELECT sc.doc_id, sc.source, sc.score, thr.threshold
      |FROM sc JOIN thr USING (source)
      |WHERE sc.score >= thr.threshold ORDER BY sc.doc_id""".stripMargin
}
