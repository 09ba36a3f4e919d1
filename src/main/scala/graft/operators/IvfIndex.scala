package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path for similarity search alongside hyperplane LSH (VectorOps).
  *
  * Standard IVF structure (à la FAISS IVFFlat, re-expressed relationally):
  *  1. pick k centroids (deterministic sample of the corpus, optionally
  *     refined by Lloyd iterations — each iteration is one groupBy);
  *  2. assign every corpus vector to its nearest centroid (one narrow
  *     map with the broadcast centroid table) → the "inverted lists"
  *     are just a `cluster_id` column, physically co-located by
  *     repartition/bucketing on it;
  *  3. a query probes only the `nprobe` nearest clusters: candidate set
  *     = corpus rows whose cluster_id ∈ those, joined by cluster_id —
  *     an equi-join touching nprobe/k of the data instead of all of it.
  *
  * Everything is DataFrame ops: centroids live in a broadcast table, the
  * argmin is a per-row fold over the (small) centroid array, candidate
  * selection is an equi-join Catalyst can plan as broadcast or shuffle.
  */
object IvfIndex {

  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Deterministic centroid selection: the k corpus vectors with the
    * smallest xxhash64(id) (a seeded uniform sample without an RNG),
    * refined by `iters` Lloyd iterations (each: assign + mean).
    */
  def centroids(corpus: DataFrame, id: String, vec: String, k: Int, iters: Int = 2): DataFrame = {
    // Every Lloyd iteration re-executes the corpus plan (the argmin
    // assignment is an action via the centroid collect, plus the mean
    // groupBy): cache it once. For the residual-codebook call the input
    // is itself a derived assign+join — uncached, iters+1 full
    // recomputations of that join.
    val corpusC = corpus.cache()
    var cents = corpusC
      .withColumn("__h", xxhash64(col(id)))
      .orderBy(col("__h")).limit(k)
      .select(monotonically_increasing_id().as("cluster_id"), col(vec).as("centroid"))
    for (_ <- 0 until iters) {
      // Mean via posexplode + codegen'd hash-agg over |rows|·dims
      // exploded primitives. Measured FASTER than the
      // [[graft.expressions.VecSumAgg]] custom-Aggregator formulation at
      // these dims (1.8s vs 2.2s for the whole q28 at 128 dims) — the
      // Aggregator only wins when the dims explosion factor dominates
      // (thousands of dims); see VecSumAgg scaladoc.
      val means = assign(corpusC, cents, id, vec)
        .select(col("cluster_id"), posexplode(col(vec)))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster_id"), transform(col("pm"), x => x.getField("m")).as("new_centroid"))
      // A cluster that attracted no members has no mean and would vanish,
      // silently shrinking the index from k to k-1 lists (and the probe
      // math with it). Keep its previous centroid instead — the standard
      // empty-cluster fallback; it can re-acquire members next iteration.
      cents = cents.join(means, Seq("cluster_id"), "left")
        .select(col("cluster_id"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
    }
    cents
  }

  /** Deterministic pseudo-random centroids (seeded splitmix64 via
    * [[VectorOps.plane]], offset so they never coincide with the LSH
    * hyperplanes). This is the UNTRAINED index shape: in production IVF
    * the centroids are trained offline and are therefore always fixed
    * constants at query time — the query pipeline (assign → probe →
    * re-rank) never re-trains. Freezing them as deterministic literals
    * makes that query pipeline exactly reproducible across engines,
    * which is what lets the q28/q64 oracles hash-compare it; Lloyd
    * training ([[centroids]]) remains the index-BUILD path and is
    * spec-pinned by recall (ChecksDimsSkewSpec).
    */
  def frozenCentroids(k: Int, dims: Int): Seq[(Int, Array[Double])] =
    (0 until k).map(c => (c, VectorOps.plane(c + 4096, dims)))

  /** Frozen residual codebook (offset again; scaled toward the residual
    * magnitude regime — the scale only shifts which codeword wins, never
    * portability, since both engines consume the same printed literals).
    */
  def frozenCodebook(size: Int, dims: Int): Seq[(Int, Array[Double])] =
    (0 until size).map(c => (c, VectorOps.plane(c + 8192, dims).map(_ * 0.2)))

  /** Per-centroid (score, cid) structs for an argmin over constant
    * centroids: score = |c|² − 2⟨a,c⟩ (the |a|² term is common to every
    * centroid and drops out of the argmin — the FAISS trick). |c|² is
    * folded driver-side with the same left-to-right sum both engines'
    * SQL twins print, so scores are bit-identical cross-engine. Each
    * score is one codegen'd [[graft.expressions.VecDot]] against a
    * constant array.
    */
  private def centScores(vecCol: org.apache.spark.sql.Column,
      centArr: Seq[(Long, Array[Double])]): Seq[org.apache.spark.sql.Column] =
    centArr.map { case (cid, c) =>
      val n2 = c.map(x => x * x).sum
      struct(
        (lit(n2) - lit(2.0) * call_function("vec_dot", vecCol, typedLit(c))).as("d"),
        lit(cid).as("cid"))
    }

  /** Nearest-centroid assignment against a literal centroid table:
    * `least()` over the [[centScores]] structs — the whole assignment
    * runs inside one whole-stage-codegen'd scan with no shuffle. (The
    * previous interpreted fold re-evaluated a zip_with+aggregate sqDist
    * twice per centroid per row — the classic HOF re-evaluation trap —
    * and needed an id-join to recover the corpus columns.) Ties in
    * score break toward the smaller cluster_id.
    */
  def assignWith(corpus: DataFrame, centArr: Seq[(Long, Array[Double])],
      vec: String): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    corpus.withColumn("cluster_id",
      least(centScores(col(vec), centArr).toIndexedSeq: _*).getField("cid"))
  }

  /** Assignment against a trained centroid DataFrame: collected (k rows,
    * small by construction) and embedded as literals via [[assignWith]].
    */
  def assign(corpus: DataFrame, cents: DataFrame, id: String, vec: String): DataFrame = {
    val centArr = cents.select(col("cluster_id"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    assignWith(corpus, centArr, vec)
  }

  /** Per-query nprobe nearest clusters from literal centroids: sort the
    * [[centScores]] structs in-row (array_sort on (score, cid) structs —
    * no shuffle, no window) and explode the first nprobe.
    */
  private def probeWith(queries: DataFrame, centArr: Seq[(Long, Array[Double])],
      qid: String, qvec: String, nprobe: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(queries.sparkSession)
    queries
      .withColumn("__p",
        explode(slice(array_sort(array(centScores(col(qvec), centArr).toIndexedSeq: _*)),
          1, nprobe)))
      .select(col(qid), col(qvec), col("__p").getField("cid").as("cluster_id"))
  }

  /** IVF cosine top-k over a FROZEN (offline-trained / deterministic)
    * centroid table — the production query path: assignment and probe
    * are pure constant math, the candidate fetch is a cluster_id
    * equi-join touching nprobe/k of the corpus, and only candidates pay
    * the exact cosine. Fully portable → oracle-certified (q28).
    */
  def cosineTopKFrozen(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      centArr: Seq[(Int, Array[Double])],
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec",
      nprobe: Int = 4): DataFrame = {
    val cl = centArr.map { case (c, a) => (c.toLong, a) }
    val corpusAssigned = assignWith(corpus, cl, vec)
    val qCents = probeWith(queries, cl, qid, qvec, nprobe)
    corpusAssigned.join(qCents, Seq("cluster_id"))
      .withColumn("cosine", VectorOps.fastCosine(spark)(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))
  }

  /** IVF cosine top-k: probe the nprobe nearest clusters per query, exact
    * cosine re-rank within candidates only.
    */
  def cosineTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec",
      nClusters: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = centroids(corpus, id, vec, nClusters).cache()
    val corpusAssigned = assign(corpus, cents, id, vec)

    // query-side: rank clusters per query, keep nprobe nearest
    val qCents = queries.crossJoin(broadcast(cents))
      .withColumn("d", sqDist(col(qvec), col("centroid")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("d").asc, col("cluster_id").asc)))
      .filter(col("crn") <= nprobe)
      .select(col(qid), col(qvec), col("cluster_id"))

    corpusAssigned.join(qCents, Seq("cluster_id"))
      .withColumn("cosine", VectorOps.fastCosine(spark)(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))
  }

  // ---------------------------------------------------------------------
  // Residual quantization (IVF-RQ, à la FAISS IVF+RQ/PQ): compress each
  // vector to (cluster_id, code) where code indexes a second-level
  // codebook trained on the RESIDUALS v − centroid. The index table
  // carries ~16 bytes/vector instead of 8·dims — at 100 TB the probe
  // scan reads the code column only; full vectors are fetched for just
  // the refine·k survivors per query.
  // ---------------------------------------------------------------------

  /** Residuals of assigned corpus rows: (id, list_id, rvec). */
  private def residuals(corpus: DataFrame, cents: DataFrame, id: String, vec: String): DataFrame =
    assign(corpus, cents, id, vec)
      .join(broadcast(cents), "cluster_id")
      .select(col(id), col("cluster_id").as("list_id"),
        zip_with(col(vec), col("centroid"), (x, c) => x - c).as("rvec"))

  /** Second-level codebook: k-means over the residuals (reuses the
    * level-1 machinery — residual k-means IS k-means on the rvec frame).
    */
  def residualCodebook(corpus: DataFrame, cents: DataFrame, id: String, vec: String,
      codebookSize: Int, iters: Int = 2): DataFrame =
    centroids(residuals(corpus, cents, id, vec), id, "rvec", codebookSize, iters)
      .withColumnRenamed("cluster_id", "code")
      .withColumnRenamed("centroid", "codeword")
  // (centroids caches its input, so the residual frame materializes once
  // for the codebook's Lloyd iterations rather than re-running the
  // assign+join per pass.)

  /** Compressed index: (id, cluster_id, code). This is the table that
    * lives at scale — the full vectors stay in the corpus table and are
    * only joined back for the final re-rank.
    */
  def encode(corpus: DataFrame, cents: DataFrame, codebook: DataFrame,
      id: String, vec: String): DataFrame = {
    val r = residuals(corpus, cents, id, vec)
    assign(r, codebook.select(col("code").as("cluster_id"), col("codeword").as("centroid")),
        id, "rvec")
      .select(col(id), col("list_id").as("cluster_id"), col("cluster_id").as("code"))
  }

  /** All |cents|×|codebook| reconstructed vectors centroid+codeword —
    * small by construction, broadcast to score encoded rows without
    * touching original vectors.
    */
  def reconstructions(cents: DataFrame, codebook: DataFrame): DataFrame =
    cents.crossJoin(codebook)
      .select(col("cluster_id"), col("code"),
        zip_with(col("centroid"), col("codeword"), (c, w) => c + w).as("recon"))

  /** IVF-RQ cosine top-k: probe nprobe clusters reading ONLY the
    * compressed codes, rank candidates by approximate cosine against the
    * broadcast reconstructions, then exact-re-rank the top refine·k with
    * the true vectors. Recall is governed by (nprobe, refine); bytes
    * scanned per probe by codebookSize (fixed 16B/row here).
    */
  def rqCosineTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec",
      nClusters: Int = 16, nprobe: Int = 4, codebookSize: Int = 16, refine: Int = 4): DataFrame = {
    val cents = centroids(corpus, id, vec, nClusters).cache()
    // materialize the residual frame ONCE: the codebook's Lloyd passes
    // and the encode step both consume it, and the two call sites would
    // otherwise each rebuild the assign+join (lambda-bearing plans defeat
    // cache-manager matching across separately-constructed copies)
    val r = residuals(corpus, cents, id, vec).cache()
    val codebook = centroids(r, id, "rvec", codebookSize)
      .withColumnRenamed("cluster_id", "code")
      .withColumnRenamed("centroid", "codeword")
      .cache()
    val enc = assign(r, codebook.select(col("code").as("cluster_id"), col("codeword").as("centroid")),
        id, "rvec")
      .select(col(id), col("list_id").as("cluster_id"), col("cluster_id").as("code"))
    val recon = reconstructions(cents, codebook)

    val qCents = queries.crossJoin(broadcast(cents))
      .withColumn("d", sqDist(col(qvec), col("centroid")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("d").asc, col("cluster_id").asc)))
      .filter(col("crn") <= nprobe)
      .select(col(qid), col(qvec), col("cluster_id"))

    // approximate stage: codes only + broadcast recon table
    val approx = enc.join(qCents, Seq("cluster_id"))
      .join(broadcast(recon), Seq("cluster_id", "code"))
      .withColumn("approx_cos", VectorOps.fastCosine(spark)(col("recon"), col(qvec)))
      .withColumn("arn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("approx_cos").desc, col(id).asc)))
      .filter(col("arn") <= k * refine)
      .select(col(qid), col(qvec), col(id))

    // exact re-rank: fetch true vectors for the survivors only
    approx.join(corpus.select(col(id), col(vec)), Seq(id))
      .withColumn("cosine", VectorOps.fastCosine(spark)(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))
  }

  /** IVF-RQ cosine top-k over FROZEN centroids + codebook — the
    * production query path for the compressed index (both levels are
    * trained offline; at query time they are constants). Encode:
    * rvec = v − centroid (element-wise against the literal row picked by
    * `element_at`), code = argmin codeword; the probe reads ONLY
    * (id, cluster_id, code); approximate scores come from the
    * reconstruction centroid+codeword computed from literals; the true
    * vectors are joined back for just the refine·k survivors. Every
    * arithmetic step is element-wise or a sequential-fold dot product,
    * so the DuckDB twin reproduces it bit-for-bit → oracle (q64).
    */
  def rqCosineTopKFrozen(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
      centArr: Seq[(Int, Array[Double])], codeArr: Seq[(Int, Array[Double])],
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec",
      nprobe: Int = 4, refine: Int = 4): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val cl = centArr.map { case (c, a) => (c.toLong, a) }
    val wl = codeArr.map { case (c, a) => (c.toLong, a) }
    val centMat = centArr.sortBy(_._1).map(_._2).toArray
    val codeMat = codeArr.sortBy(_._1).map(_._2).toArray

    // encode: cluster assignment, then codeword argmin over the residual
    val cent = element_at(typedLit(centMat), (col("cluster_id") + 1).cast("int"))
    val enc = assignWith(corpus, cl, vec)
      .withColumn("rvec", zip_with(col(vec), cent, (x, c) => x - c))
      .withColumn("code", least(centScores(col("rvec"), wl).toIndexedSeq: _*).getField("cid"))
      .select(col(id), col("cluster_id"), col("code"))

    val qCents = probeWith(queries, cl, qid, qvec, nprobe)

    // approximate stage: codes only; recon = centroid + codeword literals
    val recon = zip_with(
      element_at(typedLit(centMat), (col("cluster_id") + 1).cast("int")),
      element_at(typedLit(codeMat), (col("code") + 1).cast("int")),
      (c, w) => c + w)
    val approx = enc.join(qCents, Seq("cluster_id"))
      .withColumn("approx_cos", VectorOps.fastCosine(spark)(recon, col(qvec)))
      .withColumn("arn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("approx_cos").desc, col(id).asc)))
      .filter(col("arn") <= k * refine)
      .select(col(qid), col(qvec), col(id))

    // exact re-rank: fetch true vectors for the survivors only
    approx.join(corpus.select(col(id), col(vec)), Seq(id))
      .withColumn("cosine", VectorOps.fastCosine(spark)(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))
  }
}
