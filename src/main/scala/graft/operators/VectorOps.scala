package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`/`Array[Double]`).
  *
  * Two tiers, per the training-data-pipeline requirement:
  *  - [[cosineTopK]] — brute-force exact cosine top-k: broadcast the query
  *    set, scan the corpus once, per-partition top-k (WindowGroupLimit),
  *    no corpus shuffle. Exact; O(|corpus|·|queries|·dim) — the baseline
  *    and the right answer when |queries| is small.
  *  - [[lshBucketed]] / [[cosineLshTopK]] — random-hyperplane LSH: each
  *    vector gets a `numBits`-bit signature (sign of dot product with
  *    deterministic pseudo-random hyperplanes); candidates come from
  *    multi-probe equi-joins on signature bands. Approximate; corpus
  *    shuffles once per table on the bucket key — the 100 TB path.
  *
  * All vector math is native higher-order-function folds (zip_with +
  * aggregate) — codegen-adjacent, no UDFs, executors never materialize
  * anything but the rows they own.
  */
object VectorOps {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x * y)
      .pipe(z => aggregate(z, lit(0.0), (acc, x) => acc + x))

  private implicit class Piper[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k.
    *
    * @param corpus (id, vec) rows; vec: array<double>
    * @param queries (qid, qvec) rows — must be small enough to broadcast
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec"): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 folded into [-1, 1). Stable across sessions — signatures are
    * reproducible, which real pipelines need for incremental indexing.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2000001L)) - lit(1000000L)).cast("double") / lit(1000000.0)

  /** numBits-bit hyperplane signature of a vector column. Bit p = sign of
    * ⟨vec, plane_p⟩. Computed as one fold per bit over the vector indices.
    */
  def hyperplaneSignature(vec: Column, numBits: Int = 16): Column = {
    val bits = (0 until numBits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Attach LSH bucket keys: the signature split into `bands` contiguous
    * bit-groups, exploded to (band, bucket) rows. Vectors sharing any
    * band bucket are near-duplicate candidates.
    */
  def lshBucketed(df: DataFrame, vec: String, numBits: Int = 16, bands: Int = 4): DataFrame = {
    require(numBits % bands == 0)
    val bitsPerBand = numBits / bands
    val mask = (1L << bitsPerBand) - 1
    df.withColumn("sig", hyperplaneSignature(col(vec), numBits))
      .withColumn("bb", explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask)).as("bucket"))): _*)))
      .withColumn("band", col("bb.band"))
      .withColumn("bucket", col("bb.bucket"))
      .drop("bb")
  }

  /** Approximate cosine top-k via LSH candidates: equi-join on
    * (band, bucket), exact cosine re-rank on candidates only. Recall is
    * governed by numBits/bands (more bands → more probes → higher recall).
    */
  def cosineLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec", qid: String = "qid", qvec: String = "qvec",
      numBits: Int = 16, bands: Int = 4): DataFrame = {
    val c = lshBucketed(corpus, vec, numBits, bands)
      .select(col("band"), col("bucket"), col(id), col(vec))
    val q = lshBucketed(queries, qvec, numBits, bands)
      .select(col("band"), col("bucket"), col(qid), col(qvec))
    c.join(q, Seq("band", "bucket"))
      .select(col(qid), col(id), col(vec), col(qvec)).distinct()
      .withColumn("cosine", cosine(col(vec), col(qvec)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(id).asc)))
      .filter(col("rn") <= k)
      .select(col(qid), col(id).as("neighbor_id"), col("cosine"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH buckets → bucket-local
    * pairing → exact cosine ≥ threshold. The pairing join shuffles on the
    * bucket key only.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numBits: Int = 16, bands: Int = 4): DataFrame = {
    val b = lshBucketed(df, vecCol, numBits, bands)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b")).distinct()
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
