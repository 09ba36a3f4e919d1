package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the shard-assembly step of an LLM
  * training pipeline: concatenate documents into fixed-budget training
  * sequences/shards without splitting documents. Greedy first-fit in a
  * deterministic document order: keep appending docs to the current
  * shard until the next one would overflow `budget`, then start a new
  * shard. A single document larger than the budget gets a shard of its
  * own (it is never split — chunking oversized docs is the tokenizer's
  * job upstream).
  *
  * Packing is inherently a sequential fold over the pack stream, so it
  * runs as a typed `flatMapGroups` per group key (one packing stream per
  * source/writer — exactly how production packers parallelize: shards
  * never span sources, and |group| is bounded by the corpus partitioning,
  * not the corpus). One shuffle on the group key; the fold itself is
  * O(|group|) with O(1) state (no growing accumulator).
  */
object Packing {

  final case class PackedDoc(group: String, doc_id: Long, n_tokens: Long,
      shard: Long, offset: Long)

  /** @param df        input with `groupCol` (string), `idCol` (long, the
    *                  deterministic pack order), `tokensCol` (long)
    * @param budget    max tokens per shard
    * @return one row per doc: (group, doc_id, n_tokens, shard, offset) —
    *         shard ids are per-group, offset is the doc's start position
    *         inside its shard
    */
  def greedyPack(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        // Iterator order after a shuffle is not defined — impose the pack
        // order here. Group size is a pack stream (bounded by upstream
        // sharding), so the in-memory sort is by design, like any
        // secondary-sort-free flatMapGroups.
        val docs = it.toArray.sortBy(_._2)
        val out = new Array[PackedDoc](docs.length)
        var shard = -1L
        var acc = 0L
        var i = 0
        while (i < docs.length) {
          val (_, id, tok) = docs(i)
          if (shard < 0 || acc + tok > budget) { shard += 1; acc = 0L }
          out(i) = PackedDoc(g, id, tok, shard, acc)
          acc += tok
          i += 1
        }
        out.iterator
      }
      .toDF()
  }

  /** Sliding-window CHUNKING — the tokenizer-side complement of
    * [[greedyPack]]: split each document into overlapping
    * `maxTokens`-token windows advancing by `stride` tokens (the
    * standard overflow-with-stride shape for long-document training and
    * embedding indexing: overlap = maxTokens − stride preserves context
    * across boundaries). Chunk i covers tokens [i·stride,
    * i·stride + maxTokens); windows start while i·stride < n, so the
    * final windows may be short but every token lands in ≥1 chunk and
    * no start position is ever beyond the text.
    *
    * Scale shape: chunks are computed PER ROW with higher-order
    * functions ([[Dedup.spanDedup]]'s machinery) — a narrow map, no
    * shuffle, one output row per chunk; at 100 TB this composes with a
    * downstream repartition-by-shard without ever materializing
    * per-token rows.
    *
    * Output: (id, chunk_idx, chunk_text, n_tokens).
    */
  def chunkWithStride(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "need 0 < stride <= maxTokens")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nChunks = when(n > 0, floor((n - lit(1)) / lit(stride.toDouble)).cast("long") + 1L)
      .otherwise(0L)
    val chunks = when(nChunks > 0,
      transform(sequence(lit(0L), nChunks - 1),
        i => struct(i.cast("int").as("chunk_idx"),
          array_join(slice(toks, (i * stride + 1).cast("int"), lit(maxTokens)), " ")
            .as("chunk_text"),
          least(n - i * stride, lit(maxTokens)).cast("long").as("n_tokens"))))
      .otherwise(array().cast("array<struct<chunk_idx:int,chunk_text:string,n_tokens:bigint>>"))
    df.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"), col("c.n_tokens").as("n_tokens"))
  }
}
