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
}
