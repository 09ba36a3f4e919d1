package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual codec work (JPEG decode, audio resample, video frame
  * extraction) requires native libraries not present in this container —
  * those steps are STUBBED with deterministic fakes (clearly marked
  * below). Everything Spark-side is real and tested: the schema contract,
  * the batched `mapPartitions` execution shape (the Scala analogue of
  * `mapInPandas` — one iterator per partition, vectorizable), the
  * partition sizing, and the columnar metadata flow.
  *
  * Scale notes: media bytes never pass through a shuffle — decode is a
  * narrow map stage; only the (small) extracted features move on. Batch
  * size is the Parquet row-group/partition split, tuned with
  * `spark.sql.files.maxPartitionBytes` so a partition of ~128 MB of blobs
  * fits executor memory with decode workspace.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      media_type: String, // image | audio | video
      mime: String,
      width: Int, // images/video
      height: Int,
      duration_ms: Long, // audio/video
      sample_rate: Int // audio
  )

  final case class MediaRecord(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      payload_hash: Long,
      feature: Array[Float] // fixed 16-dim feature vector
  )

  /** STUB — deterministic fake "decode + feature extraction".
    * A real deployment swaps this body for the codec call (e.g. TwelveMonkeys
    * ImageIO / JavaCV); the signature, batching, and schema stay identical.
    * The fake derives a stable 16-dim feature from a rolling hash of the
    * payload so tests are reproducible and dedup-by-feature is exercised.
    */
  private[operators] def decodeAndFeaturize(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](16)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % 16) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: one partition = one batch (the
    * `mapInPandas` execution shape). The only non-expression operator in
    * the engine, as per SURVEY §2.10 — genuine per-partition imperative
    * work on opaque bytes.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { batch =>
      batch.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          media_type = r.meta.media_type,
          n_bytes = r.payload.length.toLong,
          payload_hash = java.util.Arrays.hashCode(r.payload).toLong,
          feature = decodeAndFeaturize(r.payload))
      }
    }
  }

  /** STUB image resize: real impl would re-encode; the fake keeps the
    * payload and rewrites metadata, preserving the schema contract.
    */
  def resize(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** STUB video frame sampling: emits one record per sampled frame index
    * with frame metadata; real impl would slice the container stream.
    */
  def frameSample(records: Dataset[MediaRecord], everyMs: Long): DataFrame = {
    val df = records.toDF()
    df.filter(col("meta.media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest((col("meta.duration_ms") / everyMs).cast("long") - 1, lit(0L)))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("frame_ts_ms"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        xxhash64(col("media_id"), col("frame_idx")).as("frame_payload_hash"))
  }

  /** Deterministic synthetic media corpus for tests/demos: payload bytes
    * derived from the id (stands in for real blobs read from object
    * storage).
    */
  def syntheticCorpus(spark: SparkSession, n: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (id % 193).toInt
      val payload = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      MediaRecord(id,
        MediaMeta(kind,
          kind match { case "image" => "image/jpeg"; case "audio" => "audio/wav"; case _ => "video/mp4" },
          width = if (kind != "audio") 64 + (id % 8).toInt * 16 else 0,
          height = if (kind != "audio") 48 + (id % 8).toInt * 12 else 0,
          duration_ms = if (kind != "image") 1000L + (id % 10) * 500 else 0L,
          sample_rate = if (kind == "audio") 16000 else 0),
        payload)
    }
  }
}
