package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge into the two `private[sql]` members a v1 streaming Source
  * needs (the same access pattern Delta's DeltaSource uses from its
  * org.apache.spark.sql.delta package): re-wrap a lazily-planned batch
  * DataFrame's InternalRow RDD as a STREAMING frame, which is the
  * contract `Source.getBatch` must satisfy. Nothing materializes here —
  * `toRdd` is the physical plan's lazy RDD; the micro-batch executes it
  * when the sink runs.
  */
object StreamingFrameShim {
  def asStreaming(spark: SparkSession, df: DataFrame, schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  /** The inverse direction, for a v1 `Sink.addBatch`: re-wrap the
    * incremental execution's row RDD as a BATCH frame so regular batch
    * writers (e.g. a transactional table append) can consume it — the
    * `ForeachBatchSink` pattern. Lazy; the caller decides whether to
    * persist before multi-pass consumption.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
