package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, Row, SQLContext}

import graft.operators.TableVersions

/** SQL UPDATE / MERGE INTO / arbitrary-predicate DELETE for catalog
  * tables, via Spark's DELTA-BASED row-level operation protocol
  * (`SupportsRowLevelOperations` + `SupportsDelta` — the Iceberg
  * merge-on-read architecture):
  *
  * {{{
  *   UPDATE graft.db.t SET v = v + 1 WHERE k % 7 = 0
  *   MERGE INTO graft.db.t USING src ON t.k = src.k
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *   DELETE FROM graft.db.t WHERE k % 10 = 3   -- untranslatable filter
  * }}}
  *
  * HOW IT SCALES: Spark reads the table through this operation's scan
  * (each row carrying its `(__graft_file, __graft_pos)` identity — the
  * rowId, Iceberg's `_file`/`_pos` shape) and hands the connector ONLY
  * the changed rows: `delete(id)` / `insert(row)` callbacks per task
  * (updates are split — `representUpdateAsDeleteAndInsert`). Each task
  * SPILLS its tombstone ids and insert rows as parquet under
  * `_sqltmp/` on the table's own storage (never through the driver);
  * the driver-side commit then reuses the format's existing machinery:
  * tombstones merge into a deletion-vector sidecar under the
  * `maxDvFraction` guard (a CDC-sized UPDATE commits O(changed rows)
  * — merge-on-read) with the touched-file REWRITE fallback above it,
  * inserts restage through the partitioned write path, and the whole
  * statement is ONE atomic version under the DV/rewrite conflict
  * rules ([[TableVersions.applySqlDelta]]).
  *
  * Spills are written with Spark's own `ParquetWriteSupport` (the
  * exact InternalRow encoding the session writes elsewhere), and the
  * commit reads ONLY the files named in the tasks' commit messages —
  * a zombie speculative attempt's spill is ignored, then swept with
  * the staging dir.
  */
private[sources] object GraftRowLevel {

  private[sources] val DeleteSpillSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** A parquet spill writer for InternalRows in `schema` — explicit
    * codec settings so the spill format never depends on session conf
    * reaching the executor.
    */
  private[sources] def spillWriter(base: Configuration, path: Path,
      schema: StructType): ParquetWriter[InternalRow] = {
    val c = new Configuration(base)
    ParquetWriteSupport.setSchema(schema, c)
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.fieldId.write.enabled", "false")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    new SpillBuilder(path).withConf(c).build()
  }

  private class SpillBuilder(path: Path)
      extends ParquetWriter.Builder[InternalRow, SpillBuilder](path) {
    override def self(): SpillBuilder = this
    override def getWriteSupport(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}

private[sources] class GraftRowLevelOperation(root: String,
    st: TableVersions.CommitState, logical: StructType,
    cmd: RowLevelOperation.Command,
    pushed: Option[TableVersions.PushedListing] = None)
    extends RowLevelOperation with SupportsDelta {

  // the scan builder below has its own `pushed: Array[Filter]`
  private val pushedL = pushed

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(TableVersions.RowIdFileCol),
    Expressions.column(TableVersions.RowIdPosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"graft-table $cmd"

  /** The operation's read: snapshot rows + row identity. Filters are
    * recorded for IO pruning inside the inner plan and ALL declared
    * unhandled (Spark re-applies them — the push is pure optimization,
    * same stance as the catalog's normal scan).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private val full = StructType(logical.fields ++ Seq(
        StructField(TableVersions.RowIdFileCol, StringType, nullable = false),
        StructField(TableVersions.RowIdPosCol, LongType, nullable = false)))
      private var pushed: Array[Filter] = Array.empty
      private var required: Option[StructType] = None

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(f => GraftCatalog.translate(f).isDefined)
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = Some(requiredSchema)

      override def build(): Scan = new V1Scan {
        private val out = required.getOrElse(full)
        override def readSchema(): StructType = out
        override def toV1TableScan[T <: BaseRelation with TableScan](
            ctx: SQLContext): T = {
          val filters = pushed.toSeq
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = out
            override def sizeInBytes: Long = pushedL match {
              case Some(l) => l.sizeEstimate(ctx.sparkSession)
              case None => st.files.map(_.bytes).sum
            }
            override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
              // pushed snapshots serve the row-level read through the
              // checkpoint dataset (file pruning inside the distributed
              // read); the listing never materializes on the driver
              var df = pushedL match {
                case Some(l) => TableVersions.readPushedWithRowId(ctx.sparkSession, root, l)
                case None => TableVersions.readStateWithRowId(ctx.sparkSession, root, st)
              }
              filters.flatMap(GraftCatalog.translate).foreach(c => df = df.filter(c))
              df.select(out.fieldNames.toIndexedSeq.map(col): _*).rdd
            }
          }.asInstanceOf[T]
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(root, st, logical, cmd, info, pushedL)
    }
}

/** One SQL statement's write: task spills + a driver commit through
  * [[TableVersions.applySqlDelta]].
  */
private[sources] class GraftDeltaWrite(root: String, st: TableVersions.CommitState,
    logical: StructType, cmd: RowLevelOperation.Command,
    info: LogicalWriteInfo,
    pushed: Option[TableVersions.PushedListing] = None) extends DeltaWrite {

  private val staging = s"$root/_sqltmp/${java.util.UUID.randomUUID()}"

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {

    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory = {
      val spark = SparkSession.active
      import scala.jdk.CollectionConverters._
      val confPairs = spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toSeq
      new GraftDeltaWriterFactory(confPairs, staging, info.schema())
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val msgs = messages.collect { case m: GraftSpillMessage => m }
      val delFiles = msgs.flatMap(_.deleteFiles).toSeq
      val insFiles = msgs.flatMap(_.insertFiles).toSeq
      try {
        val victims =
          if (delFiles.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              GraftRowLevel.DeleteSpillSchema)
          else spark.read.schema(GraftRowLevel.DeleteSpillSchema).parquet(delFiles: _*)
        val inserts =
          if (insFiles.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row], info.schema())
          else spark.read.schema(info.schema()).parquet(insFiles: _*)
        if (delFiles.nonEmpty || insFiles.nonEmpty) {
          TableVersions.applySqlDelta(spark, root, st, victims, inserts, s"SQL $cmd",
            pushed = pushed)
          ()
        }
      } finally cleanup(spark)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanup(SparkSession.active)

    private def cleanup(spark: SparkSession): Unit = {
      val p = new Path(staging)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      ()
    }
  }
}

private[sources] case class GraftSpillMessage(deleteFiles: Seq[String],
    insertFiles: Seq[String]) extends WriterCommitMessage

private[sources] class GraftDeltaWriterFactory(confPairs: Seq[(String, String)],
    staging: String, insertSchema: StructType) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private lazy val conf = {
        val c = new Configuration(false)
        confPairs.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val delPath = new Path(s"$staging/del/p$partitionId-t$taskId.parquet")
      private val insPath = new Path(s"$staging/ins/p$partitionId-t$taskId.parquet")
      private var del: ParquetWriter[InternalRow] = _
      private var ins: ParquetWriter[InternalRow] = _

      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        if (del == null)
          del = GraftRowLevel.spillWriter(conf, delPath, GraftRowLevel.DeleteSpillSchema)
        del.write(id)
      }

      override def insert(row: InternalRow): Unit = {
        if (ins == null) ins = GraftRowLevel.spillWriter(conf, insPath, insertSchema)
        ins.write(row)
      }

      // unreachable with representUpdateAsDeleteAndInsert=true; safe anyway
      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        delete(meta, id); insert(row)
      }

      override def commit(): WriterCommitMessage = {
        close()
        GraftSpillMessage(
          if (del != null) Seq(delPath.toString) else Nil,
          if (ins != null) Seq(insPath.toString) else Nil)
      }

      override def abort(): Unit = {
        close()
        val fs = delPath.getFileSystem(conf)
        fs.delete(delPath, false)
        fs.delete(insPath, false)
        ()
      }

      override def close(): Unit = {
        if (del != null) del.close()
        if (ins != null) ins.close()
      }
    }
}
