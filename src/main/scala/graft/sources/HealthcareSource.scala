package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gen.{EhrRecord, HealthcareGenerator, InsuranceClaim, PatientVitals}

/** The synthetic healthcare generator (SURVEY §2.1 S7) as a first-class
  * **DataSource V2 table**:
  *
  * {{{
  *   spark.read.format("healthcare-gen")        // DataSourceRegister short name
  *     .option("type", "vitals")                // vitals | claims | ehr
  *     .option("n", 100000)                     // rows
  *     .option("seed", 42).option("partitions", 32)
  *     .load()
  * }}}
  *
  * Why a connector and not just `spark.range(n).map(...)`: the V2
  * surface is what a production source (BigQuery, Pub/Sub Lite, an
  * internal feed) plugs into, and it gives Catalyst real handles —
  *
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the scan
  *    serializes ONLY the requested fields into InternalRows; `explain`
  *    shows the narrowed ReadSchema, and a `select(patient_id)` never
  *    materializes the 8 other columns (for wide/nested records — EHR's
  *    lab-results map — that's most of the row's bytes).
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparisons and
  *    IN/IS NULL on top-level columns evaluate inside the reader;
  *    accepted filters are removed from the Spark-side plan entirely
  *    (no residual Filter node), so `heart_rate > 150` ships only
  *    matching rows out of the scan — the DSv2 contract a pruning
  *    object store or index-backed source exploits.
  *  - **Deterministic splitting**: `n` rows split into `partitions`
  *    ranges; every row is generated from `(seed, rowId)` alone
  *    ([[HealthcareGenerator]]'s per-row RNG), so results are identical
  *    under any parallelism — the property that makes a generated table
  *    usable in golden tests at any cluster size.
  *
  * Scale: a pure compute source — no driver state, no shuffle; 100 TB of
  * synthetic load = more partitions, nothing else changes.
  */
class HealthcareSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "healthcare-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HealthcareSource.schemaFor(Option(options.get("type")).getOrElse("vitals"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HealthcareTable(new CaseInsensitiveStringMap(properties))
}

object HealthcareSource {
  private[sources] val vitalsEnc = ExpressionEncoder[PatientVitals]()
  private[sources] val claimsEnc = ExpressionEncoder[InsuranceClaim]()
  private[sources] val ehrEnc = ExpressionEncoder[EhrRecord]()

  def schemaFor(tpe: String): StructType = tpe match {
    case "vitals" => vitalsEnc.schema
    case "claims" => claimsEnc.schema
    case "ehr"    => ehrEnc.schema
    case other    => throw new IllegalArgumentException(
      s"healthcare-gen: unknown type '$other' (vitals|claims|ehr)")
  }
}

private[sources] class HealthcareTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  private val tpe = Option(options.get("type")).getOrElse("vitals")
  override def name(): String = s"healthcare_gen_$tpe"
  override def schema(): StructType = HealthcareSource.schemaFor(tpe)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new HealthcareScanBuilder(tpe,
      Option(options.get("n")).map(_.toLong).getOrElse(1000L),
      Option(options.get("seed")).map(_.toLong).getOrElse(42L),
      // a non-positive partitions option would make the range stride
      // degenerate (n single-row partitions); clamp loudly instead
      math.max(1, Option(options.get("partitions")).map(_.toInt).getOrElse(8)))
}

private[sources] class HealthcareScanBuilder(tpe: String, n: Long, seed: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val fullSchema = HealthcareSource.schemaFor(tpe)
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accept filters this source can evaluate exactly in the reader:
    * comparisons / IN / IS (NOT) NULL over top-level atomic columns.
    * Everything else stays Spark-side (returned as residual).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val atomic = fullSchema.fields
      .filter(f => f.dataType == StringType || f.dataType == IntegerType || f.dataType == DoubleType)
      .map(_.name).toSet
    def supported(f: Filter): Boolean = f match {
      case EqualTo(a, _) => atomic(a)
      case GreaterThan(a, _) => atomic(a)
      case GreaterThanOrEqual(a, _) => atomic(a)
      case LessThan(a, _) => atomic(a)
      case LessThanOrEqual(a, _) => atomic(a)
      case In(a, _) => atomic(a)
      case IsNull(a) => atomic(a)
      case IsNotNull(a) => atomic(a)
      case _ => false
    }
    val (ok, residual) = filters.partition(supported)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (n + partitions - 1) / partitions)
      (0L until n by per).map(s => HealthcareRange(s, math.min(s + per, n)): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new HealthcareReaderFactory(tpe, seed, fullSchema, required, pushed)
  }
}

private[sources] case class HealthcareRange(start: Long, end: Long) extends InputPartition

private[sources] class HealthcareReaderFactory(
    tpe: String, seed: Long, fullSchema: StructType, required: StructType, pushed: Array[Filter])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val HealthcareRange(start, end) = p.asInstanceOf[HealthcareRange]
    val gen = new HealthcareGenerator(seed)
    // serialize the full record once per row, evaluate pushed filters on
    // it, then copy only the required ordinals into the output row
    val (enc, make): (ExpressionEncoder[_], Long => Any) = tpe match {
      case "vitals" => (HealthcareSource.vitalsEnc, gen.vitals _)
      case "claims" => (HealthcareSource.claimsEnc, gen.claim _)
      case "ehr"    => (HealthcareSource.ehrEnc, gen.ehr _)
    }
    val ser = enc.asInstanceOf[ExpressionEncoder[Any]].createSerializer()
    val fullIdx = fullSchema.fieldNames.zipWithIndex.toMap
    val outOrdinals = required.fields.map(f => (fullIdx(f.name), f.dataType))
    val eval = HealthcareFilterEval(fullSchema, pushed)

    new PartitionReader[InternalRow] {
      private var id = start - 1
      private var current: InternalRow = _
      override def next(): Boolean = {
        while ({ id += 1; id < end }) {
          // copy: the encoder serializer reuses its UnsafeRow buffer per
          // call; the UTF8String/array refs we hand out must not mutate
          val full = ser(make(id)).copy()
          if (eval(full)) {
            val out = new Array[Any](outOrdinals.length)
            var i = 0
            while (i < outOrdinals.length) {
              val (ord, dt) = outOrdinals(i)
              out(i) = if (full.isNullAt(ord)) null else full.get(ord, dt)
              i += 1
            }
            current = InternalRow.fromSeq(out.toIndexedSeq)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Evaluates pushed V1 filters against the full InternalRow. Only the
  * filter shapes accepted in `pushFilters` reach here.
  */
private[sources] case class HealthcareFilterEval(schema: StructType, filters: Array[Filter]) {
  private val idx = schema.fieldNames.zipWithIndex.toMap
  private def value(row: InternalRow, attr: String): Any = {
    val i = idx(attr)
    if (row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case IntegerType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case dt: DataType => row.get(i, dt)
    }
  }
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    // Strings compare via UTF8String's UTF-8 binary ordering — the order
    // Spark itself uses — NOT java.lang.String.compareTo (UTF-16 code
    // units), which diverges on supplementary-plane code points. Accepted
    // filters are REMOVED from the Spark plan, so this must match exactly.
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case (x: Int, y: Number) => java.lang.Double.compare(x.toDouble, y.doubleValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: UTF8String, y: String) => x.compareTo(UTF8String.fromString(y))
    case _ => throw new IllegalArgumentException(s"healthcare-gen: can't compare $a to $b")
  }
  def apply(row: InternalRow): Boolean = filters.forall {
    case EqualTo(a, v) => val x = value(row, a); x != null && cmp(x, v) == 0
    case GreaterThan(a, v) => val x = value(row, a); x != null && cmp(x, v) > 0
    case GreaterThanOrEqual(a, v) => val x = value(row, a); x != null && cmp(x, v) >= 0
    case LessThan(a, v) => val x = value(row, a); x != null && cmp(x, v) < 0
    case LessThanOrEqual(a, v) => val x = value(row, a); x != null && cmp(x, v) <= 0
    // NULLs in the IN list can never equal a non-null row value (standard
    // IN-with-null semantics for the satisfied branch) — drop them rather
    // than letting cmp(x, null) throw.
    case In(a, vs) =>
      val x = value(row, a); x != null && vs.exists(v => v != null && cmp(x, v) == 0)
    case IsNull(a) => value(row, a) == null
    case IsNotNull(a) => value(row, a) != null
    case f => throw new IllegalStateException(s"healthcare-gen: unexpected pushed filter $f")
  }
}
