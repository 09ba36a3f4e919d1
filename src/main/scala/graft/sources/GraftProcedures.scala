package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableVersions

/** MAINTENANCE PROCEDURES for the versioned format, exposed through
  * Spark's DSv2 `CALL` statement (the Iceberg `CALL catalog.system.*`
  * architecture) — the operational surface (compaction, clustering,
  * retention, restore, clone, rename, bloom maintenance, history) as
  * plain SQL on any session that registered the catalog:
  *
  * {{{
  *   CALL graft.system.optimize(`table` => 'db.t', target_mb => 128)
  *   CALL graft.system.zorder('db.t', 'k,ts', 16)
  *   CALL graft.system.vacuum('db.t', 5)
  *   CALL graft.system.restore('db.t', 3)
  *   CALL graft.system.history('db.t')
  *   CALL graft.system.clone_table('db.t', '/elsewhere/t2')
  *   CALL graft.system.move_table('db.t', 'db.t_renamed')
  *   CALL graft.system.maintain_bloom('db.t', 'k')
  * }}}
  *
  * Tables are addressed as 'ns.name' against the catalog warehouse or
  * by absolute path ('/…'). Every procedure returns its outcome as
  * rows (a [[LocalScan]]), so `CALL` results compose with the rest of
  * SQL tooling. Ref semantics: the reference's operational surface is
  * Airflow tasks + BigQuery administrative DDL
  * (`healthcare_data_pipeline_dag.py`); this is the table-format-native
  * equivalent.
  */
private[sources] object GraftProcedures {

  private def spark = SparkSession.active

  /** 'ns.name' → warehouse path; '/abs' or 'scheme:/…' passes through. */
  private def resolve(warehouse: String, table: String): String =
    if (table.startsWith("/") || table.contains(":/")) table
    else (warehouse +: table.split('.').toSeq).mkString("/")

  private val TBL = ProcedureParameter.in("table", StringType).build()

  private def str(row: InternalRow, i: Int): String = row.getUTF8String(i).toString

  /** 'k=v,k2=v2' → partition scope for optimize/zorder ('' = whole table). */
  private def partitionSpec(s: String): Map[String, String] =
    if (s.trim.isEmpty) Map.empty
    else s.split(',').map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> v.trim
    }.toMap

  /** One bound procedure: fixed parameters, rows computed by `run`. */
  private def proc(procName: String, params: Seq[ProcedureParameter],
      outSchema: StructType)(run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft-table maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft-table maintenance: $procName"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false // mutates table state
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val out = run(input).toArray
          java.util.Collections.singletonList[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = out
            override def readSchema(): StructType = outSchema
          }).iterator()
        }
      }
    }

  private val versionOut = StructType(Seq(StructField("version", LongType)))
  private def versionRow(v: Option[Long]): Seq[InternalRow] =
    Seq(InternalRow(v.map(Long.box).orNull))

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"unknown procedure namespace ${ident.namespace.mkString(".")} (expected 'system')")
    def root(row: InternalRow): String = resolve(warehouse, str(row, 0))
    ident.name match {
      case "optimize" =>
        proc("optimize", Seq(TBL,
          ProcedureParameter.in("target_mb", IntegerType).defaultValue("128").build(),
          ProcedureParameter.in("partition", StringType).defaultValue("''").build()),
          versionOut) { in =>
          versionRow(TableVersions.compact(spark, root(in), in.getInt(1).toLong << 20,
            partitionSpec(str(in, 2))))
        }
      case "zorder" =>
        proc("zorder", Seq(TBL,
          ProcedureParameter.in("columns", StringType).build(),
          ProcedureParameter.in("num_files", IntegerType).build(),
          ProcedureParameter.in("partition", StringType).defaultValue("''").build()),
          versionOut) { in =>
          versionRow(TableVersions.optimizeZOrder(spark, root(in),
            str(in, 1).split(',').toSeq.map(_.trim), in.getInt(2), partitionSpec(str(in, 3))))
        }
      case "vacuum" =>
        proc("vacuum", Seq(TBL,
          ProcedureParameter.in("keep_versions", IntegerType).defaultValue("2").build(),
          // orphan grace minutes: freshly staged files/sidecars of
          // in-flight writers are spared this long (0 = sweep all)
          ProcedureParameter.in("grace_minutes", IntegerType).defaultValue("10").build(),
          // wall-clock retention: every version committed within the
          // last retain_hours survives, whatever the commit rate
          // (≤0 disables; composes as the LOOSER bound)
          ProcedureParameter.in("retain_hours", DoubleType).defaultValue("-1.0").build()),
          StructType(Seq(StructField("done", BooleanType)))) { in =>
          TableVersions.vacuum(spark, root(in), in.getInt(1),
            graceMs = in.getInt(2) * 60L * 1000L,
            retainHours = in.getDouble(3))
          Seq(InternalRow(true))
        }
      case "vacuum_dry_run" =>
        // read-only preview: (kind, path) rows vacuum WOULD delete
        proc("vacuum_dry_run", Seq(TBL,
          ProcedureParameter.in("keep_versions", IntegerType).defaultValue("2").build(),
          ProcedureParameter.in("grace_minutes", IntegerType).defaultValue("10").build(),
          ProcedureParameter.in("retain_hours", DoubleType).defaultValue("-1.0").build()),
          StructType(Seq(StructField("kind", StringType), StructField("path", StringType)))) { in =>
          TableVersions.vacuumDryRun(spark, root(in), in.getInt(1),
            graceMs = in.getInt(2) * 60L * 1000L, retainHours = in.getDouble(3))
            .collect().toSeq.map { r =>
              InternalRow(UTF8String.fromString(r.getString(0)),
                UTF8String.fromString(r.getString(1)))
            }
        }
      case "restore" =>
        proc("restore", Seq(TBL,
          ProcedureParameter.in("version", LongType).build()),
          versionOut) { in =>
          versionRow(TableVersions.restore(spark, root(in), in.getLong(1)))
        }
      case "restore_as_of" =>
        // timestamp string parsed under the SESSION zone (date-only
        // accepted), resolved against the commits' in-commit instants
        proc("restore_as_of", Seq(TBL,
          ProcedureParameter.in("timestamp", StringType).build()),
          versionOut) { in =>
          val ts = str(in, 1)
          val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
          val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
            UTF8String.fromString(ts), zone).getOrElse(throw new IllegalArgumentException(
              s"restore_as_of: '$ts' is not a valid date or timestamp"))
          versionRow(TableVersions.restoreAsOf(spark, root(in),
            java.lang.Math.floorDiv(micros, 1000L)))
        }
      case "history" =>
        val schema = StructType(Seq(
          StructField("version", LongType), StructField("n_files", LongType),
          StructField("n_bytes", LongType), StructField("n_dv_files", LongType),
          StructField("n_dv_rows", LongType), StructField("operation", StringType),
          StructField("txns", StringType),
          StructField("commit_ts", org.apache.spark.sql.types.TimestampType)))
        proc("history", Seq(TBL), schema) { in =>
          TableVersions.history(spark, root(in)).collect().toSeq.map { r =>
            InternalRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
              r.getLong(4), UTF8String.fromString(r.getString(5)),
              UTF8String.fromString(r.getString(6)),
              r.getTimestamp(7).getTime * 1000L)
          }
        }
      case "clone_table" =>
        proc("clone_table", Seq(TBL,
          ProcedureParameter.in("target", StringType).build()),
          versionOut) { in =>
          versionRow(Some(TableVersions.shallowClone(spark, root(in),
            resolve(warehouse, str(in, 1)))))
        }
      case "move_table" =>
        proc("move_table", Seq(TBL,
          ProcedureParameter.in("to", StringType).build()),
          StructType(Seq(StructField("moved_to", StringType)))) { in =>
          val to = resolve(warehouse, str(in, 1))
          TableVersions.moveTable(spark, root(in), to)
          Seq(InternalRow(UTF8String.fromString(to)))
        }
      case "add_constraint" => // Spark SQL has no CHECK DDL; Delta adds it via extensions
        proc("add_constraint", Seq(TBL,
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("expr", StringType).build()),
          versionOut) { in =>
          versionRow(Some(TableVersions.addConstraint(spark, root(in), str(in, 1), str(in, 2))))
        }
      case "drop_constraint" =>
        proc("drop_constraint", Seq(TBL,
          ProcedureParameter.in("name", StringType).build()),
          versionOut) { in =>
          versionRow(Some(TableVersions.dropConstraint(spark, root(in), str(in, 1))))
        }
      case "maintain_bloom" =>
        proc("maintain_bloom", Seq(TBL,
          ProcedureParameter.in("column", StringType).build()),
          StructType(Seq(StructField("files_indexed", LongType)))) { in =>
          Seq(InternalRow(TableVersions.maintainBloomIndex(spark, root(in), str(in, 1))))
        }
      case other => throw new UnsupportedOperationException(
        s"unknown procedure graft.system.$other — available: ${names.mkString(", ")}")
    }
  }

  val names: Seq[String] = Seq("optimize", "zorder", "vacuum", "vacuum_dry_run", "restore",
    "restore_as_of", "history", "clone_table", "move_table", "maintain_bloom",
    "add_constraint", "drop_constraint")
}
