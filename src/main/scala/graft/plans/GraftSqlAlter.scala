package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.VersionedTable

/** SQL schema evolution on `USING graft` tables — `ALTER TABLE ...
  * ADD COLUMNS / RENAME COLUMN / DROP COLUMN` rewritten from Spark's
  * v2-only plans (which die in checkAnalysis for v1 providers) to the
  * library's zero-rewrite column-mapping operations, by
  * [[GraftSqlDml]]. Each command ALSO syncs the session catalog's
  * stored schema to the new snapshot schema, so DESCRIBE and
  * field-name resolution stay truthful after the evolution (the
  * relation itself always serves the manifest schema — see
  * [[graft.sources.GraftDataSource]]'s SchemaRelationProvider note).
  * Catalog-name targets only: path-spelled ALTER has no catalog entry
  * to resolve through. */
object GraftSqlAlter {
  /** `to` strictly wins the widening lattice over `from` (the commit's
    * own safe-upcast chain: byte→short→int→long, float→double). */
  private[plans] def widens(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def rank(d: DataType): Option[Int] = d match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    (rank(from), rank(to)) match {
      case (Some(x), Some(y)) => y > x
      case _ => from == org.apache.spark.sql.types.FloatType &&
        to == org.apache.spark.sql.types.DoubleType
    }
  }

  private[plans] def syncCatalogSchema(spark: SparkSession,
      ident: TableIdentifier, path: String): Unit = {
    // alterTableDataSchema only permits ADDING columns (the v1 catalog
    // contract); rename/drop need the wholesale metadata replace. The
    // relation never reads this schema (the manifest is the source of
    // truth) — the sync exists so DESCRIBE and ALTER field resolution
    // stay truthful.
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(ident)
    catalog.alterTable(meta.copy(
      schema = VersionedTable.readVersion(spark, path).schema))
  }
}

/** `ALTER TABLE t RENAME COLUMN old TO new` — metadata-only (column
  * mapping, zero files rewritten), one commit. */
final case class GraftRenameColumnCommand(path: String,
    ident: TableIdentifier, oldName: String, newName: String)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    VersionedTable.renameColumn(sparkSession, path, oldName, newName,
      ts = VersionedTable.TsNow)
    GraftSqlAlter.syncCatalogSchema(sparkSession, ident, path)
    Seq.empty
  }
}

/** `ALTER TABLE t DROP COLUMN[S] c, ...` — metadata-only drops, one
  * commit per column (the library's drop is single-column; Delta
  * commits a multi-drop once — recorded deviation, same end state). */
final case class GraftDropColumnsCommand(path: String,
    ident: TableIdentifier, columns: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val present = VersionedTable.readVersion(sparkSession, path)
      .schema.fieldNames.toSet
    columns.foreach { c =>
      if (present.contains(c) || !ifExists)
        VersionedTable.dropColumn(sparkSession, path, c, ts = VersionedTable.TsNow)
    }
    GraftSqlAlter.syncCatalogSchema(sparkSession, ident, path)
    Seq.empty
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE <t>` — type WIDENING as a
  * zero-row mergeSchema commit (int→long, float→double — the
  * manifest-schema read path upcasts old files on scan); a narrowing
  * or incompatible change is rejected by the commit's own widen rule,
  * never recorded. Delta's type-widening table feature, re-derived. */
final case class GraftAlterColumnTypeCommand(path: String,
    ident: TableIdentifier, changes: Map[String, org.apache.spark.sql.types.DataType])
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cur = VersionedTable.readVersion(sparkSession, path).schema
    val unknown = changes.keys.filterNot(n =>
      cur.fieldNames.exists(_.equalsIgnoreCase(n))).toSeq.sorted
    require(unknown.isEmpty,
      s"ALTER COLUMN targets name no table column at $path: ${unknown.mkString(", ")}")
    // the requested type must WIN the union (the commit unions types, so
    // a narrowing request would otherwise land as a silent no-op commit)
    val widened = StructType(cur.fields.map { f =>
      changes.collectFirst { case (n, dt) if n.equalsIgnoreCase(f.name) => dt }
        .fold(f) { dt =>
          require(GraftSqlAlter.widens(f.dataType, dt),
            s"ALTER COLUMN ${f.name} TYPE ${dt.simpleString} is not a widening " +
              s"of ${f.dataType.simpleString} (byte→short→int→long, float→double); " +
              "narrowing would require rewriting every data file")
          f.copy(dataType = dt)
        }
    })
    val empty = sparkSession.createDataFrame(
      java.util.Collections.emptyList[Row](), widened)
    VersionedTable.commit(empty, path, mode = "append", mergeSchema = true,
      ts = VersionedTable.TsNow)
    GraftSqlAlter.syncCatalogSchema(sparkSession, ident, path)
    Seq.empty
  }
}

/** `ALTER TABLE t ADD COLUMNS (c TYPE, ...)` — a zero-row mergeSchema
  * commit widens the manifest schema; files written before the ADD
  * read the new columns as NULL (the manifest-schema read path), which
  * is why the added columns must be nullable — Delta enforces the
  * same. */
final case class GraftAddColumnsCommand(path: String,
    ident: TableIdentifier, colsToAdd: Seq[StructField])
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    require(colsToAdd.forall(_.nullable),
      "ADD COLUMNS on a graft table requires nullable columns — " +
        "existing rows read the new column as NULL")
    val cur = VersionedTable.readVersion(sparkSession, path).schema
    val clash = colsToAdd.map(_.name).filter(n =>
      cur.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(clash.isEmpty,
      s"ADD COLUMNS: ${clash.mkString(", ")} already exist(s) at $path")
    val widened = StructType(cur.fields ++ colsToAdd)
    val empty = sparkSession.createDataFrame(
      java.util.Collections.emptyList[Row](), widened)
    VersionedTable.commit(empty, path, mode = "append", mergeSchema = true,
      ts = VersionedTable.TsNow)
    GraftSqlAlter.syncCatalogSchema(sparkSession, ident, path)
    Seq.empty
  }
}

/** `ALTER TABLE t SET TBLPROPERTIES (k = v, ...)` — persisted in the
  * MANIFEST (the table's own policy travels with the table; two
  * sessions with different JVM configs apply the same declared
  * retention/cadence), with the catalog's stored properties synced as
  * a convenience on name targets. */
final case class GraftSetPropertiesCommand(path: String,
    ident: Option[TableIdentifier], props: Map[String, String])
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    VersionedTable.setProperties(sparkSession, path, props,
      ts = VersionedTable.TsNow)
    ident.foreach { ti =>
      val catalog = sparkSession.sessionState.catalog
      val meta = catalog.getTableMetadata(ti)
      catalog.alterTable(meta.copy(properties = meta.properties ++ props))
    }
    Seq.empty
  }
}

/** `ALTER TABLE t UNSET TBLPROPERTIES [IF EXISTS] (k, ...)`. */
final case class GraftUnsetPropertiesCommand(path: String,
    ident: Option[TableIdentifier], keys: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    VersionedTable.unsetProperties(sparkSession, path, keys, ifExists,
      ts = VersionedTable.TsNow)
    ident.foreach { ti =>
      val catalog = sparkSession.sessionState.catalog
      val meta = catalog.getTableMetadata(ti)
      catalog.alterTable(meta.copy(properties = meta.properties -- keys))
    }
    Seq.empty
  }
}

/** `SHOW TBLPROPERTIES t [('key')]` — the manifest property state as
  * rows. Reuses the parsed node's output attributes so the analyzed
  * parent plan's references stay valid. */
final case class GraftShowPropertiesCommand(path: String,
    propertyKey: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val props = VersionedTable.propertiesOf(sparkSession, path)
    propertyKey match {
      case Some(k) =>
        val v = props.getOrElse(k,
          s"Table ${ident} does not have property: $k")
        if (output.size == 1) Seq(Row(v)) else Seq(Row(k, v))
      case None =>
        props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
  private def ident: String = path
}
