package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}

import graft.sources.{GraftTable, VersionedTable}

/** SQL utility commands for graft tables — the `DeltaSqlParser` seam:
  * a delegating [[ParserInterface]] that recognizes the four
  * maintenance statements Delta adds to Spark SQL and hands EVERYTHING
  * else to Spark's own parser verbatim:
  *
  *   - `DESCRIBE HISTORY <target>`
  *   - `VACUUM <target> [RETAIN <n> VERSIONS | RETAIN <n> HOURS] [DRY RUN]`
  *   - `OPTIMIZE <target> [WHERE <predicate>] [ZORDER BY (c1, c2, ...)]`
  *   - `RESTORE [TABLE] <target> TO VERSION AS OF <n>`
  *     / `TO TIMESTAMP AS OF '<ts>'`
  *
  * `<target>` is a catalog table name (`t`, `db.t`), a quoted path
  * (`'/data/tbl'`), or the Delta path idiom spelled for this format
  * (``graft.`/data/tbl` ``). Table names resolve through the session
  * catalog AT EXECUTION (parsers must not touch the catalog) and must
  * be `USING graft` tables. Deviation from Delta recorded honestly:
  * this table retains by VERSION COUNT, so `RETAIN n VERSIONS` maps to
  * `retainVersions` while Delta's `RETAIN n HOURS` spelling maps to the
  * vacuum grace window (both compose). Injected by
  * [[graft.functions.GraftExtensions]]. */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraftCommand(sqlText).getOrElse {
      // time-travel nodes swap for a placeholder the built-in resolution
      // walks past (it would throw timeTravelUnsupportedError for v1
      // tables before any injected rule runs); GraftSqlDml restores the
      // original node verbatim for non-graft targets
      delegate.parsePlan(sqlText).transformDown {
        case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation, ts, v) =>
          GraftTimeTravel(u, ts, v)
        // ALTER RENAME/DROP COLUMN: ResolveSessionCatalog throws for v1
        // tables before injected rules run — hide the original node the
        // same way (GraftSqlDml decides by provider and restores it for
        // non-graft targets)
        case rc @ org.apache.spark.sql.catalyst.plans.logical.RenameColumn(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _, _) =>
          GraftAlterColumn(rc, u.multipartIdentifier)
        case dc @ org.apache.spark.sql.catalyst.plans.logical.DropColumns(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _, _) =>
          GraftAlterColumn(dc, u.multipartIdentifier)
        case ac @ org.apache.spark.sql.catalyst.plans.logical.AlterColumns(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _) =>
          GraftAlterColumn(ac, u.multipartIdentifier)
        // SET/UNSET/SHOW TBLPROPERTIES: same park-then-decide trick —
        // graft targets route to the MANIFEST property state (the
        // catalog's copy is a synced convenience, not the truth), any
        // other provider gets its original node back untouched
        case sp @ org.apache.spark.sql.catalyst.plans.logical.SetTableProperties(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _) =>
          GraftAlterColumn(sp, u.multipartIdentifier)
        case up @ org.apache.spark.sql.catalyst.plans.logical.UnsetTableProperties(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable, _, _) =>
          GraftAlterColumn(up, u.multipartIdentifier)
        case st @ org.apache.spark.sql.catalyst.plans.logical.ShowTableProperties(
            u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView, _, _) =>
          GraftAlterColumn(st, u.multipartIdentifier)
        // graft.`/path` relations: ResolveSQLOnFile claims format.`path`
        // identifiers and throws for non-FileFormat sources — park them
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if GraftSqlParser.graftSpelled(u) =>
          GraftPathRelation(u)
        // InsertIntoStatement holds its target as a FIELD (query is the
        // only child): a placeholder there would also be invisible to
        // the DML rule's pattern-pruned walk (field bits don't propagate
        // up), so graft-spelled INSERT targets resolve to the format
        // relation RIGHT HERE — a filesystem check plus a format load,
        // no catalog involved, the parser's session in hand
        case ins: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
          ins.table match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
                if GraftSqlParser.graftSpelled(u) =>
              GraftSqlDml.graftPathOf(spark, u.multipartIdentifier) match {
                case Some(p) => ins.copy(table = GraftSqlDml.pathRelation(spark, p))
                case None => ins
              }
            case _ => ins
          }
      }
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  import scala.util.matching.Regex

  /** An identifier spelled ``graft.`…` `` (the path idiom's shape). */
  private[plans] def graftSpelled(
      u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  /** Target spelling: quoted path | graft.`path` | identifier chain. */
  private val T = """(?:'([^']+)'|graft\s*\.\s*`([^`]+)`|((?:[A-Za-z_][\w]*|`[^`]+`)(?:\s*\.\s*(?:[A-Za-z_][\w]*|`[^`]+`))*))"""

  private val HistoryR: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*""".r
  private val DetailR: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val ConvertR: Regex =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+(?:'([^']+)'|parquet\\s*\\.\\s*`([^`]+)`)\\s*;?\\s*""".r
  private val AddConstraintR: Regex =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+([A-Za-z_]\\w*)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val DropConstraintR: Regex =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+CONSTRAINT\\s+(?:(IF\\s+EXISTS)\\s+)?([A-Za-z_]\\w*)\\s*;?\\s*""".r
  private val VacuumR: Regex =
    s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS))?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val OptimizeR: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s+\\(?\\s*([\\w`,\\s]+?)\\s*\\)?)?\\s*;?\\s*""".r
  private val ReplaceWhereR: Regex =
    s"""(?is)\\s*INSERT\\s+INTO\\s+$T\\s+REPLACE\\s+WHERE\\s+(.+)""".r
  private val CloneR: Regex =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$T\\s+(?:(SHALLOW|DEEP)\\s+)?CLONE\\s+$T(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?(?:\\s+TBLPROPERTIES\\s*\\(([^)]*)\\))?(?:\\s+LOCATION\\s+'([^']+)')?\\s*;?\\s*""".r

  /** `'k' = 'v', ...` inside a CLONE's TBLPROPERTIES clause. */
  private def parseProps(s: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap
  private val ReorgR: Regex =
    s"""(?is)\\s*REORG\\s+TABLE\\s+$T(?:\\s+WHERE\\s+(.+?))?\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*""".r
  private val FsckR: Regex =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$T(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val RestoreVR: Regex =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTR: Regex =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  /** Statements that START like a graft command but fail its grammar
    * error here with usage, instead of a baffling delegate parse error. */
  private val LooksGraft: Regex =
    """(?is)\s*(VACUUM|OPTIMIZE|REORG\s+TABLE|FSCK|CONVERT\s+TO\s+GRAFT|RESTORE\s.*|DESC(?:RIBE)?\s+(?:HISTORY|DETAIL)\s.*)\b.*""".r

  private[plans] def parseGraftCommand(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case HistoryR(p, gp, id, lim) =>
        Some(GraftDescribeHistoryCommand(target(p, gp, id),
          Option(lim).map(_.toInt)))
      case DetailR(p, gp, id) =>
        Some(GraftDescribeDetailCommand(target(p, gp, id)))
      case ConvertR(p, pp) =>
        Some(GraftConvertCommand(Option(p).getOrElse(pp)))
      case AddConstraintR(p, gp, id, name, expr) =>
        Some(GraftConstraintCommand(target(p, gp, id), name,
          Some(expr.trim), ifExists = false))
      case DropConstraintR(p, gp, id, ine, name) =>
        Some(GraftConstraintCommand(target(p, gp, id), name, None,
          ifExists = ine != null))
      case VacuumR(p, gp, id, n, unit, dry) =>
        val (retain, grace) = (Option(n).map(_.toInt), Option(unit).map(_.toUpperCase)) match {
          case (Some(k), Some("VERSIONS")) => (Some(k), None)
          case (Some(k), Some("HOURS")) => (None, Some(k * 3600L * 1000))
          case _ => (None, None)
        }
        Some(GraftVacuumCommand(target(p, gp, id), retain, grace, dry != null))
      case ReplaceWhereR(p, gp, id, rest) =>
        val (cond, query) = splitReplaceWhere(rest).getOrElse(
          throw new IllegalArgumentException(
            "graft SQL: INSERT INTO <t> REPLACE WHERE <condition> " +
              "<SELECT|VALUES|FROM|TABLE ...> — no query found after the " +
              "condition (a query keyword inside quotes or parentheses " +
              "does not start the query)"))
        Some(GraftReplaceWhereCommand(target(p, gp, id), cond, query))
      case CloneR(ine, tp, tgp, tid, kind, sp, sgp, sid, v, ts, props, loc) =>
        Some(GraftCloneCommand(ine != null, target(tp, tgp, tid),
          target(sp, sgp, sid), Option(v).map(_.toLong), Option(ts), Option(loc),
          shallow = Option(kind).exists(_.equalsIgnoreCase("SHALLOW")),
          props = Option(props).map(parseProps).getOrElse(Map.empty)))
      case RestoreVR(p, gp, id, v) =>
        Some(GraftRestoreCommand(target(p, gp, id), Some(v.toLong), None))
      case RestoreTR(p, gp, id, ts) =>
        Some(GraftRestoreCommand(target(p, gp, id), None, Some(ts)))
      case ReorgR(p, gp, id, where) =>
        Some(GraftReorgCommand(target(p, gp, id),
          Option(where).map(_.trim).filter(_.nonEmpty)))
      case FsckR(p, gp, id, dry) =>
        Some(GraftFsckCommand(target(p, gp, id), dry != null))
      case OptimizeR(p, gp, id, where, zorder) =>
        Some(GraftOptimizeCommand(target(p, gp, id), Option(where),
          Option(zorder).toSeq.flatMap(_.split(',').map(_.trim.stripPrefix("`")
            .stripSuffix("`")).filter(_.nonEmpty))))
      case LooksGraft(stmt) => throw new IllegalArgumentException(
        s"graft SQL: could not parse '${stmt.trim.takeWhile(_ != '\n')}...' — expected " +
          "DESCRIBE HISTORY <t> | VACUUM <t> [RETAIN n VERSIONS|HOURS] [DRY RUN] | " +
          "OPTIMIZE <t> [WHERE pred] [ZORDER BY (cols)] | " +
          "REORG TABLE <t> [WHERE pred] APPLY (PURGE) | " +
          "FSCK REPAIR TABLE <t> [DRY RUN] | " +
          "RESTORE [TABLE] <t> TO VERSION|TIMESTAMP AS OF ...")
      case _ => None
    }

  /** Split "condition query" at the first SELECT/VALUES/FROM/TABLE
    * keyword sitting OUTSIDE single-quoted literals, backtick
    * identifiers, and parentheses — so a condition like
    * `tag = 'from paris'` (single- or double-quoted, backslash escapes
    * included) or `id IN (SELECT ...)` never donates its embedded
    * keyword as the query boundary (the naive first-token split
    * misparsed both into a garbage condition+query pair). */
  private def splitReplaceWhere(rest: String): Option[(String, String)] = {
    val kw = Set("select", "values", "from", "table")
    var depth = 0; var inB = false
    var quote: Char = 0 // 0 = outside; '\'' or '"' = inside that literal
    var i = 0
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (quote != 0) {
        // Spark string literals escape with backslash by default, AND
        // accept the SQL doubled-quote escape ('it''s' / "a""b") — a
        // doubled quote stays INSIDE the literal, else a keyword later
        // in it would become the condition/query split point
        if (c == '\\') i += 2
        else if (c == quote && i + 1 < rest.length && rest.charAt(i + 1) == quote)
          i += 2
        else { if (c == quote) quote = 0; i += 1 }
      }
      else if (inB) { if (c == '`') inB = false; i += 1 }
      else c match {
        case '\'' | '"' => quote = c; i += 1
        case '`' => inB = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if depth == 0 && (c.isLetter || c == '_') &&
            (i == 0 || { val p = rest.charAt(i - 1)
              !p.isLetterOrDigit && p != '_' }) =>
          var j = i
          while (j < rest.length && { val x = rest.charAt(j)
            x.isLetterOrDigit || x == '_' }) j += 1
          val word = rest.substring(i, j).toLowerCase(java.util.Locale.ROOT)
          if (kw(word) && i > 0 && rest.substring(0, i).trim.nonEmpty)
            return Some((rest.substring(0, i).trim,
              rest.substring(i).trim.stripSuffix(";").trim))
          i = j
        case _ => i += 1
      }
    }
    None
  }

  /** Regex groups → target: quoted path, graft.`path`, or identifier. */
  private def target(p: String, gp: String, id: String): Either[String, Seq[String]] =
    (Option(p), Option(gp), Option(id)) match {
      case (Some(path), _, _) => Left(path)
      case (_, Some(path), _) => Left(path)
      case (_, _, Some(ident)) => Right(
        ident.split('.').map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
      case _ => throw new IllegalArgumentException("graft SQL: no target")
    }

  /** Catalog-or-path target → storage path of a verified graft table.
    * Runs at command EXECUTION, the analyzer norm. */
  private[plans] def resolvePath(spark: SparkSession,
      t: Either[String, Seq[String]]): String = t match {
    case Left(path) =>
      require(GraftTable.isGraftTable(spark, path),
        s"no versioned graft table at $path")
      path
    case Right(parts) =>
      val ti = parts match {
        case Seq(tbl) => TableIdentifier(tbl)
        case Seq(db, tbl) => TableIdentifier(tbl, Some(db))
        case Seq(cat, db, tbl) => TableIdentifier(tbl, Some(db), Some(cat))
        case _ => throw new IllegalArgumentException(
          s"graft SQL: bad table identifier ${parts.mkString(".")}")
      }
      val meta = spark.sessionState.catalog.getTableMetadata(ti)
      require(meta.provider.exists(_.equalsIgnoreCase("graft")),
        s"${parts.mkString(".")} is not a USING graft table " +
          s"(provider: ${meta.provider.getOrElse("none")})")
      meta.location.toString
  }
}

/** `DESCRIBE HISTORY [LIMIT n]` — the manifest log as rows (Delta's
  * surface; LIMIT keeps the NEWEST n commits, Delta's semantics). */
final case class GraftDescribeHistoryCommand(
    target: Either[String, Seq[String]], limit: Option[Int] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts", StringType)(),
    AttributeReference("op", StringType)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_rows_added", LongType, nullable = false)(),
    AttributeReference("n_dv_rows_deleted", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // always newest-first (Delta's DESCRIBE HISTORY ordering), LIMIT or
    // not — the same command must not flip ordering based on LIMIT
    val rows = VersionedTable.history(sparkSession,
      GraftSqlParser.resolvePath(sparkSession, target))
      .collect().toSeq.sortBy(-_.getLong(0))
    limit.fold(rows)(n => rows.take(n))
  }
}

/** `DESCRIBE DETAIL` — the one-row table summary (Delta's surface):
  * head version, file/byte/row counts, partition/constraint/generated/
  * bloom metadata in logical names. */
final case class GraftDescribeDetailCommand(
    target: Either[String, Seq[String]]) extends LeafRunnableCommand {
  private def arr = org.apache.spark.sql.types.ArrayType(StringType)
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts", StringType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("partition_columns", arr)(),
    AttributeReference("constraints", arr)(),
    AttributeReference("generated_columns", arr)(),
    AttributeReference("bloom_index_columns", arr)(),
    AttributeReference("num_vectored_files", LongType, nullable = false)(),
    AttributeReference("properties", arr)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    VersionedTable.describeDetail(sparkSession,
      GraftSqlParser.resolvePath(sparkSession, target)).collect().toSeq
}

/** `CONVERT TO GRAFT parquet.`/path`` (Delta's CONVERT TO DELTA) —
  * in-place v0 manifest over the existing parquet files, no rewrite. */
final case class GraftConvertCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.convert(sparkSession, path, ts = VersionedTable.TsNow)))
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` /
  * `DROP CONSTRAINT [IF EXISTS] name` — metadata-only commits; ADD
  * validates the current snapshot first (Delta's behavior). */
final case class GraftConstraintCommand(target: Either[String, Seq[String]],
    name: String, check: Option[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    val v = check match {
      case Some(expr) => VersionedTable.addConstraint(sparkSession, path, name,
        expr, ts = VersionedTable.TsNow)
      case None =>
        if (ifExists && !VersionedTable.constraintsOf(sparkSession, path).contains(name))
          VersionedTable.latestVersion(sparkSession, path)
        else VersionedTable.dropConstraint(sparkSession, path, name,
          ts = VersionedTable.TsNow)
    }
    Seq(Row(v))
  }
}

/** `VACUUM [RETAIN n VERSIONS|HOURS] [DRY RUN]` — returns the
  * reclaimed (or reclaimable, for DRY RUN) data-file count. */
final case class GraftVacuumCommand(target: Either[String, Seq[String]],
    retainVersions: Option[Int], graceMs: Option[Long], dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_files", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    // unspecified clauses resolve to TABLE-DECLARED policy
    // (graft.retainVersions / graft.vacuumGraceHours, else 2 / 7 days) —
    // the library's own defaulting; DRY RUN uses the SAME resolution as
    // the real vacuum, so it reports exactly what `VACUUM` would delete
    // today (Delta's DRY RUN contract)
    val retain = retainVersions.getOrElse(-1)
    val grace = graceMs.getOrElse(-1L)
    val n =
      if (dryRun) VersionedTable.vacuumReclaimable(sparkSession, path,
        retain, graceMs = grace)
      else VersionedTable.vacuum(sparkSession, path, retain, graceMs = grace)
    Seq(Row(n))
  }
}

/** `OPTIMIZE [WHERE pred] [ZORDER BY cols]` — compaction commit;
  * returns the resulting version plus Delta-style file metrics (counts
  * from the manifest log, no data read). A no-op fold (scope < 2
  * files) reports the unchanged head with equal before/after. */
final case class GraftOptimizeCommand(target: Either[String, Seq[String]],
    where: Option[String], zorderCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files_before", IntegerType, nullable = false)(),
    AttributeReference("n_files_after", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    val before = VersionedTable.latestVersion(sparkSession, path)
    val v = where match {
      case Some(cond) =>
        VersionedTable.optimizeWhere(sparkSession, path, cond,
          ts = VersionedTable.TsNow, zorderCols = zorderCols)
      case None =>
        VersionedTable.optimize(sparkSession, path,
          ts = VersionedTable.TsNow, zorderCols = zorderCols)
    }
    val files = VersionedTable.history(sparkSession, path)
      .filter(org.apache.spark.sql.functions.col("version").isin(before, v))
      .select("version", "n_files").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    Seq(Row(v, files(before), files(v)))
  }
}

/** `REORG TABLE t [WHERE pred] APPLY (PURGE)` — Delta's deletion-vector
  * materialization: rewrite ONLY the vectored files (purging their
  * soft-deleted rows), everything else carries by reference. Returns
  * the new version and how many files were purged; a no-op (nothing
  * vectored in scope) reports the current version with 0 purged. */
final case class GraftReorgCommand(target: Either[String, Seq[String]],
    where: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files_purged", IntegerType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    val (v, purged) = VersionedTable.reorgPurgeCounted(sparkSession, path,
      where, ts = VersionedTable.TsNow)
    Seq(Row(v, purged))
  }
}

/** `FSCK REPAIR TABLE t [DRY RUN]` — Delta's missing-file repair: drop
  * snapshot references to data files that no longer exist in storage so
  * the table scans again. One row per missing file; `removed` is false
  * under DRY RUN (reported, nothing committed). */
final case class GraftFsckCommand(target: Either[String, Seq[String]],
    dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("data_file", StringType, nullable = false)(),
    AttributeReference("removed", BooleanType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    VersionedTable.fsck(sparkSession, path, dryRun,
      ts = VersionedTable.TsNow).map(f => Row(f, !dryRun))
  }
}

/** `INSERT INTO t REPLACE WHERE <cond> <query>` — Delta's
  * predicate-scoped overwrite (the idempotent backfill shape): rows of
  * the query replace exactly the condition's scope; only
  * scope-intersecting files rewrite, the rest carry by reference
  * ([[VersionedTable.replaceWhere]]). The query text re-parses at
  * execution through the session parser (which delegates), so any
  * SELECT/VALUES/TABLE body works. */
final case class GraftReplaceWhereCommand(target: Either[String, Seq[String]],
    condition: String, query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.Shims.ofRows(sparkSession,
      sparkSession.sessionState.sqlParser.parseQuery(query))
    Seq(Row(VersionedTable.replaceWhere(df,
      GraftSqlParser.resolvePath(sparkSession, target), condition,
      ts = VersionedTable.TsNow)))
  }
}

/** `CREATE TABLE t [IF NOT EXISTS] [SHALLOW | DEEP] CLONE s [VERSION
  * AS OF n | TIMESTAMP AS OF 'ts'] [LOCATION 'path']` — Delta's CLONE
  * family as SQL. Bare `CLONE` (and `DEEP CLONE`) is the
  * SELF-CONTAINED full copy with history truncated to v0
  * ([[VersionedTable.cloneTableDeep]] — Delta's default); `SHALLOW
  * CLONE` is the metadata-only fork (file references copy, data does
  * not — [[VersionedTable.cloneTable]]). A catalog-name target
  * registers the new table (at LOCATION, else the warehouse default
  * path), a path-spelled target just writes the clone's log. Returns
  * the clone's storage path. */
final case class GraftCloneCommand(ifNotExists: Boolean,
    cloneTarget: Either[String, Seq[String]], source: Either[String, Seq[String]],
    version: Option[Long], timestamp: Option[String], location: Option[String],
    shallow: Boolean = true, props: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val srcPath = GraftSqlParser.resolvePath(sparkSession, source)
    val v = version.getOrElse(timestamp.fold(-1L)(ts =>
      GraftTable.forPath(sparkSession, srcPath).versionAtOrBefore(ts)))
    def clone(tgt: String): Unit = {
      if (shallow)
        VersionedTable.cloneTable(sparkSession, srcPath, tgt, v,
          ts = VersionedTable.TsNow)
      else
        VersionedTable.cloneTableDeep(sparkSession, srcPath, tgt, v,
          ts = VersionedTable.TsNow)
      // Delta's CLONE ... TBLPROPERTIES: overrides MERGE onto the
      // properties the clone carried from its source
      if (props.nonEmpty)
        VersionedTable.setProperties(sparkSession, tgt, props,
          ts = VersionedTable.TsNow)
      ()
    }
    cloneTarget match {
      case Left(path) =>
        if (ifNotExists && GraftTable.isGraftTable(sparkSession, path)) Seq(Row(path))
        else {
          clone(path)
          Seq(Row(path))
        }
      case Right(parts) =>
        val ti = parts match {
          case Seq(tbl) => TableIdentifier(tbl)
          case Seq(db, tbl) => TableIdentifier(tbl, Some(db))
          case Seq(cat, db, tbl) => TableIdentifier(tbl, Some(db), Some(cat))
          case _ => throw new IllegalArgumentException(
            s"graft SQL: bad clone target ${parts.mkString(".")}")
        }
        val catalog = sparkSession.sessionState.catalog
        if (catalog.tableExists(ti)) {
          if (ifNotExists)
            Seq(Row(catalog.getTableMetadata(ti).location.toString))
          else throw new IllegalArgumentException(
            s"clone target table ${parts.mkString(".")} already exists " +
              "(use IF NOT EXISTS to skip)")
        } else {
          val tgt = location.getOrElse(catalog.defaultTablePath(ti).toString)
          clone(tgt)
          sparkSession.sql(
            s"CREATE TABLE ${parts.map(q => s"`$q`").mkString(".")} " +
              s"USING graft LOCATION '$tgt'")
          Seq(Row(tgt))
        }
    }
  }
}

/** `RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF ...` — zero-copy
  * rollback commit; returns the new head version. */
final case class GraftRestoreCommand(target: Either[String, Seq[String]],
    version: Option[Long], timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(sparkSession, target)
    val v = (version, timestamp) match {
      case (Some(toV), _) =>
        VersionedTable.rollback(sparkSession, path, toV, ts = VersionedTable.TsNow)
      case (_, Some(ts)) => GraftTable.forPath(sparkSession, path)
        .restoreToTimestamp(ts, ts = VersionedTable.TsNow)
      case _ => throw new IllegalArgumentException("graft SQL: RESTORE needs a point")
    }
    Seq(Row(v))
  }
}
