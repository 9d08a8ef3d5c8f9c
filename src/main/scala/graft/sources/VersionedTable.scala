package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, expr, input_file_name, lit, regexp_extract, struct}
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-versioned parquet table: the Delta-lake surface the reference
  * actually relies on (delta_utils.py:14-50 uses read + overwrite only)
  * PLUS the history / time-travel / rollback / vacuum operations its
  * Delta storage would offer — re-expressed storage-agnostically over
  * plain parquet with a manifest log, so [[Sinks]]' "out of scope" gap is
  * closed instead of documented away.
  *
  * Layout:
  * {{{
  *   table/
  *     _manifests/v00000000.manifest   # one per committed snapshot
  *     files/c00000000/part-*.parquet  # data files, NEVER rewritten
  * }}}
  *
  * A manifest is a plain text file — `key=value` header lines then one
  * relative data-file path per line (no JSON library needed, greppable
  * on the cluster):
  * {{{
  *   version=3
  *   ts=2026-08-14T00:00:00Z
  *   op=append
  *   files/c00000001/part-0000.parquet
  *   files/c00000003/part-0000.parquet
  * }}}
  *
  * COMMIT PROTOCOL (optimistic concurrency, the Delta log trick): data
  * files land first under a version-owned directory, then the manifest
  * is written to a temp name and atomically CLAIMED as
  * `v<next>.manifest`. The claim primitive is per-filesystem: on HDFS,
  * `rename` onto an existing destination fails, so rename-if-absent is
  * the guard; on LOCAL filesystems Hadoop's rename delegates to POSIX
  * rename(2), which OVERWRITES an existing destination — there the
  * claim is a hard link (`link(2)` fails with EEXIST atomically), so
  * the guarantee holds on both. Either way, of two racing writers
  * targeting the same version exactly one commits; the loser's
  * exception tells it to re-read the log and retry on top of the winner
  * (its orphaned data directory is reclaimed by [[vacuum]]). On S3
  * (no atomic rename OR link) this needs a coordination layer, exactly
  * as Delta-on-S3 needs LogStore — documented, not hidden.
  *
  * Scale notes: every operation here is DRIVER-SIDE METADATA except the
  * data write itself — `history` reads manifest headers (never data),
  * `readVersion` hands Spark an explicit file list (footer-pruned,
  * pushdown intact — the scan plans exactly like a plain parquet read),
  * `rollback` writes one manifest re-pointing at old files (zero data
  * copied, Delta RESTORE semantics), `vacuum` diffs the referenced set
  * against a directory listing. A snapshot's file count grows only with
  * appends since its last overwrite, and [[Sinks.compactPartitions]]'
  * small-file pressure is the same here: compact by committing an
  * `overwrite` of the coalesced read.
  *
  * Timestamps are caller-supplied (`ts`), not wall-clock: replaying a
  * pipeline reproduces the log byte-for-byte, and `readAsOf` is
  * deterministic in tests. Pass ingestion batch time in production.
  */
object VersionedTable {

  private val ManifestDir = "_manifests"

  /** The table's manifest-log directory — the CDF streaming source
    * ([[graft.streaming.Streams.changesStream]]) points Spark's file
    * stream at it: each committed version is exactly one new immutable
    * file there (atomic publish), so the file source's discovery
    * sequence IS the commit sequence and its checkpoint tracks which
    * versions a consumer has processed. */
  private[graft] def manifestLogDir(path: String): String =
    s"$path/$ManifestDir"

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(root: Path, v: Long): Path =
    new Path(new Path(root, ManifestDir), f"v$v%08d.manifest")

  /** Manifest content: (version, ts, op, relative data-file paths, an
    * optional streaming transaction marker `appId -> batchId`, the
    * snapshot's logical schema as Spark DataType JSON — recorded so an
    * EMPTY snapshot (delete-all, empty-batch commit) stays readable and
    * the append schema check never depends on one file's footer — and
    * per-file column min/max STATS (Delta's add-file stats): for each
    * data file, numeric column → (min, max) as decimal strings, read
    * from the parquet FOOTER at commit time (no data scan) and carried
    * forward with carried files. [[merge]]'s discovery scan prunes on
    * them. */
  private case class Manifest(version: Long, ts: String, op: String,
      files: Seq[String], txn: Option[(String, Long)] = None,
      schemaJson: Option[String] = None,
      stats: Map[String, Map[String, (String, String)]] = Map.empty)

  private def readManifest(hfs: FileSystem, root: Path, v: Long): Manifest = {
    val in = hfs.open(manifestPath(root, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val headerLines = lines.takeWhile(_.contains("="))
    val hdr = headerLines.filterNot(_.startsWith("fstat=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    // one `fstat=<path>|col:min:max|col2:min:max` line per stats-bearing
    // file — line-oriented and greppable, like the rest of the format
    val stats = headerLines.filter(_.startsWith("fstat=")).map { l =>
      val parts = l.stripPrefix("fstat=").split('|')
      parts.head -> parts.tail.flatMap { t =>
        t.split(':') match {
          case Array(c, mn, mx) => Some(c -> (mn, mx))
          case _ => None
        }
      }.toMap
    }.toMap
    val txn = hdr.get("txn").map { t =>
      val i = t.lastIndexOf(':')
      (t.substring(0, i), t.substring(i + 1).toLong)
    }
    Manifest(hdr("version").toLong, hdr("ts"), hdr("op"),
      lines.dropWhile(_.contains("=")), txn, hdr.get("schema"), stats)
  }

  /** Per-file numeric column min/max from the parquet FOOTER — a
    * driver-side metadata read (O(row groups), no data pages touched),
    * the same source Delta's stats collection uses. Only integral and
    * floating primitive columns are kept (their decimal-string encoding
    * is delimiter-safe in the manifest line format); columns whose
    * footer lacks usable stats, or whose name would break the line
    * format, are simply absent — pruning treats absence as
    * "cannot prune", so stats are always safe to drop. */
  private def footerStats(hfs: FileSystem, root: Path,
      relFile: String): Map[String, (String, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(root, relFile), hfs.getConf))
    try {
      val acc = scala.collection.mutable.HashMap.empty[String, (BigDecimal, BigDecimal)]
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          val st = cc.getStatistics
          val numeric = cc.getPrimitiveType.getPrimitiveTypeName match {
            case INT32 | INT64 | FLOAT | DOUBLE => true
            case _ => false
          }
          if (numeric && st != null && st.hasNonNullValue && !name.contains(":")
              && !name.contains("|") && !name.contains("=")) {
            // Try: NaN/Infinity float stats don't parse as decimals — a
            // column whose stats we can't encode simply goes statless
            scala.util.Try((BigDecimal(st.genericGetMin.toString),
                BigDecimal(st.genericGetMax.toString))).foreach { case (mn, mx) =>
              acc.get(name) match {
                case Some((a, b)) => acc(name) = (a.min(mn), b.max(mx))
                case None => acc(name) = (mn, mx)
              }
            }
          }
        }
      }
      acc.map { case (c, (mn, mx)) => c -> (mn.toString, mx.toString) }.toMap
    } finally reader.close()
  }

  /** A snapshot's logical schema: the manifest-recorded one when present
    * (all manifests this code writes record it), else derived by a
    * mergeSchema footer pass over the file list — NEVER a single file's
    * footer, which after schema evolution under-reports the columns. */
  private def snapshotSchema(spark: SparkSession, root: Path, m: Manifest): StructType =
    m.schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType]).getOrElse {
      require(m.files.nonEmpty,
        s"version ${m.version} is an empty snapshot with no recorded schema")
      spark.read.option("mergeSchema", "true")
        .parquet(m.files.map(f => new Path(root, f).toString): _*).schema
    }

  /** Name-based union: `prev`'s fields (types authoritative) plus the
    * fields `next` adds — the schema an evolved append's readers see. */
  private def unionSchema(prev: StructType, next: StructType): StructType =
    StructType(prev.fields ++ next.fields.filterNot(f => prev.fieldNames.contains(f.name)))

  /** All committed versions, ascending (driver-side listing, no data read). */
  private def versions(hfs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, ManifestDir)
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  /** Latest committed version, or -1 for an empty/new table. */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val (hfs, root) = fs(spark, path)
    versions(hfs, root).lastOption.getOrElse(-1L)
  }

  /** Commit `df` as the next snapshot. `mode` is `"overwrite"` (snapshot =
    * this batch only) or `"append"` (snapshot = previous file list + this
    * batch's files). Returns the committed version. Thread-safe across
    * writers per the rename protocol above: a lost race throws
    * `ConcurrentCommitException`; re-read and retry. */
  def commit(df: DataFrame, path: String, mode: String = "append",
      ts: String = "1970-01-01T00:00:00Z", mergeSchema: Boolean = false): Long =
    commitInternal(df, path, mode, ts, None, mergeSchema)

  /** Appending a frame whose columns don't match the current snapshot is
    * schema drift: rejected (Delta's schema-on-write) unless the caller
    * opts into evolution with `mergeSchema = true`. */
  final class SchemaMismatchException(msg: String) extends RuntimeException(msg)

  private def commitInternal(df: DataFrame, path: String, mode: String,
      ts: String, txn: Option[(String, Long)],
      mergeSchema: Boolean = false): Long = {
    require(mode == "append" || mode == "overwrite", s"bad mode: $mode")
    val spark = df.sparkSession
    val (hfs, root) = fs(spark, path)
    val prev = versions(hfs, root).lastOption
    val prevSchema =
      if (mode == "append")
        prev.map(p => snapshotSchema(spark, root, readManifest(hfs, root, p)))
      else None
    // Schema-on-write (append only — an overwrite REPLACES the snapshot,
    // new schema and all): the batch's column names must equal the
    // current SNAPSHOT schema — the recorded/union schema, not one
    // file's footer, which after an earlier evolution under-reports the
    // table — or the table would silently fork. With
    // `mergeSchema = true` the append is allowed and readers see the
    // union schema (readVersion passes mergeSchema through to parquet;
    // old files read the new columns as null) — Delta's
    // autoMerge evolution.
    if (mode == "append" && !mergeSchema) prevSchema
      .filter(_.fieldNames.toSet != df.schema.fieldNames.toSet)
      .foreach { ps =>
        throw new SchemaMismatchException(
          s"append schema ${df.schema.fieldNames.mkString("[", ",", "]")} does not " +
            s"match table schema ${ps.fieldNames.mkString("[", ",", "]")} at $path; " +
            "pass mergeSchema = true to evolve")
      }
    val snapSchema = prevSchema.fold(df.schema)(unionSchema(_, df.schema))
    val next = prev.map(_ + 1).getOrElse(0L)
    // Data first: a crash after this leaves an orphaned directory that
    // vacuum reclaims; the table is unchanged until the manifest renames.
    val dataDir = newDataDir(next)
    df.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val (newFiles, newStats) = listWithStats(hfs, root, dataDir)
    val prevM = prev.map(readManifest(hfs, root, _))
    val carried =
      if (mode == "append") prevM.map(_.files).getOrElse(Seq.empty)
      else Seq.empty
    val carriedStats =
      if (mode == "append") prevM.map(_.stats).getOrElse(Map.empty)
      else Map.empty[String, Map[String, (String, String)]]
    commitManifest(hfs, root,
      Manifest(next, ts, mode, carried ++ newFiles, txn, Some(snapSchema.json),
        carriedStats ++ newStats))
    next
  }

  /** Version-prefixed but ATTEMPT-unique data directory: two writers
    * racing for the same version land their data in DISJOINT dirs (the
    * loser's is vacuum-reclaimed or re-pointed by [[commitWithRetry]]) —
    * a shared version-named dir would let the loser's overwrite corrupt
    * the winner's committed files. */
  private def newDataDir(next: Long): String =
    f"files/c$next%08d-${java.util.UUID.randomUUID.toString.take(8)}"

  /** List a freshly written data dir's parquet files plus their footer
    * stats (driver-side metadata; one footer read per new file). */
  private def listWithStats(hfs: FileSystem, root: Path, dataDir: String)
      : (Seq[String], Map[String, Map[String, (String, String)]]) = {
    val files = hfs.listStatus(new Path(root, dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDir/${s.getPath.getName}")
    (files, files.map(f => f -> footerStats(hfs, root, f)).toMap
      .filter(_._2.nonEmpty))
  }

  /** Delta OPTIMIZE for a snapshot: rewrite the latest version's content
    * as ⌈bytes / targetFileBytes⌉ files — optionally Z-ORDERed on two
    * columns for 2-D row-group skipping ([[graft.analytics.ZOrder]]) —
    * and commit it as a new `optimize` version with identical logical
    * content (spec-asserted). Bytes come from the manifest's file list
    * (driver metadata); older versions keep the small files until
    * [[vacuum]] reclaims them. The maintenance companion to
    * [[Sinks.compactPartitions]], but transactional: readers of the
    * current version are never disturbed, and a crashed optimize leaves
    * only an orphaned data dir. */
  def optimize(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zorderBy: Option[(String, String)] = None,
      ts: String = "1970-01-01T00:00:00Z"): Long = {
    val (hfs, root) = fs(spark, path)
    val prev = versions(hfs, root).lastOption.getOrElse(
      throw new IllegalArgumentException(s"optimize of empty table at $path"))
    val m = readManifest(hfs, root, prev)
    val bytes = m.files.map(f => hfs.getFileStatus(new Path(root, f)).getLen).sum
    val target = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // mergeSchema, like readVersion: a plain read takes ONE footer, so a
    // post-evolution optimize would silently ERASE the evolved column
    // from the whole table — breaking the identical-content contract
    val cur = spark.read.option("mergeSchema", "true")
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
    val laid = zorderBy match {
      // drop the helper zval column: optimize must be content-identical
      case Some((a, b)) =>
        graft.analytics.ZOrder.zOrderLayout(cur, a, b, target).drop("zval")
      case None => cur.repartition(target)
    }
    val next = prev + 1
    val dataDir = newDataDir(next)
    laid.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val (newFiles, newStats) = listWithStats(hfs, root, dataDir)
    commitManifest(hfs, root,
      Manifest(next, ts, "optimize", newFiles, None, Some(cur.schema.json), newStats))
    next
  }

  /** The highest micro-batch id committed for a streaming `appId`, or
    * None if that stream never wrote here — Delta's `txn` action for
    * exactly-once foreachBatch sinks. Driver-side manifest-header scan
    * (O(#versions); at Delta scale the log is checkpointed — here a
    * periodic [[vacuum]]-then-rebuild keeps version counts bounded). */
  def lastTxn(spark: SparkSession, path: String, appId: String): Option[Long] = {
    val (hfs, root) = fs(spark, path)
    val ids = versions(hfs, root).flatMap { v =>
      readManifest(hfs, root, v).txn.collect { case (a, b) if a == appId => b }
    }
    ids.maxOption
  }

  /** Idempotent streaming commit: commits `df` as a new snapshot UNLESS a
    * snapshot for (`appId`, a batch id ≥ `batchId`) is already in the log,
    * in which case the replay is skipped BEFORE any data is written.
    * Returns the committed version, or None for a skipped replay. With
    * foreachBatch's at-least-once delivery this yields exactly-once table
    * contents — the Delta `txn`/`FOREACHBATCH` idempotent-sink pattern.
    * `mode = "append"` is the event-sink shape; `"overwrite"` the
    * maintained-state shape (each batch replaces the whole state table,
    * as [[graft.streaming.Streams.maintainView]] does). */
  def commitIfNew(df: DataFrame, path: String, appId: String, batchId: Long,
      ts: String = "1970-01-01T00:00:00Z", mode: String = "append"): Option[Long] = {
    require(!appId.contains(":") && !appId.contains("\n"), s"bad appId: $appId")
    val spark = df.sparkSession
    if (lastTxn(spark, path, appId).exists(_ >= batchId)) None
    else Some(commitInternal(df, path, mode, ts, Some((appId, batchId))))
  }

  /** Signals a lost optimistic-concurrency race: another writer committed
    * the same version first. Re-read the log and retry on top. */
  final class ConcurrentCommitException(v: Long) extends RuntimeException(
    s"version $v was committed by a concurrent writer; re-read and retry")

  /** APPEND with automatic conflict resolution — Delta's commit-retry
    * loop for the one operation that never logically conflicts: the data
    * is written ONCE to its attempt-unique directory, and on a lost race
    * only the manifest is recomputed on top of the new head (carried
    * files re-read, version re-assigned) and re-claimed. Schema checks
    * re-run per attempt against the then-current head. Gives multi-writer
    * ingest without external coordination; MERGE/DELETE retries would
    * need read-set conflict detection (their touched files may have been
    * rewritten underneath), so those surface the exception to the caller
    * instead. */
  def commitWithRetry(df: DataFrame, path: String,
      ts: String = "1970-01-01T00:00:00Z", mergeSchema: Boolean = false,
      maxRetries: Int = 5): Long =
    commitWithRetryImpl(df, path, ts, mergeSchema, maxRetries, _ => ())

  /** Test seam: `beforeClaim(next)` runs after the version is computed
    * and before the manifest claim — the window a concurrent winner
    * lands in. */
  private[graft] def commitWithRetryImpl(df: DataFrame, path: String,
      ts: String, mergeSchema: Boolean, maxRetries: Int,
      beforeClaim: Long => Unit): Long = {
    val spark = df.sparkSession
    val (hfs, root) = fs(spark, path)
    // write once, into a dir named for the FIRST attempted version — the
    // name is a label; retries re-point the manifest at the same files
    val firstNext = versions(hfs, root).lastOption.map(_ + 1).getOrElse(0L)
    val dataDir = newDataDir(firstNext)
    df.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val (newFiles, newStats) = listWithStats(hfs, root, dataDir)
    var attempt = 0
    while (true) {
      val prev = versions(hfs, root).lastOption
      val prevM = prev.map(readManifest(hfs, root, _))
      val prevSchema = prevM.map(snapshotSchema(spark, root, _))
      if (!mergeSchema) prevSchema
        .filter(_.fieldNames.toSet != df.schema.fieldNames.toSet)
        .foreach { ps =>
          throw new SchemaMismatchException(
            s"append schema ${df.schema.fieldNames.mkString("[", ",", "]")} does not " +
              s"match table schema ${ps.fieldNames.mkString("[", ",", "]")} at $path; " +
              "pass mergeSchema = true to evolve")
        }
      val snapSchema = prevSchema.fold(df.schema)(unionSchema(_, df.schema))
      val next = prev.map(_ + 1).getOrElse(0L)
      try {
        beforeClaim(next)
        commitManifest(hfs, root, Manifest(next, ts, "append",
          prevM.map(_.files).getOrElse(Seq.empty) ++ newFiles, None,
          Some(snapSchema.json),
          prevM.map(_.stats).getOrElse(Map.empty) ++ newStats))
        return next
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Exposed for the race-guard spec: publish a manifest for an exact
    * version, failing if that version already exists. */
  private[graft] def commitManifestAt(spark: SparkSession, path: String,
      version: Long, ts: String, op: String, files: Seq[String]): Unit = {
    val (hfs, root) = fs(spark, path)
    commitManifest(hfs, root, Manifest(version, ts, op, files))
  }

  private def commitManifest(hfs: FileSystem, root: Path, m: Manifest): Unit = {
    val dir = new Path(root, ManifestDir)
    hfs.mkdirs(dir)
    val target = manifestPath(root, m.version)
    if (hfs.exists(target)) throw new ConcurrentCommitException(m.version)
    val tmp = new Path(dir, s".v${m.version}.tmp-${java.util.UUID.randomUUID}")
    val out = hfs.create(tmp, false)
    val hdr = Seq(s"version=${m.version}", s"ts=${m.ts}", s"op=${m.op}") ++
      m.txn.map { case (a, b) => s"txn=$a:$b" } ++
      m.schemaJson.map(j => s"schema=$j") ++
      m.files.flatMap { f =>
        m.stats.get(f).filter(_.nonEmpty).map { cs =>
          s"fstat=$f|" + cs.toSeq.sortBy(_._1)
            .map { case (c, (mn, mx)) => s"$c:$mn:$mx" }.mkString("|")
        }
      }
    try out.write((hdr ++ m.files)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // Atomic claim of the final name — exactly one of N racers wins.
    // HDFS: rename fails on an existing destination. Local FS: POSIX
    // rename(2) OVERWRITES, so the claim is a hard link instead —
    // link(2) fails with EEXIST atomically (the exists() precheck above
    // is only a fast path; this is the real guard on both filesystems).
    val local = Option(target.toUri.getScheme).forall(_ == "file")
    if (local) {
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        hfs.delete(tmp, false)
        throw new ConcurrentCommitException(m.version)
      }
      hfs.delete(tmp, false)
    } else if (!hfs.rename(tmp, target)) {
      hfs.delete(tmp, false)
      throw new ConcurrentCommitException(m.version)
    }
  }

  /** Read a snapshot: latest when `version` < 0, else that exact version.
    * The explicit file list goes straight to the parquet source — column
    * pruning and predicate pushdown apply as on any parquet scan.
    * `mergeSchema` (on by default) unions every file's footer schema so a
    * snapshot whose appends evolved the schema reads the union, with the
    * missing columns null on older files — a metadata-only pass, data
    * scans unchanged. */
  def readVersion(spark: SparkSession, path: String, version: Long = -1L,
      mergeSchema: Boolean = true): DataFrame = {
    val (hfs, root) = fs(spark, path)
    val v = if (version >= 0) version
      else versions(hfs, root).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
    val m = readManifest(hfs, root, v)
    if (m.files.isEmpty)
      // legal empty state (delete-all, empty-batch commit): the manifest
      // records the schema, so the head stays readable — Delta supports
      // empty table states and so does this
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        snapshotSchema(spark, root, m))
    else spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  /** A snapshot's manifest-relative data-file list (latest when
    * `version` < 0) — Delta DESCRIBE DETAIL's file inventory. Lets specs
    * and maintenance jobs verify carry-by-reference (merge/rollback must
    * NOT rewrite untouched files). */
  def snapshotFiles(spark: SparkSession, path: String, version: Long = -1L): Seq[String] = {
    val (hfs, root) = fs(spark, path)
    val v = if (version >= 0) version
      else versions(hfs, root).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
    readManifest(hfs, root, v).files
  }

  /** Time travel by timestamp: the latest snapshot with `ts` ≤ the given
    * ISO-8601 instant (string comparison — ISO-8601 sorts lexically). */
  def readAsOf(spark: SparkSession, path: String, asOf: String): DataFrame = {
    val (hfs, root) = fs(spark, path)
    val v = versions(hfs, root).map(readManifest(hfs, root, _))
      .filter(_.ts <= asOf).map(_.version).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at or before $asOf"))
    readVersion(spark, path, v)
  }

  /** The table's commit log as a DataFrame — one row per version with the
    * snapshot's file count (Delta DESCRIBE HISTORY's shape). Driver-side
    * manifest headers only; no data files are opened. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val (hfs, root) = fs(spark, path)
    import spark.implicits._
    versions(hfs, root).map { v =>
      val m = readManifest(hfs, root, v)
      (m.version, m.ts, m.op, m.files.size)
    }.toDF("version", "ts", "op", "n_files")
  }

  /** Roll the table back to `toVersion` by committing a NEW version whose
    * file list is the old snapshot's — Delta RESTORE semantics: history
    * is preserved (the bad versions stay queryable until vacuumed), no
    * data is copied, and the operation is itself just another commit. */
  def rollback(spark: SparkSession, path: String, toVersion: Long,
      ts: String = "1970-01-01T00:00:00Z"): Long = {
    val (hfs, root) = fs(spark, path)
    val target = readManifest(hfs, root, toVersion)
    val next = versions(hfs, root).last + 1
    commitManifest(hfs, root,
      Manifest(next, ts, s"rollback($toVersion)", target.files, None,
        target.schemaJson, target.stats))
    next
  }

  /** Extracts the manifest-relative data-file path from an
    * `input_file_name()` URI — keyed on the table's own
    * `files/c<8 digits>[-attempt]/<name>` layout rather than URI
    * relativization, which is sensitive to `file:/` vs `file:///`
    * qualification differences between Hadoop and Spark. Non-matching
    * inputs extract to "" (guarded at the collect sites). */
  private val DataFileRe = ".*/(files/c\\d{8}[^/]*/[^/]+)$"

  /** Rewrite-phase read for [[merge]]/[[delete]]: ONLY the given
    * manifest-relative files, as their own parquet scan. The touched set
    * is a driver-side list after discovery, so handing it to the source
    * directly makes the rewrite scan touched-set-sized BY PLAN — the
    * FileSourceScan's location lists exactly these files (spec-asserted)
    * — where a full-snapshot read filtered on `input_file_name()` opens
    * every untouched file (Spark cannot file-prune on that expression).
    * mergeSchema, like readVersion: post-evolution rewrites must not
    * drop evolved columns present in the touched files. */
  private[graft] def readTouched(spark: SparkSession, path: String,
      touched: Seq[String]): DataFrame = {
    val (_, root) = fs(spark, path)
    spark.read.option("mergeSchema", "true")
      .parquet(touched.map(f => new Path(root, f).toString): _*)
  }

  /** Copy-on-write MERGE (Delta `MERGE INTO` / upsert): rows of `updates`
    * replace snapshot rows sharing their `keyCols` values; non-matching
    * update rows insert. Only files CONTAINING a matched key are
    * rewritten — untouched files carry into the new snapshot by
    * reference (their manifest paths are byte-identical, spec-asserted),
    * so a merge touching one key rewrites one file, not the table.
    * Whole-row replacement semantics: a snapshot column the updates
    * frame doesn't carry (post-evolution merge with an old-schema batch)
    * reads null on replaced/inserted rows; survivors keep their values.
    * `updates` may not introduce NEW columns — that's schema drift,
    * rejected like a drifted append.
    *
    * Phases, exactly Delta's: (1) find touched files — one scan of the
    * snapshot semi-joined against the broadcast key set (Delta prunes
    * this scan with per-file min/max stats; here parquet row-group stats
    * prune within files, and a key-range-partitioned layout — commit
    * after `repartitionByRange(keyCols)` — keeps the touched set small);
    * (2) rewrite = touched-file survivors (anti-join over a scan of ONLY
    * the touched files — the untouched bulk of the table is opened by
    * neither phase's writer) ∪ all updates; (3) commit manifest =
    * carried untouched files + rewrite's files. The touched-file list is
    * a driver collect bounded by |files| — metadata-sized. Readers of
    * older versions are unaffected (snapshot isolation); concurrent
    * merges serialize on the commit claim. Remaining gap vs Delta, by
    * design: the DISCOVERY scan reads all files (parquet row-group
    * stats prune within them); file-level min/max stats in the manifest
    * are the eventual fix. */
  def merge(updates: DataFrame, path: String, keyCols: Seq[String],
      ts: String = "1970-01-01T00:00:00Z"): Long = {
    val spark = updates.sparkSession
    val (hfs, root) = fs(spark, path)
    val prev = versions(hfs, root).lastOption.getOrElse(
      throw new IllegalArgumentException(s"merge into empty table at $path"))
    val m = readManifest(hfs, root, prev)
    val snapSchema = snapshotSchema(spark, root, m)
    val drift = updates.schema.fieldNames.filterNot(snapSchema.fieldNames.contains)
    if (drift.nonEmpty) throw new SchemaMismatchException(
      s"merge updates carry columns ${drift.mkString("[", ",", "]")} not in the " +
        s"table schema at $path")
    // Stats pruning BEFORE the discovery scan: a file whose recorded
    // [min, max] on the first key column misses the updates' key range
    // provably contains no matched key and is never opened — Delta's
    // file-skipping, from the manifest's footer stats. Files without
    // stats stay candidates (pruning is only ever an optimization).
    val keyBounds: Option[(BigDecimal, BigDecimal)] =
      if (isNumericType(updates.schema(keyCols.head).dataType)) {
        val r = updates.agg(org.apache.spark.sql.functions.min(col(keyCols.head)).cast("string"),
          org.apache.spark.sql.functions.max(col(keyCols.head)).cast("string")).head()
        if (r.isNullAt(0)) None
        else Some((BigDecimal(r.getString(0)), BigDecimal(r.getString(1))))
      } else None
    val candidates = keyBounds match {
      case Some((lo, hi)) => m.files.filter { f =>
        m.stats.get(f).flatMap(_.get(keyCols.head)) match {
          case Some((mn, mx)) => BigDecimal(mx) >= lo && BigDecimal(mn) <= hi
          case None => true
        }
      }
      case None => m.files
    }
    // __file is relativized IN the scan (regexp over input_file_name) so
    // every comparison below is manifest-relative — immune to file:/ vs
    // file:/// qualification drift between Hadoop and Spark
    val touched =
      if (candidates.isEmpty) Set.empty[String]
      else spark.read.option("mergeSchema", "true")
        .parquet(candidates.map(f => new Path(root, f).toString): _*)
        .withColumn("__file",
          regexp_extract(input_file_name(), DataFileRe, 1))
        .join(broadcast(updates.select(keyCols.map(col): _*).distinct()), keyCols, "left_semi")
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    require(!touched.contains(""), "scan returned a file outside the table layout")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val next = prev + 1
    val dataDir = newDataDir(next)
    val rewrite =
      if (touched.isEmpty) updates
      else readTouched(spark, path, touched.toSeq.sorted)
        .join(broadcast(keys), keyCols, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    rewrite.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val (newFiles, newStats) = listWithStats(hfs, root, dataDir)
    val carried = m.files.filterNot(touched)
    commitManifest(hfs, root,
      Manifest(next, ts, "merge", carried ++ newFiles, None, Some(snapSchema.json),
        m.stats.view.filterKeys(carried.contains).toMap ++ newStats))
    next
  }

  private def isNumericType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.isInstanceOf[org.apache.spark.sql.types.NumericType]

  /** File-level data skipping from manifest stats: keep a file only if
    * `cond` MAY match some row of it — i.e. drop it only when the
    * predicate is provably false over the file's recorded [min, max]
    * ranges. Handles conjunctions/disjunctions of numeric comparisons
    * (=, <, <=, >, >=, BETWEEN after parsing) with a column on one side
    * and a literal on the other; every unrecognized shape, non-numeric
    * literal, or statless column conservatively keeps the file. NULL
    * semantics are safe by construction: stats ranges cover non-null
    * values and a NULL-evaluating predicate is never TRUE, so a pruned
    * file can't contain a qualifying row. */
  private def mayMatch(stats: Map[String, (String, String)],
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def num(v: Any): Option[BigDecimal] =
      if (v == null) None else scala.util.Try(BigDecimal(v.toString)).toOption
    def range(name: String): Option[(BigDecimal, BigDecimal)] =
      stats.get(name).map { case (mn, mx) => (BigDecimal(mn), BigDecimal(mx)) }
    def colName(ex: Expression): Option[String] = ex match {
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
    def cmp(a: Expression, b: Expression,
        f: ((BigDecimal, BigDecimal), BigDecimal) => Boolean,
        flipped: ((BigDecimal, BigDecimal), BigDecimal) => Boolean): Boolean =
      (colName(a), b) match {
        case (Some(c), Literal(v, _)) =>
          (range(c), num(v)) match {
            case (Some(r), Some(lit)) => f(r, lit)
            case _ => true
          }
        case _ => (colName(b), a) match {
          case (Some(c), Literal(v, _)) =>
            (range(c), num(v)) match {
              case (Some(r), Some(lit)) => flipped(r, lit)
              case _ => true
            }
          case _ => true
        }
      }
    e match {
      case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
      case Or(l, r) => mayMatch(stats, l) || mayMatch(stats, r)
      case EqualTo(a, b) =>
        cmp(a, b, { case ((mn, mx), v) => v >= mn && v <= mx },
          { case ((mn, mx), v) => v >= mn && v <= mx })
      case GreaterThan(a, b) =>
        cmp(a, b, { case ((_, mx), v) => mx > v }, { case ((mn, _), v) => mn < v })
      case GreaterThanOrEqual(a, b) =>
        cmp(a, b, { case ((_, mx), v) => mx >= v }, { case ((mn, _), v) => mn <= v })
      case LessThan(a, b) =>
        cmp(a, b, { case ((mn, _), v) => mn < v }, { case ((_, mx), v) => mx > v })
      case LessThanOrEqual(a, b) =>
        cmp(a, b, { case ((mn, _), v) => mn <= v }, { case ((_, mx), v) => mx >= v })
      case _ => true
    }
  }

  /** Data-skipping snapshot read (Delta's stats-based file pruning as a
    * READ face): `readWhere(path, cond)` ≡ `readVersion(path).filter(cond)`
    * — same rows, spec-asserted — but files whose manifest stats prove
    * the predicate false are dropped from the scan BEFORE Spark opens a
    * footer. On a Z-ORDERed table ([[optimize]] with `zorderBy`) a 2-D
    * range predicate prunes to the files whose rectangle intersects the
    * query box — file-level skipping on top of the row-group skipping
    * parquet already does (both measured in the Stress harness). The
    * predicate is additionally applied as a normal filter, so pruning is
    * pure optimization — unsupported predicate shapes just read the full
    * list. Returns the pruned DataFrame; [[prunedFiles]] exposes the
    * file list for specs and EXPLAIN-style reporting. */
  def readWhere(spark: SparkSession, path: String, condition: String,
      version: Long = -1L): DataFrame =
    readFiltered(spark, path, condition, version)._1

  /** The manifest-relative files [[readWhere]] would scan. */
  def prunedFiles(spark: SparkSession, path: String, condition: String,
      version: Long = -1L): Seq[String] =
    readFiltered(spark, path, condition, version)._2

  private def readFiltered(spark: SparkSession, path: String, condition: String,
      version: Long): (DataFrame, Seq[String]) = {
    val (hfs, root) = fs(spark, path)
    val v = if (version >= 0) version
      else versions(hfs, root).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
    val m = readManifest(hfs, root, v)
    val cond = spark.sessionState.sqlParser.parseExpression(condition)
    val kept = m.files.filter(f => mayMatch(m.stats.getOrElse(f, Map.empty), cond))
    val snapSchema = snapshotSchema(spark, root, m)
    val df =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snapSchema)
      else {
        // align to the SNAPSHOT schema: pruning must not narrow the
        // result's columns when an evolved column lives only in pruned
        // files (their rows are excluded, the column is not)
        val base = spark.read.option("mergeSchema", "true")
          .parquet(kept.map(f => new Path(root, f).toString): _*)
        base.select(snapSchema.fields.map { f =>
          if (base.columns.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*)
      }
    (df.filter(expr(condition)), kept)
  }

  /** The discovery-scan candidate list [[merge]] would read for updates
    * whose first key column spans [lo, hi] — exposed so specs can assert
    * the stats pruning (a range-partitioned table's untouched files must
    * not even be candidates). */
  private[graft] def discoveryCandidates(spark: SparkSession, path: String,
      keyCol: String, lo: BigDecimal, hi: BigDecimal): Seq[String] = {
    val (hfs, root) = fs(spark, path)
    val m = readManifest(hfs, root, versions(hfs, root).last)
    m.files.filter { f =>
      m.stats.get(f).flatMap(_.get(keyCol)) match {
        case Some((mn, mx)) => BigDecimal(mx) >= lo && BigDecimal(mn) <= hi
        case None => true
      }
    }
  }

  /** Copy-on-write DELETE: rows matching `condition` leave the snapshot;
    * only files containing a match are rewritten, the rest carry by
    * reference (same machinery as [[merge]], with the predicate as the
    * match). `condition` is a SQL boolean expression over the table's
    * columns. */
  def delete(spark: SparkSession, path: String, condition: String,
      ts: String = "1970-01-01T00:00:00Z"): Long = {
    val (hfs, root) = fs(spark, path)
    val prev = versions(hfs, root).lastOption.getOrElse(
      throw new IllegalArgumentException(s"delete from empty table at $path"))
    val m = readManifest(hfs, root, prev)
    val snapSchema = snapshotSchema(spark, root, m)
    // stats-pruned discovery: files whose manifest [min,max] ranges prove
    // the predicate false contain no deletable row and are never opened
    val condExpr = spark.sessionState.sqlParser.parseExpression(condition)
    val candidates =
      m.files.filter(f => mayMatch(m.stats.getOrElse(f, Map.empty), condExpr))
    val touched =
      if (candidates.isEmpty) Set.empty[String]
      else spark.read.option("mergeSchema", "true")
        .parquet(candidates.map(f => new Path(root, f).toString): _*)
        .withColumn("__file",
          regexp_extract(input_file_name(), DataFileRe, 1))
        .filter(expr(condition))
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    require(!touched.contains(""), "scan returned a file outside the table layout")
    val next = prev + 1
    val dataDir = newDataDir(next)
    val (newFiles, newStats) = if (touched.nonEmpty) {
      // rewrite reads ONLY the touched files (readTouched — the plan's
      // scan is touched-set-sized); keep rows where the predicate is
      // false OR NULL (three-valued logic: only cond-IS-TRUE rows are
      // deleted, Delta's semantics — a bare !cond would silently drop
      // NULL-evaluating rows)
      val survivors = readTouched(spark, path, touched.toSeq.sorted)
        .filter(!coalesce(expr(condition), lit(false)))
      survivors.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
      listWithStats(hfs, root, dataDir)
    } else (Seq.empty[String], Map.empty[String, Map[String, (String, String)]])
    val carried = m.files.filterNot(touched)
    commitManifest(hfs, root,
      Manifest(next, ts, s"delete", carried ++ newFiles,
        None, Some(snapSchema.json),
        m.stats.view.filterKeys(carried.contains).toMap ++ newStats))
    next
  }

  /** Change data feed between two snapshots (Delta CDF / `table_changes`):
    * row-level `insert` / `delete` / `update_preimage` / `update_postimage`
    * classification keyed on `keyCols`, computed from the MANIFEST DIFF —
    * only files added or removed between the versions are opened; files
    * carried by reference (the untouched bulk of a copy-on-write table)
    * contribute nothing and are never read. That is the property that
    * makes CDF viable at 100 TB: a merge touching one key reads two
    * files here, not two snapshots. Unchanged rows inside a rewritten
    * file cancel in the keyed full-outer compare (null-safe struct
    * equality), so copy-on-write rewrite artifacts never surface as
    * changes.
    *
    * Output: the table's columns plus `_change_type`; updates emit both
    * images (Delta's CDF shape). Precondition, same as [[merge]]:
    * `keyCols` unique per snapshot. Reads both sides with mergeSchema
    * and aligns columns by name (union schema) so the feed spans
    * schema-evolution commits; pre-evolution rows read the new columns
    * as null. */
  def changes(spark: SparkSession, path: String, keyCols: Seq[String],
      fromVersion: Long, toVersion: Long): DataFrame = {
    val (hfs, root) = fs(spark, path)
    val from = readManifest(hfs, root, fromVersion).files
    val to = readManifest(hfs, root, toVersion).files
    val removed = from.filterNot(to.toSet)
    val added = to.filterNot(from.toSet)
    def readFiles(files: Seq[String]): Option[DataFrame] =
      if (files.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(files.map(f => new Path(root, f).toString): _*))
    (readFiles(removed), readFiles(added)) match {
      case (None, None) =>
        // metadata-only commit (rollback to self, optimize no-op): no
        // data files differ, the feed is empty by construction
        readVersion(spark, path, toVersion).limit(0)
          .withColumn("_change_type", lit(""))
      case (None, Some(post)) =>
        post.withColumn("_change_type", lit("insert"))
      case (Some(pre), None) =>
        pre.withColumn("_change_type", lit("delete"))
      case (Some(pre0), Some(post0)) =>
        // align by name across schema evolution: each side selects the
        // union column set, missing names as typed nulls from the other
        val preCols = pre0.schema.fieldNames.toSeq
        val postCols = post0.schema.fieldNames.toSeq
        val all = preCols ++ postCols.filterNot(preCols.contains)
        def aligned(df: DataFrame, own: Seq[String], other: DataFrame) =
          df.select(all.map { c =>
            if (own.contains(c)) col(c)
            else lit(null).cast(other.schema(c).dataType).as(c)
          }: _*)
        val pre = aligned(pre0, preCols, post0)
        val post = aligned(post0, postCols, pre0)
        val dataCols = all.filterNot(keyCols.contains)
        val lhs = pre.select(keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__pre"): _*)
        val rhs = post.select(keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__post"): _*)
        val j = lhs.join(rhs, keyCols, "full_outer")
        def emit(img: String, tpe: String) = j
          .filter(tpe match {
            case "insert" => col("__pre").isNull
            case "delete" => col("__post").isNull
            case _ => col("__pre").isNotNull && col("__post").isNotNull &&
              !(col("__pre") <=> col("__post"))
          })
          .select(all.map { c =>
            if (keyCols.contains(c)) col(c) else col(s"$img.$c").as(c)
          } :+ lit(tpe).as("_change_type"): _*)
        emit("__post", "insert")
          .unionByName(emit("__pre", "delete"))
          .unionByName(emit("__pre", "update_preimage"))
          .unionByName(emit("__post", "update_postimage"))
    }
  }

  /** Delete data files referenced ONLY by versions older than the last
    * `retainVersions` snapshots (plus any orphaned commit directories from
    * crashed/lost-race writers). Old manifests are kept — history stays
    * listable; reading a vacuumed version fails at scan time, as in Delta.
    * Driver-side metadata diff; returns the deleted file count. */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 2): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val (hfs, root) = fs(spark, path)
    val vs = versions(hfs, root)
    if (vs.isEmpty) return 0
    val referenced = vs.takeRight(retainVersions)
      .flatMap(readManifest(hfs, root, _).files).toSet
    val filesDir = new Path(root, "files")
    if (!hfs.exists(filesDir)) return 0
    var deleted = 0
    hfs.listStatus(filesDir).foreach { cdir =>
      val rel = s"files/${cdir.getPath.getName}"
      val keep = hfs.listStatus(cdir.getPath).toSeq.filter { f =>
        referenced.contains(s"$rel/${f.getPath.getName}")
      }
      if (keep.isEmpty) {
        // whole commit dir unreferenced (vacuumed version or orphaned
        // write) — count its parquet files, drop the directory
        deleted += hfs.listStatus(cdir.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        hfs.delete(cdir.getPath, true)
      } else {
        hfs.listStatus(cdir.getPath).foreach { f =>
          if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
              !referenced.contains(s"$rel/${f.getPath.getName}")) {
            hfs.delete(f.getPath, false); deleted += 1
          }
        }
      }
    }
    deleted
  }
}
