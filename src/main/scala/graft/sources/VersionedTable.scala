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
    * optional streaming transaction marker `appId -> batchId`, and the
    * snapshot's logical schema as Spark DataType JSON — recorded so an
    * EMPTY snapshot (delete-all, empty-batch commit) stays readable and
    * the append schema check never depends on one file's footer). */
  private case class Manifest(version: Long, ts: String, op: String,
      files: Seq[String], txn: Option[(String, Long)] = None,
      schemaJson: Option[String] = None)

  private def readManifest(hfs: FileSystem, root: Path, v: Long): Manifest = {
    val in = hfs.open(manifestPath(root, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val hdr = lines.takeWhile(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val txn = hdr.get("txn").map { t =>
      val i = t.lastIndexOf(':')
      (t.substring(0, i), t.substring(i + 1).toLong)
    }
    Manifest(hdr("version").toLong, hdr("ts"), hdr("op"),
      lines.dropWhile(_.contains("=")), txn, hdr.get("schema"))
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
    val dataDir = f"files/c$next%08d"
    df.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val newFiles = hfs.listStatus(new Path(root, dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDir/${s.getPath.getName}")
    val carried =
      if (mode == "append") prev.map(readManifest(hfs, root, _).files).getOrElse(Seq.empty)
      else Seq.empty
    commitManifest(hfs, root,
      Manifest(next, ts, mode, carried ++ newFiles, txn, Some(snapSchema.json)))
    next
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
    val dataDir = f"files/c$next%08d"
    laid.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val newFiles = hfs.listStatus(new Path(root, dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDir/${s.getPath.getName}")
    commitManifest(hfs, root,
      Manifest(next, ts, "optimize", newFiles, None, Some(cur.schema.json)))
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
      m.schemaJson.map(j => s"schema=$j")
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
      Manifest(next, ts, s"rollback($toVersion)", target.files, None, target.schemaJson))
    next
  }

  /** Extracts the manifest-relative data-file path from an
    * `input_file_name()` URI — keyed on the table's own
    * `files/c<8 digits>/<name>` layout rather than URI relativization,
    * which is sensitive to `file:/` vs `file:///` qualification
    * differences between Hadoop and Spark. Non-matching inputs extract
    * to "" (guarded at the collect sites). */
  private val DataFileRe = ".*/(files/c\\d{8}/[^/]+)$"

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
    // __file is relativized IN the scan (regexp over input_file_name) so
    // every comparison below is manifest-relative — immune to file:/ vs
    // file:/// qualification drift between Hadoop and Spark
    val cur = spark.read.option("mergeSchema", "true")
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
      .withColumn("__file",
        regexp_extract(input_file_name(), DataFileRe, 1))
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val touched = cur.join(broadcast(keys), keyCols, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    require(!touched.contains(""), "scan returned a file outside the table layout")
    val next = prev + 1
    val dataDir = f"files/c$next%08d"
    val rewrite =
      if (touched.isEmpty) updates
      else readTouched(spark, path, touched.toSeq.sorted)
        .join(broadcast(keys), keyCols, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    rewrite.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
    val newFiles = hfs.listStatus(new Path(root, dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDir/${s.getPath.getName}")
    val carried = m.files.filterNot(touched)
    commitManifest(hfs, root,
      Manifest(next, ts, "merge", carried ++ newFiles, None, Some(snapSchema.json)))
    next
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
    val cur = spark.read.option("mergeSchema", "true")
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
      .withColumn("__file",
        regexp_extract(input_file_name(), DataFileRe, 1))
    val touched = cur.filter(expr(condition))
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    require(!touched.contains(""), "scan returned a file outside the table layout")
    val next = prev + 1
    val dataDir = f"files/c$next%08d"
    val newFiles = if (touched.nonEmpty) {
      // rewrite reads ONLY the touched files (readTouched — the plan's
      // scan is touched-set-sized); keep rows where the predicate is
      // false OR NULL (three-valued logic: only cond-IS-TRUE rows are
      // deleted, Delta's semantics — a bare !cond would silently drop
      // NULL-evaluating rows)
      val survivors = readTouched(spark, path, touched.toSeq.sorted)
        .filter(!coalesce(expr(condition), lit(false)))
      survivors.write.mode("overwrite").parquet(new Path(root, dataDir).toString)
      hfs.listStatus(new Path(root, dataDir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s"$dataDir/${s.getPath.getName}")
    } else Seq.empty
    commitManifest(hfs, root,
      Manifest(next, ts, s"delete", m.files.filterNot(touched) ++ newFiles,
        None, Some(snapSchema.json)))
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
