package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.streaming.OutputMode

/** `df.writeStream.format("graft").start(path)` — the versioned table
  * as a STREAMING SINK (Delta's writeStream idiom, re-derived on the
  * DataSource-V1 `Sink` seam). Exactly-once by the same mechanism as
  * [[graft.streaming.Streams.toVersionedSink]]: every batch commits
  * through [[VersionedTable.commitIfNew]] keyed on
  * (streaming query id, batch id) — the txn watermark rides the
  * manifest log, so a replayed batch after failure/restart is a
  * metadata no-op, never duplicate rows (Delta's appId:batchId txn
  * action).
  *
  * OutputMode.Append appends each batch; OutputMode.Complete
  * overwrites the snapshot with each batch (the maintained-state
  * shape). Options: `partitionBy` also accepted via the writer's
  * `partitionBy(...)` clause; `autoCompactEvery` = fold small files
  * every Nth committed batch (`smallBytes` threshold, default 8 MB) —
  * replayed batches never trigger it; `mergeSchema` = a batch carrying
  * new columns widens the table instead of failing the query (Delta's
  * streaming schema-evolution opt-in).
  *
  * Commit timestamps are `tsBase + batchId` seconds, where the base
  * DEFAULTS TO WALL CLOCK at sink construction: age-based retention
  * (`VACUUM ... RETAIN n HOURS`, `restoreToTimestamp`, the 7-day
  * vacuum grace) must see sink commits as CURRENT — an EPOCH-anchored
  * base would make every commit look 56 years stale, vacuously passing
  * every retention cutoff and silently disarming the in-flight-commit
  * grace protection. Pass `tsBaseEpochSec` for deterministic
  * timestamps (tests, reproducible fixtures) — with it set, age-based
  * VACUUM on the sink table is on the caller to reason about. */
final class GraftStreamSink(spark: SparkSession, path: String,
    options: Map[String, String], partitionCols: Seq[String],
    outputMode: OutputMode) extends Sink {

  private val autoCompactEvery =
    options.get("autocompactevery").map(_.trim.toInt).getOrElse(0)
  // Delta's schema-evolution opt-in for streaming writes: a batch
  // carrying new columns widens the table instead of failing the query
  private val mergeSchema =
    options.get("mergeschema").exists(_.trim.toBoolean)
  private val smallBytes =
    options.get("smallbytes").map(_.trim.toLong).getOrElse(8L * 1024 * 1024)
  private val tsBase =
    options.get("tsbaseepochsec").map(_.trim.toLong)
      .getOrElse(java.time.Instant.now().getEpochSecond)
  private val mode =
    if (outputMode == OutputMode.Complete()) "overwrite" else "append"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine hands an incrementally-planned frame that batch
    // writers refuse — re-wrap its rows as a plain batch frame
    val batch = GraftBridge.batchDf(spark, data.queryExecution.toRdd, data.schema)
    // the streaming query id IS the txn appId (Delta's choice): stable
    // across restarts of the same checkpointed query, distinct across
    // queries
    val appId = Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("graft-stream")
    val ts = java.time.Instant.EPOCH.plusSeconds(tsBase + batchId).toString
    val committed = VersionedTable.commitIfNew(batch, path, appId, batchId,
      ts, mode = mode, partitionBy = partitionCols, mergeSchema = mergeSchema)
    if (autoCompactEvery > 0 && committed.isDefined &&
        batchId % autoCompactEvery == (autoCompactEvery - 1))
      VersionedTable.compactSmall(spark, path, smallBytes, ts = ts)
    ()
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
