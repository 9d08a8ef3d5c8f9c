package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze layer: typed ingest + audit columns.
  *
  * Mirrors the reference's bronze loader (reference
  * src/ingestion/bronze_loader.py:16-37): cast event-time columns, attach
  * audit metadata, and derive the partition date. The partition date is the
  * load-bearing piece at scale — every downstream layer is partitioned by
  * it, so date-range queries prune files instead of scanning 100 TB.
  */
object Bronze {

  /** Deterministic part of ingest: event-time cast + derived partition date.
    * Kept separate from [[withAuditColumns]] so correctness oracles (and
    * idempotent re-runs) see a pure function of the input.
    */
  def ingestEvents(raw: DataFrame): DataFrame =
    raw
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", to_date(col("ts")))

  /** Non-deterministic audit metadata, applied at write time only
    * (reference bronze_loader.py:30-35). */
  def withAuditColumns(df: DataFrame): DataFrame =
    df.withColumn("ingested_at", current_timestamp())
      .withColumn("source_file", input_file_name())

  /** Date-partitioned parquet write — the bronze persistence contract.
    * Partitioning by event_date gives partition pruning for every
    * downstream incremental read. */
  def writeBronze(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("event_date").parquet(path)
}
