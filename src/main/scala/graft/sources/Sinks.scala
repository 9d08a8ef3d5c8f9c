package graft.sources

import org.apache.spark.sql.DataFrame

/** Partitioned table sinks (reference writes every layer date-partitioned
  * — bronze_loader.py:33-37, silver_to_gold.py — via Delta; graft writes
  * plain parquet with the same layout guarantees, storage-format
  * agnostic).
  *
  * Scale notes: `overwritePartitions` uses DYNAMIC partition overwrite —
  * only partitions present in the batch are replaced, so an incremental
  * daily run rewrites one date directory, not the table. That plus
  * deterministic operator output is what makes re-runs idempotent without
  * a transaction log. `maxRecordsPerFile` bounds file sizes so a skewed
  * partition cannot produce a single multi-GB file.
  */
object Sinks {

  /** Full-table write, partitioned by the given columns. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table write: rows hash-partitioned into `nBuckets` files per
    * partition by `bucketCol` and sorted within each bucket. Two tables
    * bucketed the same way equi-join with ZERO shuffle (and no sort) — at
    * 100 TB this turns every recurring fact-fact join on the bucket key
    * into a map-side merge. The catalog entry is what carries the bucket
    * spec; `path` keeps the data external to the warehouse dir. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** ORC sink, partitioned like [[writePartitioned]] — one call swaps the
    * storage format without touching any operator. */
  def writeOrcPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .orc(path)

  /** Incremental write: replaces ONLY the partitions present in `df`,
    * leaving the rest of the table untouched (idempotent re-run of one
    * day's batch). */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
