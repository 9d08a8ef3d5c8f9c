package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed file sources (reference src/ingestion/bronze_loader.py:16-37 —
  * CSV with explicit schema and timestamp casts; schema-on-read is never
  * inferred in production: inference scans the data twice and drifts).
  */
object Sources {

  /** The raw events schema (CSV carries ts as epoch micros or ISO text). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** CSV → typed events frame: explicit schema, malformed rows preserved
    * in a corrupt-record column for auditing instead of silently dropped
    * (PERMISSIVE, the bronze-layer contract: keep everything, flag junk). */
  def readEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventsSchema.add("_corrupt_record", StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** JSONL (one JSON document per line) → typed frame with the same
    * bronze-layer contract as the CSV path: explicit schema (inference
    * double-scans and drifts), PERMISSIVE parse, malformed lines kept in
    * `_corrupt_record`. The default format for web-scraped / exported
    * training-data corpora; line-delimited JSON splits cleanly, so a
    * 100 TB dump parallelizes like any text source. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** The documents schema for JSONL corpora. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** ORC source (the other columnar warehouse format; schema enforced for
    * the same no-inference reason as CSV/JSONL). ORC carries predicate
    * pushdown + column pruning like parquet, so downstream plans are
    * format-agnostic. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Generic parquet source with column pruning pushed by construction. */
  def readParquet(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (columns.isEmpty) df else df.select(columns.map(col): _*)
  }

  /** Parquet source tolerant of schema drift across files: `mergeSchema`
    * unions every file's footer schema, so a column added mid-stream
    * (the normal state of a months-old 100 TB landing zone) reads as null
    * on older files instead of failing or silently disappearing —
    * without it, Spark reads ONE footer and drops columns that file
    * lacks. Footer merging costs one metadata pass at planning; data
    * scans are unchanged, pruning/pushdown still apply. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Raw binary-asset source (`binaryFile` format): each matching file
    * becomes one row of (path, modificationTime, length, content) — the
    * ingestion path for image/audio/video payloads feeding
    * [[graft.multimodal.Multimodal]]. `pathGlobFilter` prunes at FILE
    * LISTING time (never opens non-matching files), and
    * `maxBytesPerFile` is a hard guard against a stray multi-GB asset
    * OOMing an executor (rows carry whole payloads; Spark caps
    * `binaryFile` rows at spark.sql.sources.binaryFile.maxLength, 2 GB).
    * At 100 TB the listing itself is the scale risk — feed partitioned
    * subdirectories, not one flat million-file dir. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*", maxBytes: Long = 64L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .filter(col("length") <= maxBytes)
}
