package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All graft operators take DataFrames, never paths — the loaders are the
  * only place that knows the layout, so a cluster deployment can swap in
  * catalog tables / different storage without touching operator code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s `ts` flavor has varied across driver generations:
    * nanos-since-epoch longs (read via `spark.sql.legacy.parquet
    * .nanosAsLong=true`, truncated to micros like DuckDB), naive
    * `timestamp[us]` (which Spark 4 infers as TIMESTAMP_NTZ — legal for
    * batch but rejected by streaming watermarks), or a plain UTC
    * timestamp. Normalize all three to session-UTC `TimestampType` here so
    * every operator — batch or streaming — sees one type. The NTZ→TZ cast
    * is value-preserving because every graft entry point pins
    * `spark.sql.session.timeZone=UTC`, matching DuckDB's naive reading. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType                      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _                             => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  /** documents/embeddings arrive as one small parquet file per SF → one
    * input partition, which would serialize every downstream explode/join
    * on a single core. Spread them across the cluster at load; on a real
    * multi-file 100 TB layout the scan is already parallel and this
    * repartition of a tiny table is noise.
    *
    * Spread by HASH of the table key, not round-robin: Spark preserves a
    * user repartition as the subtree's output partitioning, so a
    * round-robin here re-appears as a full-output Exchange ABOVE any
    * terminal key-join (measured on the decontamination queries, whose
    * last operator is a doc_id anti-join) — whereas hash-on-key output
    * partitioning is already satisfied by the join and costs nothing. */
  private def spread(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key)) else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = spread(load(spark, dir, "documents"), "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spread(load(spark, dir, "embeddings"), "vec_id")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
