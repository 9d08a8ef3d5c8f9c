package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver layer: clean, validate, deduplicate.
  *
  * Re-expresses the reference's silver transformation (reference
  * src/transformation/bronze_to_silver.py:17-44) over the driver's
  * `events` table:
  *   - string normalization (lower/trim) of categorical columns,
  *   - conditional null-out of measures that are meaningless for a given
  *     state (reference nulls `completed_at` for cancelled trips; graft
  *     nulls `value` for error events),
  *   - required-key filter,
  *   - latest-wins dedup via a row_number window over the primary key.
  *
  * Scale notes: the dedup window shuffles on the primary key only — at
  * 100 TB that is one hash exchange over a high-cardinality key (no skew),
  * and AQE coalesces the result. Everything else is a narrow map.
  */
object Silver {

  /** Full silver clean for events. Output adds `zone_id` (parsed from the
    * JSON `props` payload) — the analog of the reference's pickup zone —
    * and `event_date` for partitioning. */
  def cleanEvents(bronze: DataFrame): DataFrame = {
    val normalized = bronze
      .withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("value",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .withColumn("zone_id", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("event_id").isNotNull && col("user_id").isNotNull && col("ts").isNotNull)

    val w = Window.partitionBy("event_id").orderBy(col("ts").desc)
    normalized
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("event_date", to_date(col("ts")))
  }
}
