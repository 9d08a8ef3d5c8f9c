package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold layer: star schema (dimensions + facts).
  *
  * Re-expresses the reference's gold build (reference
  * src/transformation/silver_to_gold.py:27-165): surrogate keys are
  * sha256 hashes of the natural key so dimension keys are stable across
  * incremental rebuilds (no monotonically_increasing_id, which is
  * partition-layout dependent and unusable at scale).
  *
  * Scale notes: all dims here are bounded (calendar minutes, zones ≤ ~100,
  * users bounded by the population) while the fact grows with data — so
  * every fact-dim join is a broadcast join; the fact table is never
  * shuffled during the star build. Dim builds themselves are
  * distinct-aggregations: one partial-agg shuffle each, on keys whose
  * cardinality is tiny relative to input.
  */
object Gold {

  /** Surrogate time key at minute grain (reference silver_to_gold.py:40-43). */
  private def timeIdCol = sha2(
    concat_ws("||",
      to_date(col("ts")).cast("string"),
      hour(col("ts")).cast("string"),
      minute(col("ts")).cast("string")), 256)

  /** Calendar dimension at minute grain. */
  def dimTime(silver: DataFrame): DataFrame =
    silver.select(col("ts")).where(col("ts").isNotNull)
      .select(
        to_date(col("ts")).as("date"),
        year(col("ts")).as("year"),
        month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"),
        dayofweek(col("ts")).as("day_of_week"),
        hour(col("ts")).as("hour"),
        minute(col("ts")).as("minute"))
      .dropDuplicates()
      .withColumn("time_id",
        sha2(concat_ws("||",
          col("date").cast("string"),
          col("hour").cast("string"),
          col("minute").cast("string")), 256))
      .select("time_id", "date", "year", "month", "day", "day_of_week", "hour", "minute")

  /** User dimension with stable surrogate key. */
  def dimUsers(silver: DataFrame): DataFrame =
    silver.select("user_id").where(col("user_id").isNotNull).dropDuplicates()
      .withColumn("user_key", sha2(col("user_id").cast("string"), 256))
      .select("user_key", "user_id")

  /** Zone dimension (analog of the reference's location dim, which unions
    * pickup+dropoff zones — silver_to_gold.py:46-59). */
  def dimZones(silver: DataFrame): DataFrame =
    silver.select(col("zone_id")).where(col("zone_id").isNotNull).dropDuplicates()
      .withColumn("city", lit("synthetic_city"))
      .withColumn("zone_type", lit("zone"))
      .withColumn("location_id", sha2(col("zone_id").cast("string"), 256))
      .select("location_id", "zone_id", "city", "zone_type")

  /** Event fact: silver grain, dim surrogate keys resolved via dim joins.
    *
    * Zones are structurally bounded (≤ ~200) so they carry an explicit
    * broadcast hint. The user dimension grows with the population — an
    * unconditional hint could exceed broadcast limits on a 100 TB run, so
    * we leave the strategy to Catalyst/AQE size estimation: small user
    * dims still broadcast (autoBroadcastJoinThreshold), huge ones degrade
    * gracefully to a shuffled join instead of OOMing the driver. */
  def factEvents(silver: DataFrame, users: DataFrame, zones: DataFrame): DataFrame =
    silver
      .withColumn("time_id", timeIdCol)
      .join(users, Seq("user_id"), "left")
      .join(broadcast(zones.select(col("location_id"), col("zone_id"))), Seq("zone_id"), "left")
      .select(
        col("event_id"), col("time_id"), col("user_key"),
        col("location_id"), col("event_type"), col("value"),
        col("ts"), col("event_date"))

  /** Event-type dimension — the driver's events schema has no
    * driver/vehicle column (SURVEY §3 maps `driver_id → —`), so the
    * reference's extra-dimension builds (dim_drivers/dim_vehicle,
    * silver_to_gold.py:69-82: distinct natural key + surrogate) are
    * exercised through the two dimension roles the events DO carry:
    * this bounded categorical dim plus the zone dim in a second (origin)
    * role — see [[factEventsWide]]. */
  def dimEventTypes(silver: DataFrame): DataFrame =
    silver.select("event_type").where(col("event_type").isNotNull).dropDuplicates()
      .withColumn("event_type_key", sha2(col("event_type"), 256))
      .select("event_type_key", "event_type")

  /** Wide event fact: FOUR dimension roles per row — user, current zone,
    * ORIGIN zone (the previous event's zone per user, the mobility analog
    * of the reference's pickup vs dropoff double-role location join,
    * silver_to_gold.py:112-113 joins trips_fact to two extra dims the
    * same way), and event type.
    *
    * Scale: the origin-zone lag windows on `user_id` — the same
    * data-growing key the silver dedup already shuffles on, so AQE can
    * reuse sizing; the three bounded dims (zones twice, event types once)
    * are explicit broadcasts — the fact is never shuffled for a dim join;
    * the user dim is left to Catalyst/AQE size estimation exactly as in
    * [[factEvents]]. */
  def factEventsWide(silver: DataFrame, users: DataFrame, zones: DataFrame,
      eventTypes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    silver
      .withColumn("time_id", timeIdCol)
      .withColumn("origin_zone_id", lag(col("zone_id"), 1).over(byUser))
      .join(users, Seq("user_id"), "left")
      .join(broadcast(zones.select(col("location_id"), col("zone_id"))),
        Seq("zone_id"), "left")
      .join(broadcast(zones.select(col("location_id").as("origin_location_id"),
        col("zone_id").as("origin_zone_id"))), Seq("origin_zone_id"), "left")
      .join(broadcast(eventTypes), Seq("event_type"), "left")
      .select(
        col("event_id"), col("time_id"), col("user_key"),
        col("location_id"), col("origin_location_id"), col("event_type_key"),
        col("value"), col("ts"), col("event_date"))
  }

  /** Payments fact: monetary events only (reference payments_fact keeps
    * fares — silver_to_gold.py:146-165; here `purchase` events carry the
    * amount). Filter FIRST so the join input is already pruned. */
  def factPayments(silver: DataFrame, users: DataFrame): DataFrame =
    silver
      .filter(col("event_type") === "purchase")
      .withColumn("time_id", timeIdCol)
      .join(users, Seq("user_id"), "left")
      .select(
        col("event_id").as("payment_id"),
        col("event_id"), col("time_id"), col("user_key"),
        col("value").as("amount"), col("event_date"))

  /** Slowly-changing-dimension type 2: each user's zone-assignment history
    * as validity intervals. Consecutive events in the same zone collapse
    * into one run; a zone change closes the open interval
    * (`valid_to` = next run's `valid_from`, half-open) and the last run
    * per user is the current one (`valid_to` NULL, `is_current` true).
    * This is the warehouse-standard versioned-dimension build the
    * reference's static `dim_users` cannot express.
    *
    * Scale: both windows and the run aggregation partition by `user_id` —
    * the natural key whose cardinality grows with data, so per-partition
    * state stays bounded and there is no global sort. The run-group id is
    * a running count of change points in (ts, event_id) order; event_id is
    * unique after silver dedup, so the order — and therefore the whole
    * output — is deterministic on any engine. */
  def scd2UserZones(silver: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byEvent = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = silver
      .filter(col("zone_id").isNotNull && col("ts").isNotNull)
      .select("user_id", "ts", "event_id", "zone_id")
      .withColumn("chg",
        when(lag(col("zone_id"), 1).over(byEvent).isNull
          || lag(col("zone_id"), 1).over(byEvent) =!= col("zone_id"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg"))
        .over(byEvent.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(
        min(col("zone_id")).as("zone_id"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    // Same-timestamp runs order by grp (monotone in event order), so the
    // interval chain is deterministic even under ts ties.
    val byStart = Window.partitionBy("user_id").orderBy(col("valid_from"), col("grp"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "zone_id", "valid_from", "valid_to", "is_current", "n_events")
  }
}
