package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold aggregate tables (reference src/transformation/gold_aggregates.py:37-66).
  *
  * Every aggregate is a single groupBy over the date-partitioned fact —
  * map-side partial aggregation then one shuffle on the (low-cardinality)
  * group key. Double-typed measures are rounded at the edge so results are
  * bit-stable across partition orderings (sum-of-doubles is
  * order-sensitive in the last ulps; rounding to the business precision
  * makes the output deterministic).
  */
object Aggregates {

  /** Hourly demand by zone (reference demand_hourly_by_pickup_zone). */
  def demandHourlyByZone(fact: DataFrame): DataFrame =
    fact
      .groupBy(
        col("event_date").as("date"),
        hour(col("ts")).as("hour"),
        col("zone_id"))
      .agg(count(lit(1)).as("event_count"))

  /** Daily revenue stats by zone on monetary events (reference
    * revenue_daily_by_pickup_zone keeps completed trips; here purchases).
    *
    * Monetary values are 2-decimal, so sums run in exact integer CENTS
    * (`sum(round(value*100))`): integer-valued doubles add exactly, making
    * the sum independent of partition/merge order — the engine-order ulp
    * drift that `round(avg(x), 4)` amplified into last-digit flips at .5
    * rounding boundaries (66 rows at sf0.1, round 6) cannot arise. The
    * average is the unrounded exact-cents quotient: identical operands →
    * bit-identical double on every engine, no tie to round. */
  def revenueDailyByZone(fact: DataFrame): DataFrame =
    fact
      .filter(col("event_type") === "purchase")
      .groupBy(col("event_date").as("date"), col("zone_id"))
      .agg(
        round(sum(round(col("value") * 100)) / 100, 2).as("total_revenue"),
        (sum(round(col("value") * 100)) / 100 / count(lit(1))).as("avg_value"),
        count(lit(1)).as("purchase_count"))

  /** Per-user daily summary (reference driver_daily_summary). Exact-cents
    * arithmetic for the same reason as [[revenueDailyByZone]]. */
  def userDailySummary(fact: DataFrame): DataFrame =
    fact
      .filter(col("event_type") === "purchase")
      .groupBy(col("event_date").as("date"), col("user_id"))
      .agg(
        count(lit(1)).as("purchase_count"),
        round(sum(round(col("value") * 100)) / 100, 2).as("user_revenue"),
        (sum(round(col("value") * 100)) / 100 / count(lit(1))).as("avg_purchase_value"))

  /** Daily revenue per zone with a running cumulative and each day's share
    * of the zone total — the window-function face of [[revenueDailyByZone]].
    * Both windows partition by zone (the data-growing key), so state per
    * partition is one zone's days; the running sum adds in ascending date
    * order on both engines, keeping the doubles bit-stable under rounding. */
  def revenueCumulativeByZone(fact: DataFrame): DataFrame = {
    val daily = fact
      .filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
      .groupBy(col("zone_id"), col("event_date").as("date"))
      .agg(round(sum(col("value")), 2).as("daily_revenue"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("zone_id").orderBy("date")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("zone_id")
    daily
      .withColumn("cum_revenue", round(sum("daily_revenue").over(wCum), 2))
      .withColumn("revenue_share",
        round(col("daily_revenue") / sum("daily_revenue").over(wTot), 6))
  }

  /** Ordered conversion funnel: how many users reached each stage IN
    * ORDER — a signup, then a click at-or-after that signup, then a
    * purchase at-or-after that first qualifying click. The ordering
    * constraints are running-window gates over ONE shuffle+sort on
    * user_id (each event sees the stage state accumulated before it);
    * the per-user and global roll-ups reuse that partitioning, so the
    * whole funnel — any number of stages — costs one shuffle. */
  def conversionFunnel(fact: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val staged = fact
      .filter(col("user_id").isNotNull)
      .withColumn("saw_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("click_after",
        when(col("event_type") === "click" && col("saw_signup").isNotNull, col("ts")))
      .withColumn("first_click_after", min(col("click_after")).over(w))
      .withColumn("purchase_after",
        when(col("event_type") === "purchase" && col("first_click_after").isNotNull,
          col("ts")))
    val perUser = staged.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
      min(col("click_after")).as("t_click"),
      min(col("purchase_after")).as("t_purchase"))
    perUser.agg(
      count(when(col("t_signup").isNotNull, 1)).as("n_signup"),
      count(when(col("t_click").isNotNull, 1)).as("n_signup_click"),
      count(when(col("t_purchase").isNotNull, 1)).as("n_signup_click_purchase"))
  }

  /** Cohort retention matrix: users grouped by first-seen date, activity
    * counted per (cohort, day-offset) cell — the warehouse query behind
    * every retention curve. Three shuffles, all on data-growing or
    * bounded keys: the first-seen aggregate and the cohort join shuffle
    * on user_id, the final cell aggregate on (cohort_date, offset) whose
    * cardinality is days² — tiny at any corpus size. */
  def retentionCohorts(fact: DataFrame): DataFrame = {
    val first = fact
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(min(col("event_date")).as("cohort_date"))
    fact
      .filter(col("user_id").isNotNull)
      .join(first, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("event_date"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Event-type counts pivoted to one column per type, per zone. The pivot
    * values are EXPLICIT — an open-ended `.pivot(col)` first runs a
    * distinct-values job over the whole fact to discover the columns;
    * pinning them keeps this a single groupBy pass with a fixed schema. */
  def eventTypePivot(fact: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame =
    fact
      .filter(col("zone_id").isNotNull)
      .groupBy(col("zone_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)

  /** Per-zone exact value percentiles (p25/p50/p75/p95) on monetary
    * events. Spark's `percentile` is a partial-aggregable exact sketch per
    * group — group state is the zone's value set, bounded by the natural
    * (zone) key; at 100 TB switch callers to `approx_percentile`
    * ([[graft.quality.DataQuality.corpusProfile]] shows the sketch path). */
  def valuePercentilesByZone(fact: DataFrame): DataFrame = {
    def pct(q: Double, name: String) =
      round(expr(s"percentile(value, $q)"), 6).as(name)
    fact
      .filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
      .groupBy(col("zone_id"))
      .agg(
        count(lit(1)).as("n"),
        pct(0.25, "p25"), pct(0.5, "p50"), pct(0.75, "p75"), pct(0.95, "p95"))
  }

  /** Trailing-7-day revenue per zone as a RANGE-frame window: the frame is
    * bounded by the ORDER-BY VALUE (day distance), not a row count — so a
    * zone with gap days still sums exactly the last 7 calendar days, where
    * a `rowsBetween(-6, 0)` frame would silently reach back further. The
    * window partitions by zone (data-growing key, bounded state); input is
    * the already-aggregated daily grain, so the range pass touches
    * |zones|×|days| rows, never raw events. Rounding at the daily grain
    * edge keeps the trailing sums bit-stable across engines. */
  def revenueTrailing7dByZone(fact: DataFrame): DataFrame = {
    val daily = fact
      .filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
      .groupBy(col("zone_id"), col("event_date").as("date"))
      .agg(round(sum(col("value")), 4).as("rev"))
      .withColumn("day", datediff(col("date"), lit("1970-01-01")))
    val w = Window.partitionBy("zone_id").orderBy("day").rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d", round(sum(col("rev")).over(w), 4))
      .withColumn("days_active_7d", count(lit(1)).over(w))
      .select("zone_id", "date", "rev", "rev_7d", "days_active_7d")
  }

  /** Per-zone second-moment statistics: Pearson correlation and sample
    * covariance between purchase value and hour-of-day, plus the sample
    * stddev of value — the "is price time-of-day dependent" profile. One
    * hash aggregate (all three are single-pass moment aggregates with
    * map-side partials); ANSI sample semantics on both engines. */
  def valueHourStatsByZone(fact: DataFrame): DataFrame =
    fact
      .filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
      .groupBy(col("zone_id"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("value"), hour(col("ts")).cast("double")), 6).as("corr_value_hour"),
        round(covar_samp(col("value"), hour(col("ts")).cast("double")), 6).as("covar_value_hour"),
        round(stddev_samp(col("value")), 6).as("stddev_value"))

  /** MERGEABLE partial-aggregate state for the zone×hour revenue view:
    * count, exact-cents sum (integer-valued doubles — order-independent,
    * the repo float policy), min, max. These are the partials a standing
    * 100 TB materialized view STORES: the nightly job aggregates only the
    * new batch and [[mergeRevenueState]]s it into the table, so history
    * is never rescanned — maintenance cost is ∝ |batch| + |state keys|,
    * not ∝ |history|. Derived columns (total, average) come from
    * [[revenueViewFromState]] at read time; storing them instead of the
    * partials is the classic mistake that makes a view non-mergeable. */
  def revenueStateByZoneHour(fact: DataFrame): DataFrame =
    fact
      // null zones excluded: the view key must equi-join across merges,
      // and SQL null keys never match themselves
      .filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
      .groupBy(col("zone_id"), hour(col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("event_count"),
        sum(round(col("value") * 100)).as("value_cents"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Merge two partial states: full-outer join on the view key +
    * elementwise combine (count/sum add with sum's null algebra — null
    * only when BOTH sides are null; min/max via least/greatest, which
    * skip nulls). Associativity of every partial makes the fold
    * order-free: state ⊕ day1 ⊕ day2 ≡ recompute over the union,
    * bit-exactly (spec-asserted), which is what licenses running it
    * incrementally forever. One shuffle on the view key; at scale the
    * state table is bucketed on the key so only the batch side moves. */
  def mergeRevenueState(state: DataFrame, delta: DataFrame): DataFrame = {
    val keys = Seq("zone_id", "hour")
    val d = delta.columns.filterNot(keys.contains)
      .foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"${c}_d"))
    def addNullAsZero(a: String, b: String) =
      when(col(a).isNull && col(b).isNull, lit(null))
        .otherwise(coalesce(col(a), lit(0)) + coalesce(col(b), lit(0)))
    state.join(d, keys, "full_outer")
      .select(
        keys.map(col) ++ Seq(
          addNullAsZero("event_count", "event_count_d").cast("long").as("event_count"),
          addNullAsZero("value_cents", "value_cents_d").cast("double").as("value_cents"),
          least(col("min_value"), col("min_value_d")).as("min_value"),
          greatest(col("max_value"), col("max_value_d")).as("max_value")): _*)
  }

  /** One maintenance step against a BUCKETED state table — the face that
    * makes the scale claim on [[mergeRevenueState]] true in code rather
    * than prose: the state lives as a parquet table bucketed + sorted on
    * the view key ([[graft.sources.Sinks.writeBucketed]] with
    * (zone_id, hour)), so the merge's full-outer join plans with NO
    * Exchange on the state side — only the (day-sized) batch delta
    * shuffles, into the state's bucket layout — and the result is
    * written back under the SAME bucketing, ready to be next step's
    * state. Spec-asserted on the physical plan. Maintenance cost is
    * ∝ shuffle(|batch|) + streamed-read(|state|); history is never
    * rescanned and the corpus-sized side never moves.
    *
    * `outTable` must differ from `stateTable` (A/B flip): a
    * plain-parquet table cannot be overwritten while it is being read —
    * the transactional alternative is the versioned-table state of
    * [[graft.streaming.Streams.maintainView]]. */
  def mergeRevenueStateBucketedStep(spark: org.apache.spark.sql.SparkSession,
      stateTable: String, batch: DataFrame,
      outTable: String, outPath: String, nBuckets: Int = 32): Unit = {
    require(outTable != stateTable, "A/B flip required: outTable must differ")
    val merged = mergeRevenueState(spark.table(stateTable), revenueStateByZoneHour(batch))
    graft.sources.Sinks.writeBucketed(merged, outTable, outPath,
      Seq("zone_id", "hour"), nBuckets)
  }

  /** Fold one change-data-feed batch ([[graft.sources.VersionedTable.changes]]
    * shape: the fact columns + `_change_type`) into the revenue state —
    * the Delta `readChangeFeed` → MERGE maintenance step, structured so
    * EVERY partial stays exact without signed min/max arithmetic:
    *
    *  - ADDITIVE FAST PATH: `insert` / `update_postimage` rows aggregate
    *    to a delta and [[mergeRevenueState]] in. For append-only feeds
    *    (the overwhelmingly common fact-stream case) this is the whole
    *    fold — the snapshot is NEVER read.
    *  - DELETE SIDE: min/max are not subtractable, so view keys touched
    *    by `delete` / `update_preimage` rows are recomputed WHOLESALE
    *    from `snapshot` (the table as of this batch's version) restricted
    *    to those keys — the textbook incremental-view-maintenance
    *    treatment. Cost ∝ affected keys' snapshot slice (broadcast
    *    semi-join; a zone-partitioned layout file-prunes it), paid only
    *    on batches that actually delete.
    *
    * A key whose rows all vanish drops out of the state (the recompute
    * finds no rows); update rows that move across view keys recompute
    * the pre-key and additively land on the post-key. Result is
    * bit-exact vs a from-scratch recompute (spec-asserted) — the `iv_ag`
    * standard, now reachable from a stream. */
  def applyRevenueChanges(state: DataFrame, cdf: DataFrame,
      snapshot: DataFrame): DataFrame = {
    val keys = Seq("zone_id", "hour")
    val rel = cdf.filter(col("event_type") === "purchase" && col("zone_id").isNotNull)
    val adds = rel.filter(col("_change_type").isin("insert", "update_postimage"))
    val affected = rel.filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col("zone_id"), hour(col("ts")).as("hour")).distinct().persist()
    val out =
      if (affected.isEmpty) mergeRevenueState(state, revenueStateByZoneHour(adds))
      else {
        val keep = state.join(broadcast(affected), keys, "left_anti")
        val addDelta = revenueStateByZoneHour(adds)
          .join(broadcast(affected), keys, "left_anti")
        val recomputed = revenueStateByZoneHour(
          snapshot.withColumn("hour", hour(col("ts")))
            .join(broadcast(affected), keys, "left_semi").drop("hour"))
        mergeRevenueState(keep, addDelta).unionByName(recomputed)
      }
    // pin the fold before unpersisting the affected-key set it references
    val pinned = out.localCheckpoint(true)
    affected.unpersist()
    pinned
  }

  /** Read-time face of the revenue state: exact-cents total (2-dp) and
    * the unrounded exact quotient average, the [[revenueDailyByZone]]
    * float policy. */
  def revenueViewFromState(state: DataFrame): DataFrame =
    state.select(
      col("zone_id"), col("hour"), col("event_count"),
      round(col("value_cents") / 100, 2).as("total_revenue"),
      (col("value_cents") / 100 / col("event_count")).as("avg_value"),
      col("min_value"), col("max_value"))
}
