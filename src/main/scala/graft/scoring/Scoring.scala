package graft.scoring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heuristic batch scorers + scoring metrics.
  *
  * Re-expresses the reference's batch scoring (reference
  * src/ml/batch_scoring.py:65-147 scorers, :188-225 metrics) as pure
  * `Column` expressions — no UDF boundary, whole-stage codegen end to end.
  * The reference wrapped the same arithmetic in pandas_udfs; at 100 TB the
  * codegen'd column form scores at scan speed with zero serialization.
  *
  * Determinism: predictions are emitted at full double precision. Rounding
  * a computed double (reference rounds to 2-3 dp) hits shortest-repr
  * `.xx5` ties where engines disagree; the unrounded IEEE expression tree
  * evaluates bit-identically everywhere.
  */
object Scoring {

  /** Demand scorer over [[graft.features.FeatureEngineering.demandFeatures]]
    * output: rolling-mean base demand scaled by peak-hour, weekend and
    * value-surge factors (reference batch_scoring.py:71-81). */
  def scoreDemand(feat: DataFrame): DataFrame = {
    val peakFactor = when(col("hour").isin(7, 8, 9, 16, 17, 18), lit(1.25)).otherwise(lit(1.0))
    val weekend = when(dayofweek(col("trip_date")).isin(1, 7), 1).otherwise(0)
    val weekendFactor = when(col("is_weekend") === 1, lit(0.85)).otherwise(lit(1.0))
    // value plays the surge-multiplier role; 100 is its reference level
    val valueFactor = lit(1.0) + greatest(col("avg_value") / 100.0 - 1.0, lit(0.0)) * 0.15
    feat
      .withColumn("is_weekend", weekend)
      .withColumn("predicted_demand",
        col("demand_avg_7d") * peakFactor * weekendFactor * valueFactor)
      .select(
        "trip_date", "hour", "zone_id", "event_count", "demand_avg_7d",
        "avg_value", "is_peak_hour", "is_weekend", "predicted_demand")
  }

  /** Surge scorer over [[graft.features.FeatureEngineering.surgeFeatures]]
    * output: demand / supply / rain factors, clamped to [1, 3] via
    * least/greatest (reference batch_scoring.py:107-125). Rain intensity
    * has no analog in the synthetic data and enters as 0 (factor 1), kept
    * in the expression so the operator shape matches the reference. */
  def scoreSurge(feat: DataFrame): DataFrame = {
    val supplyIndex = least(col("user_count").cast("double") / 20.0, lit(1.0))
    val demandFactor = least(greatest(col("count_avg_7d") / 6.0, lit(0.5)), lit(2.0))
    val supplyFactor = lit(1.0) + greatest(lit(1.0) - col("supply_index"), lit(0.0)) * 0.8
    val rainFactor = lit(1.0) + least(greatest(lit(0.0), lit(0.0)), lit(1.0)) * 0.25
    feat
      .withColumn("supply_index", supplyIndex)
      .withColumn("predicted_surge",
        least(greatest(demandFactor * supplyFactor * rainFactor, lit(1.0)), lit(3.0)))
      .select(
        "trip_date", "hour", "zone_id", "event_count", "user_count",
        "count_avg_7d", "supply_index", "predicted_surge")
  }

  /** Stamp scoring-run metadata (reference batch_scoring.py:147-151 uses
    * wall-clock utcnow; graft takes both values as parameters so reruns
    * are reproducible). */
  def addRunMetadata(df: DataFrame, runId: String, scoredAt: String): DataFrame =
    df.withColumn("scoring_run_id", lit(runId))
      .withColumn("scored_at", lit(scoredAt).cast("timestamp"))

  /** Idempotent prediction upsert — the reference's Delta MERGE
    * (batch_scoring.py:161-186) re-expressed storage-agnostically as
    * union + latest-wins key window: re-scoring the same keys replaces
    * rows, replaying the same run is a no-op, unseen keys insert.
    * One shuffle on the (high-cardinality) key set; at 100 TB this is the
    * same exchange a MERGE's join phase would pay, without requiring a
    * transactional table format. */
  def upsertPredictions(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("scored_at").desc, col("scoring_run_id").desc)
    existing.unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** One-pass MAE / RMSE / MAPE between a label and a prediction column
    * (reference batch_scoring.py:190-210 runs one collect per metric pair;
    * here all metrics come out of a single aggregate over a single scan).
    *
    * Determinism: each per-row error term is libm-free arithmetic of
    * bit-identical inputs (the scorer is pure multiplication), but a raw
    * `avg` of arbitrary doubles is accumulation-order-sensitive — the
    * round-8 exact gate caught a last-ulp drift here. Each term is
    * therefore summed as its ×10⁶ rounded integer image (order-
    * independent; `round(t*1e6)` of the same double is identical on any
    * engine) and divided once — metrics are exact means of
    * 1e-6-quantized errors. The square uses explicit multiplication, not
    * `pow` (cross-libm pow is not bit-stable). Scale bound: |err|·1e6·n
    * must stay under 2⁵³ — squared demand errors at any tested SF are
    * orders of magnitude inside it. */
  def scoringMetrics(scored: DataFrame, label: String, pred: String): DataFrame = {
    val y = col(label).cast("double")
    val yhat = col(pred)
    val ape = when(y =!= 0, abs((y - yhat) / y))
    scored.agg(
      count(lit(1)).as("n"),
      (sum(round(abs(y - yhat) * 1e6)) / 1e6 / count(lit(1))).as("mae"),
      sqrt(sum(round((y - yhat) * (y - yhat) * 1e6)) / 1e6 / count(lit(1))).as("rmse"),
      (sum(round(ape * 1e6)) / 1e6 / count(ape)).as("mape"))
  }

  /** Heuristic churn probability over
    * [[graft.features.FeatureEngineering.churnFeatures]] output — the
    * logistic form of the declining-activity rules (the reference's
    * churn-risk scorer family, batch_scoring.py:127-147): fixed documented
    * weights on the two declining flags minus an activity-volume term,
    * squashed to (0, 1). Weights are POLICY constants, not fitted — the
    * fitted counterpart is `ml_qual`'s LogisticRegression; this scorer is
    * the deterministic face the calibration audit can oracle-check.
    * Rounded at 6 dp (exp is the one libm call; both engines then bin and
    * average the same rounded value). */
  def scoreChurn(feat: DataFrame): DataFrame = {
    val z = lit(-1.2) + col("events_declining") * 1.1 +
      col("value_declining") * 0.9 - col("daily_events") * 0.08
    feat.withColumn("churn_p", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
  }

  /** Probability-calibration audit (reliability diagram data): bin a
    * [0, 1] score into `bins` equal-width bins and compare each bin's mean
    * predicted probability against its observed positive rate — the table
    * behind every calibration plot, and the monitoring artifact that
    * catches a scorer whose discrimination survived drift but whose
    * probabilities no longer mean what they say.
    *
    * One map-side-combinable aggregate over a bounded bin key; output is
    * `bins` rows at any data scale. The bin edge uses the ROUNDED score
    * (both engines floor the same 6-dp value); `pos_rate` is an exact
    * integer ratio; `gap` subtracts two already-rounded terms. */
  def calibrationBins(scored: DataFrame, labelCol: String,
      scoreCol: String, bins: Int = 10): DataFrame =
    scored
      .withColumn("bin",
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(scoreCol)), 6).as("mean_p"),
        round(sum(col(labelCol)).cast("double") / count(lit(1)), 6)
          .as("pos_rate"))
      .withColumn("gap", round(col("pos_rate") - col("mean_p"), 6))

  /** Kaplan–Meier retention curve (Kaplan & Meier 1958) over user
    * lifetimes: duration = days between a user's first and last activity;
    * a user whose last activity is > `churnGapDays` before the corpus'
    * observation end has churned (event), anyone active near the end is
    * right-CENSORED — the distinction a naive "average lifetime" gets
    * wrong and the whole reason KM exists. Output is one row per distinct
    * duration with the at-risk count, events, censored count and the
    * product-limit survival estimate.
    *
    * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i), computed as exp(Σ ln f_i) — a
    * cumulative-product-free form both engines evaluate identically; a
    * zero factor (everyone at risk dies at t_i) forces S = 0 from there
    * on via an explicit flag rather than ln(0). Math is exact integer
    * ratios until the final ln/exp, rounded at 6 dp.
    *
    * Scale: the corpus collapses to the user dim in one aggregate, then
    * to |distinct durations| rows in a second; the KM windows run over
    * that duration-indexed table (calendar-bounded, never data-sized). */
  def kaplanMeier(silver: DataFrame, churnGapDays: Int = 7): DataFrame = {
    val perUser = silver
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_d"), max(col("event_date")).as("last_d"))
    val obsEnd = perUser.agg(max(col("last_d")).as("obs_end"))
    val durations = perUser
      .crossJoin(broadcast(obsEnd))
      .select(
        datediff(col("last_d"), col("first_d")).as("t"),
        when(datediff(col("obs_end"), col("last_d")) > churnGapDays, 1L)
          .otherwise(0L).as("event"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at_t"), sum(col("event")).as("d"),
        (count(lit(1)) - sum(col("event"))).as("censored"))
    val byT = Window.orderBy(col("t").asc)
    val fromT = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    durations
      // at risk at t = everyone whose duration is ≥ t
      .withColumn("n_risk", sum(col("n_at_t")).over(fromT))
      .withColumn("f",
        (col("n_risk") - col("d")).cast("double") / col("n_risk"))
      .withColumn("dead", max((col("f") === 0.0).cast("int")).over(byT))
      .withColumn("survival",
        when(col("dead") === 1, lit(0.0))
          .otherwise(round(exp(sum(log(col("f"))).over(byT)), 6)))
      .select("t", "n_risk", "d", "censored", "survival")
  }

  /** Per-zone A/B experiment readout: users are deterministically split
    * into control/treatment by the md5 hash family
    * ([[graft.sampling.Sampling.hashFraction]] — the same engine-portable
    * assignment the samplers use, so an experiment's arms are
    * reproducible from the user id alone, no assignment table to join),
    * the per-(zone, user) outcome is "converted" (any purchase in that
    * zone), and each zone reports arm sizes, conversion rates, uplift
    * and the two-proportion z statistic (pooled variance). Zones where
    * the pooled variance degenerates (either arm empty, or conversion
    * universal/absent) report a NULL z rather than ±∞.
    *
    * Scale: one (zone, user) aggregate over the event stream — the key
    * grows with data, no hotspots — then a zone-keyed roll-up;
    * audit-table-sized output. Counts are exact integers; the two float
    * steps (rates, z) are integer ratios rounded at 6 dp. */
  def abTest(silver: DataFrame, salt: String = "ab"): DataFrame = {
    val perUser = silver
      .filter(col("zone_id").isNotNull)
      .groupBy(col("zone_id"), col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .withColumn("arm",
        when(graft.sampling.Sampling.hashFraction(col("user_id"), salt) < 0.5,
          lit("control")).otherwise(lit("treatment")))
    val wide = perUser
      .groupBy(col("zone_id"))
      .agg(
        sum(when(col("arm") === "control", 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === "control", col("conv").cast("long"))
          .otherwise(0L)).as("x_c"),
        sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === "treatment", col("conv").cast("long"))
          .otherwise(0L)).as("x_t"))
    val pC = col("x_c").cast("double") / col("n_c")
    val pT = col("x_t").cast("double") / col("n_t")
    val pPool = (col("x_c") + col("x_t")).cast("double") / (col("n_c") + col("n_t"))
    val se = sqrt(pPool * (lit(1.0) - pPool)
      * (lit(1.0) / col("n_c") + lit(1.0) / col("n_t")))
    wide
      .withColumn("p_c", when(col("n_c") > 0, round(pC, 6)))
      .withColumn("p_t", when(col("n_t") > 0, round(pT, 6)))
      .withColumn("uplift",
        when(col("n_c") > 0 && col("n_t") > 0, round(pT - pC, 6)))
      .withColumn("z",
        when(col("n_c") > 0 && col("n_t") > 0
          && (col("x_c") + col("x_t")) > 0
          && (col("x_c") + col("x_t")) < (col("n_c") + col("n_t")),
          round((pT - pC) / se, 6)))
  }

  /** Classical forecast BASELINES for the per-zone daily demand series —
    * the yardsticks any learned forecaster (ml_rf/ml_gbt) must beat
    * before it ships:
    *   - naive: yesterday's observed count (lag 1);
    *   - seasonal naive: same weekday last week (lag 7);
    *   - EWMA(α=½) over the trailing 7 observations, renormalized over
    *     however many of the 7 lags exist at the head of a series.
    * Each forecast comes with its absolute error against the realized
    * count, so one aggregate downstream yields per-method MAE.
    *
    * α = ½ ON PURPOSE: the weights 2⁻¹…2⁻⁷ are exact dyadic doubles and
    * the counts are integers, so every product and the weighted sum are
    * EXACT (no rounding anywhere until the final division of two exact
    * doubles) — bit-identical on any engine, same trick as the
    * exact-cents monetary sums. Lags are fixed-offset `lag()` columns,
    * not a pow() window: a weighted window sum can't reference the
    * current row's index, and seven explicit lags stay codegen'd.
    *
    * Scale: one hash-aggregate collapses the corpus to (zone, day) rows;
    * the lag windows partition by zone — key cardinality grows with the
    * data, state per partition is the zone's |days| series. Lags skip
    * over ABSENT days (a zone with no rows yesterday lags to its
    * previous active day) — document-level imputation is a policy choice
    * left upstream, and both faces of the oracle agree on the
    * present-rows-only semantics. */
  def forecastBaselines(silver: DataFrame): DataFrame = {
    val byZone = Window.partitionBy("zone_id").orderBy("event_date")
    val daily = silver.filter(col("zone_id").isNotNull)
      .groupBy("zone_id", "event_date")
      .agg(count(lit(1)).as("demand"))
    val lags = (1 to 7).foldLeft(daily) { (df, j) =>
      df.withColumn(s"l$j", lag(col("demand"), j).over(byZone))
    }
    // exact dyadic weights: wsum = Σ 2^-j·x_j, wnorm = Σ 2^-j over present lags
    val wsum = (1 to 7).map(j => when(col(s"l$j").isNotNull,
      col(s"l$j").cast("double") * math.pow(0.5, j)).otherwise(lit(0.0)))
      .reduce(_ + _)
    val wnorm = (1 to 7).map(j => when(col(s"l$j").isNotNull,
      lit(math.pow(0.5, j))).otherwise(lit(0.0)))
      .reduce(_ + _)
    lags
      .withColumn("fc_naive", col("l1").cast("double"))
      .withColumn("fc_seasonal", col("l7").cast("double"))
      .withColumn("fc_ewma", when(wnorm > 0, wsum / wnorm))
      .select(col("zone_id"), col("event_date"), col("demand"),
        col("fc_naive"), col("fc_seasonal"), col("fc_ewma"),
        abs(col("demand") - col("fc_naive")).as("ae_naive"),
        abs(col("demand") - col("fc_seasonal")).as("ae_seasonal"),
        abs(col("demand") - col("fc_ewma")).as("ae_ewma"))
  }
}
