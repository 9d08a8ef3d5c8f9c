package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.features.FeatureEngineering
import graft.monitoring.Monitoring
import graft.quality.DataQuality
import graft.scoring.Scoring

/** Composable pipeline runners — the re-expression of the reference's
  * Airflow DAGs (reference airflow/dags: bronze → silver → gold → ML)
  * as plain functions over DataFrames.
  *
  * Orchestration-tool independence is the point: each stage takes and
  * returns DataFrames, so the same composition runs under any scheduler —
  * or none. Laziness does the dependency ordering: nothing executes until
  * a sink materializes a frame, and Catalyst sees the WHOLE lineage (a
  * DAG of Spark plans, not of opaque tasks), so cross-stage optimization
  * — pushdown through the silver projection into the bronze scan, reuse
  * of the silver exchange across gold builds — happens for free, which
  * per-task orchestration can never do. */
object Pipeline {

  /** bronze → silver → star schema + aggregates, keyed like the
    * reference's gold tables. */
  def runMedallion(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val bronze = Bronze.ingestEvents(Tables.events(spark, dir))
    val silver = Silver.cleanEvents(bronze)
    val users = Gold.dimUsers(silver)
    val zones = Gold.dimZones(silver)
    Map(
      "bronze" -> bronze,
      "silver" -> silver,
      "dim_time" -> Gold.dimTime(silver),
      "dim_users" -> users,
      "dim_zones" -> zones,
      "fact_events" -> Gold.factEvents(silver, users, zones),
      "fact_payments" -> Gold.factPayments(silver, users),
      "agg_demand_hourly" -> Aggregates.demandHourlyByZone(silver),
      "agg_revenue_daily" -> Aggregates.revenueDailyByZone(silver),
      "agg_user_daily" -> Aggregates.userDailySummary(silver))
  }

  /** Feature + scoring stage over a silver frame (reference ml_dag). */
  def runScoring(silver: DataFrame): Map[String, DataFrame] = {
    val demandFeat = FeatureEngineering.demandFeatures(silver)
    val surgeFeat = FeatureEngineering.surgeFeatures(silver)
    val scoredDemand = Scoring.scoreDemand(demandFeat)
    Map(
      "feat_demand" -> demandFeat,
      "feat_surge" -> surgeFeat,
      "feat_churn" -> FeatureEngineering.churnFeatures(silver),
      "score_demand" -> scoredDemand,
      "score_surge" -> Scoring.scoreSurge(surgeFeat),
      "score_metrics" -> Scoring.scoringMetrics(scoredDemand, "event_count", "predicted_demand"))
  }

  /** Quality + monitoring stage (reference monitoring dag). */
  def runMonitoring(silver: DataFrame, splitDate: String): Map[String, DataFrame] = Map(
    "dq_summary" -> DataQuality.summary(
      silver, Seq("event_id", "user_id", "ts", "event_type", "value", "zone_id")),
    "monitor_psi" -> Monitoring.psi(silver, Seq("value", "zone_id"), splitDate),
    "monitor_missing" -> Monitoring.missingRates(silver, Seq("value", "zone_id", "user_id"), splitDate),
    "monitor_volume" -> Monitoring.volume(silver, splitDate))

  /** Full run: every stage, one shared silver lineage. */
  def runAll(spark: SparkSession, dir: String, splitDate: String = "2024-01-15"): Map[String, DataFrame] = {
    val medallion = runMedallion(spark, dir)
    val silver = medallion("silver")
    medallion ++ runScoring(silver) ++ runMonitoring(silver, splitDate)
  }
}
