package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline

class PipelineRunnerSpec extends SparkSpec {

  test("runAll composes every stage over one shared silver lineage") {
    val out = Pipeline.runAll(spark, sfDir)
    val expected = Set(
      "bronze", "silver", "dim_time", "dim_users", "dim_zones",
      "fact_events", "fact_payments", "agg_demand_hourly",
      "agg_revenue_daily", "agg_user_daily",
      "feat_demand", "feat_surge", "feat_churn",
      "score_demand", "score_surge", "score_metrics",
      "dq_summary", "monitor_psi", "monitor_missing", "monitor_volume")
    assert(out.keySet === expected)
    // stages are lazy: building the full DAG runs no jobs; materializing
    // a leaf pulls exactly its lineage
    assert(out("fact_events").count() === out("silver").count())
    assert(out("monitor_volume").count() === 1)
  }

  test("cross-stage optimization: fact build reuses the silver lineage plan") {
    val out = Pipeline.runMedallion(spark, sfDir)
    // the fact's analyzed plan embeds the silver dedup window — one
    // lineage end-to-end, no opaque stage boundary
    val plan = out("fact_events").queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number") || plan.contains("Window"), plan)
    assert(out("agg_revenue_daily").filter(col("total_revenue") < 0).count() === 0)
  }
}
