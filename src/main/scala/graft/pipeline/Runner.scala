package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Config-driven pipeline execution — the ops entry point a user of the
  * reference's `python -m src...` module mains lands on (reference: every
  * module's `if __name__ == "__main__"` block reads config.yaml and runs
  * one stage; graft runs the requested stages off ONE shared silver
  * lineage instead of one JVM/session per stage).
  *
  * Stage outputs land under `outputDir/<stage>/<table>` as parquet —
  * frames carrying `event_date` are written date-partitioned (the
  * reference's layout, bronze_loader.py:33-37), everything else plain.
  * The monitoring stage CLASSIFIES from the configured thresholds: PSI
  * severity (ok/warn/critical at psi_warn/psi_crit), missing-rate shift
  * alert, volume-drop alert at 1 − volume_drop_ratio — the reference's
  * monitoring: block (config.yaml:27-31) driving real columns.
  *
  * Scale: one session, one silver plan shared by every stage (Catalyst
  * reuses the exchange); each write is a single pass over its frame. At
  * 100 TB the only knob that matters here is `spark.shuffle_partitions`,
  * which the config owns — everything else is per-operator design
  * (see the operator scaladocs). */
object Runner {

  /** Run the configured stages; returns (qualified table name → rows
    * written), in write order. Row counts come free from the write via
    * each frame's post-write metric read-back being unnecessary — we
    * count on the written files to keep the write itself the only job. */
  def run(spark: SparkSession, cfg: GraftConfig): Seq[(String, Long)] = {
    val frames: Seq[(String, DataFrame)] = stageFrames(spark, cfg)
    frames.map { case (name, df) =>
      val path = s"${cfg.outputDir}/$name"
      if (df.columns.contains("event_date"))
        Sinks.writePartitioned(df, path, Seq("event_date"))
      else
        df.write.mode("overwrite").parquet(path)
      name -> spark.read.parquet(path).count()
    }
  }

  /** The lazy frame DAG for the configured stages (no writes) — what
    * `run` materializes, exposed for tests and notebook use. */
  def stageFrames(spark: SparkSession, cfg: GraftConfig): Seq[(String, DataFrame)] = {
    // one silver lineage shared across stages, like Pipeline.runAll
    lazy val medallion = Pipeline.runMedallion(spark, cfg.inputDir)
    lazy val silver = medallion("silver")
    cfg.stages.flatMap {
      case "medallion" =>
        medallion.toSeq.sortBy(_._1).map { case (n, df) => s"medallion/$n" -> df }
      case "scoring" =>
        Pipeline.runScoring(silver).toSeq.sortBy(_._1)
          .map { case (n, df) => s"scoring/$n" -> df }
      case "mobility" =>
        Pipeline.runMobility(silver).toSeq.sortBy(_._1)
          .map { case (n, df) => s"mobility/$n" -> df }
      case "monitoring" =>
        val mon = Pipeline.runMonitoring(silver, cfg.splitDate)
        val classified = mon.map {
          case ("monitor_psi", df) =>
            "monitor_psi" -> df.withColumn("severity",
              when(col("psi") >= cfg.psiCrit, lit("critical"))
                .when(col("psi") >= cfg.psiWarn, lit("warn"))
                .otherwise(lit("ok")))
          case ("monitor_missing", df) =>
            "monitor_missing" -> df.withColumn("shift_alert",
              (col("shift") > cfg.missingShiftWarn).cast("int"))
          case ("monitor_volume", _) =>
            // rebuild with the configured alert threshold
            "monitor_volume" -> graft.monitoring.Monitoring.volume(
              silver, cfg.splitDate, alertBelow = 1.0 - cfg.volumeDropRatio)
          case other => other
        }
        classified.toSeq.sortBy(_._1).map { case (n, df) => s"monitoring/$n" -> df }
      case other =>
        // unreachable: GraftConfig validates stage names at load
        throw new IllegalArgumentException(s"unknown stage: $other")
    }
  }
}
