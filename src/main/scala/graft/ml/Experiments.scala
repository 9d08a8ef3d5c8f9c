package graft.ml

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment tracking — the Spark-native re-expression of the
  * reference's MLflow usage (reference src/ml/demand_forecasting.py:6-33
  * logs params and metrics per training run to a tracking server;
  * config.yaml:24-26 configures its URI). Without the external service:
  * an append-only parquet `runs` table. Run metadata IS data — putting it
  * where the data lives means every engine that can read the lake can
  * query training history, join it against monitoring output, and audit
  * which model version produced which scores; no tracking server to
  * stand up, scale, or lose.
  *
  * Schema: `runs(run_id string, model string, params map<string,string>,
  * metrics map<string,double>, trained_at timestamp)`.
  *
  * Scale: a run row is KB of driver-side metadata — the append is a
  * one-row, one-file parquet write, and a decade of hourly retrains is
  * still a dimension-sized table. Readers push filters into the scan as
  * with any parquet dim. Concurrent writers: appends from SEPARATE Spark
  * jobs share the `_temporary` staging directory under
  * FileOutputCommitter, so simultaneous appends to one path can clobber
  * each other's staged files — treat the table as single-writer-at-a-time
  * (a scheduler serializes retrains anyway), or give each writer its own
  * partition subdirectory; within one application, appends are sequential
  * driver calls and safe.
  */
object Experiments {

  /** Append one training run to the `runs` table at `path`; returns the
    * run_id. The id is a content hash of (model, params, trained_at) —
    * deterministic for a pinned `trainedAt` (specs replay it), unique in
    * practice because real retrains carry distinct timestamps. */
  def logRun(spark: SparkSession, path: String, model: String,
      params: Map[String, String], metrics: Map[String, Double],
      trainedAt: Timestamp): String = {
    import spark.implicits._
    val runId = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$model|${params.toSeq.sorted.mkString(",")}|$trainedAt"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Seq((runId, model, params, metrics, trainedAt))
      .toDF("run_id", "model", "params", "metrics", "trained_at")
      .coalesce(1)
      .write.mode("append").parquet(path)
    runId
  }

  /** The `runs` table reader. */
  def runsTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Metrics history for one model, newest first — the "did the retrain
    * regress" lookup a scheduler gates promotion on. */
  def history(spark: SparkSession, path: String, model: String): DataFrame =
    runsTable(spark, path)
      .filter(col("model") === model)
      .orderBy(col("trained_at").desc, col("run_id"))

  /** Best run per model by a metric (lower is better, e.g. rmse):
    * the model-registry "champion" view, derived instead of stored.
    * Runs whose metrics map lacks `metric` (e.g. a classifier run when
    * asking for rmse) sort LAST — Spark's default ascending order puts
    * NULLs first, which would crown the metric-less run champion. */
  def bestByMetric(spark: SparkSession, path: String, metric: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("model")
      .orderBy(element_at(col("metrics"), metric).asc_nulls_last, col("run_id"))
    runsTable(spark, path)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Gate-facing scalar projection of a runs frame: the library schema
    * keeps `params`/`metrics` as maps, but a map column is unhashable in
    * pandas, so the driver's correctness dump (which sorts every column)
    * crashes on it. This view serializes each map to a DETERMINISTIC
    * key-sorted JSON array string (`map_entries` → `array_sort` — struct
    * order is field order, key first — → `to_json`), leaving every column
    * scalar-typed. Used only by the query-inventory registration; library
    * callers read the map-typed table. */
  def runsScalarView(runs: DataFrame): DataFrame =
    runs.select(
      col("run_id"), col("model"),
      to_json(array_sort(map_entries(col("params")))).as("params_json"),
      to_json(array_sort(map_entries(col("metrics")))).as("metrics_json"),
      col("trained_at"))

  /** Fit-and-track for the demand models: trains the shared-cache RF and
    * the linear baseline on the standard date split, evaluates each on
    * the held-out window, logs one run per fit, and returns the runs
    * table. GBT is deliberately not in this tracked set — it is the most
    * expensive fit and `ml_g` already exercises it; a production caller
    * passes its own fits through [[logRun]].
    *
    * `freshStart` wipes the table first (the query-inventory entry uses
    * it so replays stay bounded); production appends. */
  def trackedDemandRuns(feat: DataFrame, path: String,
      trainedAt: Timestamp = Timestamp.valueOf("2024-01-31 00:00:00"),
      freshStart: Boolean = true): DataFrame = {
    val spark = feat.sparkSession
    if (freshStart) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    val fits = Seq(
      ("random_forest", Map("numTrees" -> "20", "maxDepth" -> "8", "seed" -> "42"),
        () => Models.demandRandomForest(feat)),
      ("linear", Map("regParam" -> "0.1", "elasticNetParam" -> "0.0"),
        () => Models.demandLinear(feat)))
    // the two fits are independent; Spark overlaps jobs submitted from
    // different threads (optimization guide §2.6), so wall-clock is the
    // slower fit, not the sum. The table APPENDS stay sequential in the
    // declared order — concurrent appends to one path share the
    // FileOutputCommitter staging dir (see the object scaladoc) — and
    // each run row is computed before any write, so the table content is
    // byte-identical to the sequential form.
    import scala.concurrent.{Await, Future}
    implicit val ec: scala.concurrent.ExecutionContext = fitPool
    val measured = Await.result(
      Future.sequence(fits.map { case (model, params, fit) =>
        Future {
          val cached = fit().persist()
          try (model, params, Models.regressionMetrics(cached))
          finally { cached.unpersist(); () }
        }
      }),
      scala.concurrent.duration.Duration.Inf)
    measured.foreach { case (model, params, metrics) =>
      logRun(spark, path, model, params, metrics, trainedAt)
    }
    runsTable(spark, path)
  }

  /** Bounded daemon pool for overlapping independent tracked fits. */
  private lazy val fitPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(2,
        (r: Runnable) => {
          val t = new Thread(r, "graft-ml-fits")
          t.setDaemon(true)
          t
        }))
}
