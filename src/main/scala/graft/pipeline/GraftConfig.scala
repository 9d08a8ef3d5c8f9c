package graft.pipeline

import java.io.{FileInputStream, FileNotFoundException}
import java.util.Properties

/** Config-externalized pipeline parameters — the re-expression of the
  * reference's YAML config + session factory (reference
  * src/utils/config.py:1-13 `load_config`, src/utils/spark_session.py:1-23
  * `get_spark_session`, config/config.yaml) as a typed, validated case
  * class loaded from java.util.Properties.
  *
  * Properties, not YAML: the container has no YAML parser and the config
  * surface is flat key-value anyway — dotted keys (`spark.master`,
  * `paths.input`) carry the same structure with zero dependencies and
  * JVM-native parsing. Every key has a default, so a config file states
  * only its overrides; unknown STAGE names fail fast at load time (a typo
  * must not silently skip a pipeline stage), and numeric keys that fail
  * to parse propagate their NumberFormatException rather than falling
  * back (a mistyped threshold must not silently monitor at the default).
  *
  * The monitoring thresholds mirror the reference's `monitoring:` block
  * (psi_warn/psi_crit/missing_shift_warn/volume_drop_ratio,
  * config.yaml:27-31) and are WIRED — [[Runner]] classifies PSI severity
  * and volume alerts from them, they are not decorative.
  */
final case class GraftConfig(
    appName: String,
    master: String,
    shufflePartitions: Int,
    timezone: String,
    inputDir: String,
    outputDir: String,
    stages: Seq[String],
    splitDate: String,
    psiWarn: Double,
    psiCrit: Double,
    missingShiftWarn: Double,
    volumeDropRatio: Double)

object GraftConfig {

  /** Stage names [[Runner]] knows how to execute. `medallion` writes the
    * bronze→silver→gold tables; `scoring` the feature/score frames;
    * `monitoring` the drift/quality reports (threshold-classified);
    * `mobility` the trajectory marts (OD matrix, stays, flows, entropy,
    * home zones, zone PageRank). */
  val KnownStages: Set[String] = Set("medallion", "scoring", "monitoring", "mobility")

  val Defaults: GraftConfig = GraftConfig(
    appName = "graft",
    master = "local[4]",
    shufflePartitions = 4,
    timezone = "UTC",
    inputDir = "",
    outputDir = "",
    stages = Seq("medallion", "scoring", "monitoring"),
    splitDate = "2024-01-15",
    psiWarn = 0.1,
    psiCrit = 0.2,
    missingShiftWarn = 0.05,
    volumeDropRatio = 0.3)

  /** Load and validate a properties file. Fails fast on: missing file,
    * missing required path keys, unknown stage names, unparseable
    * numerics — every failure names the offending key. */
  def load(path: String): GraftConfig = {
    val f = new java.io.File(path)
    if (!f.exists()) throw new FileNotFoundException(s"config file not found: $path")
    val p = new Properties()
    val in = new FileInputStream(f)
    try p.load(in) finally in.close()
    fromProperties(p)
  }

  def fromProperties(p: Properties): GraftConfig = {
    def str(key: String, dflt: String): String =
      Option(p.getProperty(key)).map(_.trim).filter(_.nonEmpty).getOrElse(dflt)
    def req(key: String): String = {
      val v = str(key, "")
      require(v.nonEmpty, s"required config key missing: $key")
      v
    }
    def num(key: String, dflt: Double): Double = {
      val v = str(key, "")
      if (v.isEmpty) dflt
      else try v.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"config key $key is not a number: '$v'")
      }
    }
    val stages = str("stages", Defaults.stages.mkString(","))
      .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = stages.filterNot(KnownStages)
    require(unknown.isEmpty,
      s"unknown stage(s): ${unknown.mkString(", ")} (known: ${KnownStages.toSeq.sorted.mkString(", ")})")
    require(stages.nonEmpty, "config key 'stages' names no stages")
    GraftConfig(
      appName = str("spark.app_name", Defaults.appName),
      master = str("spark.master", Defaults.master),
      shufflePartitions = num("spark.shuffle_partitions",
        Defaults.shufflePartitions.toDouble).toInt,
      timezone = str("spark.timezone", Defaults.timezone),
      inputDir = req("paths.input"),
      outputDir = req("paths.output"),
      stages = stages,
      splitDate = str("monitoring.split_date", Defaults.splitDate),
      psiWarn = num("monitoring.psi_warn", Defaults.psiWarn),
      psiCrit = num("monitoring.psi_crit", Defaults.psiCrit),
      missingShiftWarn = num("monitoring.missing_shift_warn", Defaults.missingShiftWarn),
      volumeDropRatio = num("monitoring.volume_drop_ratio", Defaults.volumeDropRatio))
  }
}
